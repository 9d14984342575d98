"""inkling: banded-relative-bias attention with short convolutions,
logsigmoid-softmax MoE, HMLP vision patchifier, dMel audio front end."""

import numpy as np

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def test_omni_generate_and_conv_state_parity():

    rng = np.random.default_rng(0)
    rand = lambda *sh: (rng.standard_normal(sh) * 0.06).astype(np.float32)
    D = 32
    cfg = {"model_type": "inkling", "image_token_id": 94, "audio_token_id": 93,
           "vocab_size": 96,
           "text_config": {"hidden_size": D, "num_hidden_layers": 3,
                           "vocab_size": 96, "unpadded_vocab_size": 90,
                           "num_attention_heads": 4, "num_key_value_heads": 2,
                           "head_dim": 8, "swa_num_attention_heads": 2,
                           "swa_num_key_value_heads": 1, "swa_head_dim": 8,
                           "sliding_window_size": 4,
                           "layer_types": ["hybrid_sliding", "full",
                                           "hybrid_sliding"],
                           "d_rel": 4, "rel_extent": 8,
                           "log_scaling_n_floor": 4, "log_scaling_alpha": 0.1,
                           "sconv_kernel_size": 4, "dense_mlp_idx": 1,
                           "intermediate_size": 48,
                           "moe_intermediate_size": 16,
                           "n_routed_experts": 4, "num_experts_per_tok": 2,
                           "n_shared_experts": 2, "route_scale": 8.0,
                           "use_embed_norm": True},
           "vision_config": {"patch_size": 4, "temporal_patch_size": 2,
                             "n_layers": 2},
           "audio_config": {"n_mel_bins": 6, "mel_vocab_size": 4}}
    w = {"model.embed_tokens.weight": rand(96, D),
         "model.embed_norm.weight": np.ones(D, np.float32),
         "model.norm.weight": np.ones(D, np.float32),
         "lm_head.weight": rand(96, D)}
    tc = cfg["text_config"]
    for i in range(3):
        p = f"model.layers.{i}."
        sliding = tc["layer_types"][i] == "hybrid_sliding"
        nh = 2 if sliding else 4
        nkv = 1 if sliding else 2
        hd = 8
        w[p+"input_layernorm.weight"] = np.ones(D, np.float32)
        w[p+"post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p+"self_attn.q_proj.weight"] = rand(nh*hd, D)
        w[p+"self_attn.k_proj.weight"] = rand(nkv*hd, D)
        w[p+"self_attn.v_proj.weight"] = rand(nkv*hd, D)
        w[p+"self_attn.r_proj.weight"] = rand(nh*4, D)
        w[p+"self_attn.o_proj.weight"] = rand(D, nh*hd)
        w[p+"self_attn.q_norm.weight"] = np.ones(hd, np.float32)
        w[p+"self_attn.k_norm.weight"] = np.ones(hd, np.float32)
        rel_extent = 4 if sliding else 8
        w[p+"self_attn.rel_proj"] = rand(4, rel_extent)
        w[p+"self_attn.k_sconv.conv.weight"] = rand(nkv*hd, 1, 4)
        w[p+"self_attn.v_sconv.conv.weight"] = rand(nkv*hd, 1, 4)
        w[p+"attn_sconv.conv.weight"] = rand(D, 1, 4)
        w[p+"mlp_sconv.conv.weight"] = rand(D, 1, 4)
        if i < 1:
            w[p+"mlp.gate_proj.weight"] = rand(48, D)
            w[p+"mlp.up_proj.weight"] = rand(48, D)
            w[p+"mlp.down_proj.weight"] = rand(D, 48)
            w[p+"mlp.global_scale"] = np.ones(1, np.float32)
        else:
            w[p+"mlp.gate_weight"] = rand(6, D)
            w[p+"mlp.e_score_correction_bias"] = rand(4)
            w[p+"mlp.global_scale"] = np.ones(1, np.float32)
            w[p+"mlp.switch_mlp.gate_proj.weight"] = rand(4, 16, D)
            w[p+"mlp.switch_mlp.up_proj.weight"] = rand(4, 16, D)
            w[p+"mlp.switch_mlp.down_proj.weight"] = rand(D, 16)[None].repeat(4, 0) * 1.0
            w[p+"mlp.shared_experts.gate_proj.weight"] = rand(2, 16, D)
            w[p+"mlp.shared_experts.up_proj.weight"] = rand(2, 16, D)
            w[p+"mlp.shared_experts.down_proj.weight"] = rand(2, D, 16)
    # vision HMLP
    from mlx_vlm_tpu.models.inkling import plan_out_scales
    scales = plan_out_scales(2, 4, 2, 3)
    n = len(scales) - 1
    for i in range(n):
        s, e = scales[i], scales[i+1]
        mult = int((e[0]//s[0]) * (e[1]//s[1]) * (e[2]//s[2]))
        out_dim = D if i == 2 - 1 else int(e[3])
        w[f"vision_model.encoder_layers.{i}.projection.weight"] = rand(out_dim, int(s[3])*mult)
        if i != 2 - 1:
            w[f"vision_model.encoder_layers.{i}.layer_norm.weight"] = np.ones(out_dim, np.float32)
    w["vision_model.final_norm.weight"] = np.ones(D, np.float32)
    w["audio_model.embed_audio_tokens.weight"] = rand(6*4, D)
    w["audio_model.norm.weight"] = np.ones(D, np.float32)

    m = load_model_from_weights(cfg, w, jnp.float32)
    # text generate
    ids = np.array([[5, 6, 7, 94, 93, 8]], np.int32)
    # one image patch: [1, T=2, 4, 4, 3]
    pv = jnp.asarray(rand(1, 2, 4, 4, 3))
    aud = jnp.asarray(np.array([[[0,1,2,3,0,1]]], np.int32))  # [1 frame, 6 mels]
    e = m.get_input_embeddings(m.params, jnp.asarray(ids), pv,
                               audio_input_ids=aud)
    assert e.shape == (1, 6, 32)
    pos, _ = m.prepare_position_ids(ids)
    toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=3,
                                                position_ids=pos)]
    assert len(toks) == 3

    # chunked parity (conv + banded mask state)
    lm = m.language_model
    S = ids.shape[1]
    pos = np.arange(S, dtype=np.int32)[None]
    c = lm.init_cache(1, S+4, jnp.float32)
    whole, _ = m(m.params, e, c, jnp.asarray(pos))
    c = lm.init_cache(1, S+4, jnp.float32)
    _, c = m(m.params, e[:, :3], c, jnp.asarray(pos[:, :3]))
    part, _ = m(m.params, e[:, 3:], c, jnp.asarray(pos[:, 3:]))
    np.testing.assert_allclose(np.asarray(part[:, -1]), np.asarray(whole[:, -1]),
                               atol=5e-5)

    assert np.asarray(whole).shape[-1] == 90  # unpadded_vocab trim

