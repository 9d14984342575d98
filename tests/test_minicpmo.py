"""minicpmo: SigLIP + 2D-sincos resampler + whisper audio + qwen2 LM."""

import numpy as np

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def test_omni_image_audio_generate():

    rng = np.random.default_rng(0)
    rand = lambda *sh: (rng.standard_normal(sh) * 0.08).astype(np.float32)
    E, D, P = 16, 32, 14
    cfg = {"model_type": "minicpmo", "image_token_id": 3, "audio_token_id": 4,
           "query_num": 4, "audio_pool_step": 2,
           "text_config": {"model_type": "qwen2", "hidden_size": D,
                           "num_hidden_layers": 2, "intermediate_size": 48,
                           "num_attention_heads": 4, "num_key_value_heads": 2,
                           "rms_norm_eps": 1e-6, "vocab_size": 96,
                           "rope_theta": 1e6, "tie_word_embeddings": True},
           "vision_config": {"model_type": "siglip_vision_model",
                             "hidden_size": E, "intermediate_size": 32,
                             "num_hidden_layers": 2, "num_attention_heads": 2,
                             "image_size": 448, "patch_size": P},
           "audio_config": {"model_type": "whisper", "num_mel_bins": 8,
                            "d_model": 16, "encoder_layers": 1,
                            "encoder_attention_heads": 2,
                            "encoder_ffn_dim": 32,
                            "max_source_positions": 64}}
    w = {"llm.model.embed_tokens.weight": rand(96, D),
         "llm.model.norm.weight": np.ones(D, np.float32)}
    for i in range(2):
        p = f"llm.model.layers.{i}."
        w[p+"input_layernorm.weight"] = np.ones(D, np.float32)
        w[p+"post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p+"self_attn.q_proj.weight"] = rand(D, D)
        w[p+"self_attn.k_proj.weight"] = rand(16, D)
        w[p+"self_attn.v_proj.weight"] = rand(16, D)
        w[p+"self_attn.o_proj.weight"] = rand(D, D)
        w[p+"mlp.gate_proj.weight"] = rand(48, D)
        w[p+"mlp.up_proj.weight"] = rand(48, D)
        w[p+"mlp.down_proj.weight"] = rand(D, 48)
    side = 448 // P
    vt = "vpm."
    w[vt+"embeddings.patch_embedding.weight"] = rand(E, 3, P, P)
    w[vt+"embeddings.patch_embedding.bias"] = rand(E)
    w[vt+"embeddings.position_embedding.weight"] = rand(side*side, E)
    for i in range(2):
        pp = vt+f"encoder.layers.{i}."
        for n in ("layer_norm1", "layer_norm2"):
            w[pp+n+".weight"] = np.ones(E, np.float32)
            w[pp+n+".bias"] = np.zeros(E, np.float32)
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            w[pp+f"self_attn.{n}.weight"] = rand(E, E)
            w[pp+f"self_attn.{n}.bias"] = rand(E)
        w[pp+"mlp.fc1.weight"] = rand(32, E)
        w[pp+"mlp.fc1.bias"] = rand(32)
        w[pp+"mlp.fc2.weight"] = rand(E, 32)
        w[pp+"mlp.fc2.bias"] = rand(E)
    w[vt+"post_layernorm.weight"] = np.ones(E, np.float32)
    w[vt+"post_layernorm.bias"] = np.zeros(E, np.float32)
    rp = "resampler."
    w[rp+"query"] = rand(4, D)
    w[rp+"kv_proj.weight"] = rand(D, E)
    w[rp+"attn.in_proj_weight"] = rand(3*D, D)
    w[rp+"attn.in_proj_bias"] = rand(3*D)
    w[rp+"attn.out_proj.weight"] = rand(D, D)
    w[rp+"attn.out_proj.bias"] = rand(D)
    for n in ("ln_q", "ln_kv", "ln_post"):
        w[rp+n+".weight"] = np.ones(D, np.float32)
        w[rp+n+".bias"] = np.zeros(D, np.float32)
    w[rp+"proj"] = rand(D, D)
    ap = "apm."
    w[ap+"conv1.weight"] = rand(16, 8, 3)
    w[ap+"conv1.bias"] = rand(16)
    w[ap+"conv2.weight"] = rand(16, 16, 3)
    w[ap+"conv2.bias"] = rand(16)
    w[ap+"embed_positions.weight"] = rand(64, 16)
    lp = ap+"layers.0."
    for n in ("self_attn_layer_norm", "final_layer_norm"):
        w[lp+n+".weight"] = np.ones(16, np.float32)
        w[lp+n+".bias"] = np.zeros(16, np.float32)
    w[lp+"self_attn.q_proj.weight"] = rand(16, 16)
    w[lp+"self_attn.q_proj.bias"] = rand(16)
    w[lp+"self_attn.k_proj.weight"] = rand(16, 16)
    w[lp+"self_attn.v_proj.weight"] = rand(16, 16)
    w[lp+"self_attn.v_proj.bias"] = rand(16)
    w[lp+"self_attn.out_proj.weight"] = rand(16, 16)
    w[lp+"self_attn.out_proj.bias"] = rand(16)
    w[lp+"fc1.weight"] = rand(32, 16)
    w[lp+"fc1.bias"] = rand(32)
    w[lp+"fc2.weight"] = rand(16, 32)
    w[lp+"fc2.bias"] = rand(16)
    w[ap+"layer_norm.weight"] = np.ones(16, np.float32)
    w[ap+"layer_norm.bias"] = np.zeros(16, np.float32)
    w["audio_projection_layer.linear1.weight"] = rand(D, 16)
    w["audio_projection_layer.linear1.bias"] = rand(D)
    w["audio_projection_layer.linear2.weight"] = rand(D, D)
    w["audio_projection_layer.linear2.bias"] = rand(D)

    m = load_model_from_weights(cfg, w, jnp.float32)
    # image: 2x3 grid of patches (image_token fills 4 query slots)
    grid = np.asarray([[1, 2, 3]])
    aux = {k: jnp.asarray(v) for k, v in m.vision_aux_inputs(grid).items()}
    px = jnp.asarray(rand(1, 2*P, 3*P, 3))
    # audio: 8 mel x 12 frames -> conv s2 -> 6 -> pool2 -> 3 audio tokens
    af = jnp.asarray(rand(1, 8, 12))
    ids = np.array([[7, 3, 3, 3, 3, 9, 4, 4, 4, 8]], np.int32)
    e = m.get_input_embeddings(m.params, jnp.asarray(ids), px,
                               audio_features=af, **aux)
    assert e.shape == (1, 10, 32)
    pos, _ = m.prepare_position_ids(ids, image_grid_thw=grid)
    toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=3,
                                                position_ids=pos)]
    assert len(toks) == 3

