"""step3p7: perception-encoder ViT (2-D rope) + Step MoE text decoder."""

import numpy as np

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights

W, VL, D, P = 16, 2, 32, 14


def _cfg():
    return {"model_type": "step3p7", "image_token_id": 90,
            "understand_projector_stride": 2,
            "text_config": {"model_type": "step3p5", "hidden_size": D,
                            "intermediate_size": 48,
                            "num_attention_heads": 4,
                            "num_attention_groups": 2,
                            "num_hidden_layers": 3, "vocab_size": 96,
                            "rms_norm_eps": 1e-5,
                            "moe_intermediate_size": 16,
                            "moe_num_experts": 4, "moe_top_k": 2,
                            "rope_theta": [1e4, 1e6, 1e4],
                            "share_expert_dim": 24, "head_dim": 8,
                            "layer_types": ["sliding_attention",
                                            "full_attention",
                                            "sliding_attention"],
                            "sliding_window": 4,
                            "use_head_wise_attn_gate": True,
                            "attention_other_setting": {
                                "num_attention_heads": 2,
                                "num_attention_groups": 1},
                            "swiglu_limits": [None, 7.0, None],
                            "swiglu_limits_shared": [5.0, 5.0, 5.0],
                            "moe_layers_enum": [1, 2]},
            "vision_config": {"model_type": "perception_encoder",
                              "width": W, "layers": VL, "heads": 2,
                              "image_size": 728, "patch_size": P,
                              "mlp_ratio": 2.0, "use_ln_pre": True,
                              "use_rope2d": True, "ls_init_value": 0.1}}


def _weights(cfg, seed=0):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    tc = cfg["text_config"]
    w = {"model.embed_tokens.weight": rand(96, D),
         "model.norm.weight": np.ones(D, np.float32),
         "lm_head.weight": rand(96, D)}
    for i in range(3):
        p = f"model.layers.{i}."
        sliding = tc["layer_types"][i] == "sliding_attention"
        nh = 2 if sliding else 4
        nkv = 1 if sliding else 2
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.q_proj.weight"] = rand(nh * 8, D)
        w[p + "self_attn.k_proj.weight"] = rand(nkv * 8, D)
        w[p + "self_attn.v_proj.weight"] = rand(nkv * 8, D)
        w[p + "self_attn.o_proj.weight"] = rand(D, nh * 8)
        w[p + "self_attn.q_norm.weight"] = np.ones(8, np.float32)
        w[p + "self_attn.k_norm.weight"] = np.ones(8, np.float32)
        w[p + "self_attn.g_proj.weight"] = rand(nh, D)
        if i in (1, 2):
            # stacked checkpoint layout (reference .moe.* names)
            w[p + "moe.gate.weight"] = rand(4, D)
            w[p + "moe.router_bias"] = rand(4)
            w[p + "moe.gate_proj.weight"] = rand(4, 16, D)
            w[p + "moe.up_proj.weight"] = rand(4, 16, D)
            w[p + "moe.down_proj.weight"] = rand(4, D, 16)
            w[p + "share_expert.gate_proj.weight"] = rand(24, D)
            w[p + "share_expert.up_proj.weight"] = rand(24, D)
            w[p + "share_expert.down_proj.weight"] = rand(D, 24)
        else:
            w[p + "mlp.gate_proj.weight"] = rand(48, D)
            w[p + "mlp.up_proj.weight"] = rand(48, D)
            w[p + "mlp.down_proj.weight"] = rand(D, 48)
    vm = "vision_model."
    w[vm + "conv1.weight"] = rand(W, 3, P, P)  # OIHW
    grid = 728 // P
    w[vm + "positional_embedding"] = rand(grid * grid, W)
    w[vm + "ln_pre.weight"] = np.ones(W, np.float32)
    w[vm + "ln_pre.bias"] = np.zeros(W, np.float32)
    for i in range(VL):
        p = vm + f"transformer.resblocks.{i}."
        for n in ("ln_1", "ln_2"):
            w[p + n + ".weight"] = np.ones(W, np.float32)
            w[p + n + ".bias"] = np.zeros(W, np.float32)
        w[p + "attn.in_proj_weight"] = rand(3 * W, W)
        w[p + "attn.in_proj_bias"] = rand(3 * W)
        w[p + "attn.out_proj.weight"] = rand(W, W)
        w[p + "attn.out_proj.bias"] = rand(W)
        w[p + "mlp.c_fc.weight"] = rand(32, W)
        w[p + "mlp.c_fc.bias"] = rand(32)
        w[p + "mlp.c_proj.weight"] = rand(W, 32)
        w[p + "mlp.c_proj.bias"] = rand(W)
        w[p + "ls_1.gamma"] = np.full(W, 0.1, np.float32)
        w[p + "ls_2.gamma"] = np.full(W, 0.1, np.float32)
    w[vm + "vit_downsampler1.weight"] = rand(2 * W, W, 3, 3)
    w[vm + "vit_downsampler2.weight"] = rand(4 * W, 2 * W, 3, 3)
    w[vm + "vit_downsampler1.bias"] = rand(2 * W)
    w[vm + "vit_downsampler2.bias"] = rand(4 * W)
    w["vit_large_projector.weight"] = rand(D, 4 * W)
    return w


def test_text_generate():
    cfg = _cfg()
    m = load_model_from_weights(cfg, _weights(cfg), jnp.float32)
    ids = np.array([[5, 6, 7, 8, 9]], np.int32)
    e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
    toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=3)]
    assert len(toks) == 3


def test_image_generate():
    cfg = _cfg()
    m = load_model_from_weights(cfg, _weights(cfg, seed=1), jnp.float32)
    rng = np.random.default_rng(2)
    # tiny image: 4x4 patch grid -> downsampled to 1x1 -> 1 token
    px = jnp.asarray((rng.standard_normal((1, 4 * P, 4 * P, 3)) * 0.1
                      ).astype(np.float32))
    ids = np.array([[5, 90, 7]], np.int32)
    e = m.get_input_embeddings(m.params, jnp.asarray(ids), px)
    assert e.shape == (1, 3, D)
    pos, _ = m.prepare_position_ids(ids)
    toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=2,
                                                position_ids=pos)]
    assert len(toks) == 2
