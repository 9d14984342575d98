"""Laguna family: per-layer head counts, softplus attention gating,
swa rope/sinks, sigmoid router with softcap + correction bias."""

import numpy as np

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights

IDS = (np.arange(7, dtype=np.int32) * 3 % 80)[None]


def _cfg():
    return {"model_type": "laguna", "vocab_size": 90, "hidden_size": 32,
            "intermediate_size": 48, "num_hidden_layers": 3,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "head_dim": 8, "max_position_embeddings": 256,
            "rms_norm_eps": 1e-6, "gating": "per-head",
            "sliding_window": 4,
            "layer_types": ["sliding_attention", "full_attention",
                            "sliding_attention"],
            "num_attention_heads_per_layer": [4, 2, 4],
            "swa_rope_parameters": {"rope_theta": 10000.0,
                                    "partial_rotary_factor": 0.5},
            "swa_attention_sink_enabled": True,
            "num_experts": 4, "num_experts_per_tok": 2,
            "moe_intermediate_size": 16,
            "shared_expert_intermediate_size": 24,
            "decoder_sparse_step": 1, "mlp_only_layers": [0],
            "moe_router_logit_softcapping": 10.0}


def _weights(cfg, seed=0):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    D, V = cfg["hidden_size"], cfg["vocab_size"]
    w = {"model.embed_tokens.weight": rand(V, D),
         "model.norm.weight": np.ones(D, np.float32),
         "lm_head.weight": rand(V, D)}
    for i in range(cfg["num_hidden_layers"]):
        nh = cfg["num_attention_heads_per_layer"][i]
        hd, nkv = cfg["head_dim"], cfg["num_key_value_heads"]
        p = f"model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.q_proj.weight"] = rand(nh * hd, D)
        w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
        w[p + "self_attn.g_proj.weight"] = rand(nh, D)
        w[p + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
        w[p + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
        if cfg["layer_types"][i] == "sliding_attention":
            w[p + "self_attn.sink"] = np.zeros(nh, np.float32)
        if i == 0:
            w[p + "mlp.gate_proj.weight"] = rand(48, D)
            w[p + "mlp.up_proj.weight"] = rand(48, D)
            w[p + "mlp.down_proj.weight"] = rand(D, 48)
        else:
            w[p + "mlp.gate.proj.weight"] = rand(4, D)
            w[p + "mlp.gate.e_score_correction_bias"] = rand(4)
            for e in range(4):
                # fused gate_up checkpoint layout
                w[p + f"mlp.experts.{e}.gate_up_proj.weight"] = rand(32, D)
                w[p + f"mlp.experts.{e}.down_proj.weight"] = rand(D, 16)
            w[p + "mlp.shared_expert.gate_proj.weight"] = rand(24, D)
            w[p + "mlp.shared_expert.up_proj.weight"] = rand(24, D)
            w[p + "mlp.shared_expert.down_proj.weight"] = rand(D, 24)
    return w


def test_generate_and_chunk_parity():
    cfg = _cfg()
    m = load_model_from_weights(cfg, _weights(cfg), jnp.float32)
    e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(IDS))
    toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=3)]
    assert len(toks) == 3

    lm = m.language_model
    S = IDS.shape[1]
    pos = np.arange(S, dtype=np.int32)[None]
    c = lm.init_cache(1, S, jnp.float32)
    whole, _ = m(m.params, e, c, jnp.asarray(pos))
    c = lm.init_cache(1, S, jnp.float32)
    _, c = m(m.params, e[:, :4], c, jnp.asarray(pos[:, :4]))
    part, _ = m(m.params, e[:, 4:], c, jnp.asarray(pos[:, 4:]))
    np.testing.assert_allclose(np.asarray(part[:, -1]),
                               np.asarray(whole[:, -1]), atol=3e-5)
