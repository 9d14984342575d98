"""GLM-4.5/4.6 MoE text family: role-split dense/MoE scans + noaux_tc
routing + partial rotary."""

import numpy as np

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.utils.loader import load_model_from_weights

IDS = (np.arange(6, dtype=np.int32) * 11 % 150)[None]


def tiny_cfg(**over):
    cfg = {
        "model_type": "glm4_moe",
        "vocab_size": 160,
        "hidden_size": 32,
        "intermediate_size": 64,
        "moe_intermediate_size": 16,
        "num_hidden_layers": 3,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "head_dim": 8,
        "n_routed_experts": 8,
        "n_shared_experts": 1,
        "num_experts_per_tok": 2,
        "first_k_dense_replace": 1,
        "n_group": 2,
        "topk_group": 1,
        "routed_scaling_factor": 1.0,
        "norm_topk_prob": True,
        "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0,
        "partial_rotary_factor": 0.5,
        "use_qk_norm": True,
        "attention_bias": True,
        "max_position_embeddings": 512,
        "tie_word_embeddings": False,
    }
    cfg.update(over)
    return cfg


def hf_weights(cfg, seed=0):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    D = cfg["hidden_size"]
    hd = cfg["head_dim"]
    nh = cfg["num_attention_heads"]
    nkv = cfg["num_key_value_heads"]
    E = cfg["n_routed_experts"]
    I = cfg["intermediate_size"]
    MI = cfg["moe_intermediate_size"]
    V = cfg["vocab_size"]
    w = {"model.embed_tokens.weight": rand(V, D),
         "model.norm.weight": np.ones(D, np.float32),
         "lm_head.weight": rand(V, D)}
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.q_proj.weight"] = rand(nh * hd, D)
        w[p + "self_attn.q_proj.bias"] = rand(nh * hd)
        w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.k_proj.bias"] = rand(nkv * hd)
        w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.v_proj.bias"] = rand(nkv * hd)
        w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
        if cfg["use_qk_norm"]:
            w[p + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
            w[p + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
        if i < cfg["first_k_dense_replace"]:
            w[p + "mlp.gate_proj.weight"] = rand(I, D)
            w[p + "mlp.up_proj.weight"] = rand(I, D)
            w[p + "mlp.down_proj.weight"] = rand(D, I)
        else:
            w[p + "mlp.gate.weight"] = rand(E, D)
            w[p + "mlp.gate.e_score_correction_bias"] = np.zeros(
                E, np.float32)
            for e in range(E):
                q = f"{p}mlp.experts.{e}."
                w[q + "gate_proj.weight"] = rand(MI, D)
                w[q + "up_proj.weight"] = rand(MI, D)
                w[q + "down_proj.weight"] = rand(D, MI)
            w[p + "mlp.shared_experts.gate_proj.weight"] = rand(MI, D)
            w[p + "mlp.shared_experts.up_proj.weight"] = rand(MI, D)
            w[p + "mlp.shared_experts.down_proj.weight"] = rand(D, MI)
    return w


def _logits(model, ids):
    e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
    S = ids.shape[1]
    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S)).copy()
    l, _ = model(model.params, e, None, jnp.asarray(pos))
    return np.asarray(l)


class TestGlm4Moe:
    def test_structure(self):
        cfg = tiny_cfg()
        m = load_model_from_weights(cfg, hf_weights(cfg), jnp.float32)
        lm = m.params["language_model"]["model"]
        assert "dense_layers" in lm and "moe_layers" in lm
        # experts stacked [L, E, I, D]
        gp = lm["moe_layers"]["mlp"]["experts"]["gate_proj"]["weight"]
        assert gp.shape == (2, 8, 16, 32)
        # partial rotary: half the head dim rotates
        assert m.language_model.rope.dim == 4

    def test_generate(self):
        from mlx_vlm_tpu.generate.ar import generate_step

        cfg = tiny_cfg()
        m = load_model_from_weights(cfg, hf_weights(cfg), jnp.float32)
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(IDS))
        toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=4)]
        assert len(toks) == 4

    def test_correction_bias_changes_selection_not_weights(self):
        # noaux_tc: the bias shifts which experts are SELECTED, but mixing
        # weights come from the un-biased scores (reference language.py:93)
        cfg = tiny_cfg()
        w = hf_weights(cfg)
        base = _logits(load_model_from_weights(cfg, dict(w), jnp.float32),
                       IDS)
        w2 = dict(w)
        for i in range(1, 3):
            b = np.zeros(8, np.float32)
            b[:4] = 100.0  # force selection into the first group
            w2[f"model.layers.{i}.mlp.gate.e_score_correction_bias"] = b
        biased = _logits(load_model_from_weights(cfg, w2, jnp.float32), IDS)
        assert not np.allclose(base, biased)

    def test_shared_experts_contribute(self):
        cfg = tiny_cfg()
        w = hf_weights(cfg)
        base = _logits(load_model_from_weights(cfg, dict(w), jnp.float32),
                       IDS)
        w2 = dict(w)
        for i in range(1, 3):
            p = f"model.layers.{i}.mlp.shared_experts."
            for nm in ("gate_proj", "up_proj", "down_proj"):
                w2[p + nm + ".weight"] = np.zeros_like(w2[p + nm + ".weight"])
        no_shared = _logits(load_model_from_weights(cfg, w2, jnp.float32),
                            IDS)
        assert not np.allclose(base, no_shared)

    def test_solar_open_remap(self):
        from mlx_vlm_tpu.utils.loader import MODEL_REMAPPING

        assert MODEL_REMAPPING.get("solar_open") == "glm4_moe"
