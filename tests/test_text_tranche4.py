"""Text-family tranche 4: glm, deepseek (v1), ministral3, gpt_bigcode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights

IDS = (np.arange(6, dtype=np.int32) * 7 % 120)[None]


def _rng_rand(rng):
    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)
    return rand


def _gen(model, n=3):
    e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(IDS))
    return [int(t[0]) for t, _ in generate_step(e, model, max_tokens=n)]


def _llama_like_weights(cfg, rand, gate_up_fused=False):
    D = cfg["hidden_size"]
    hd = cfg.get("head_dim") or D // cfg["num_attention_heads"]
    nh, nkv = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    I, V = cfg["intermediate_size"], cfg["vocab_size"]
    w = {"model.embed_tokens.weight": rand(V, D),
         "model.norm.weight": np.ones(D, np.float32)}
    if not cfg.get("tie_word_embeddings", False):
        w["lm_head.weight"] = rand(V, D)
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.q_proj.weight"] = rand(nh * hd, D)
        w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
        if cfg.get("attention_bias"):
            w[p + "self_attn.q_proj.bias"] = rand(nh * hd)
            w[p + "self_attn.k_proj.bias"] = rand(nkv * hd)
            w[p + "self_attn.v_proj.bias"] = rand(nkv * hd)
        if gate_up_fused:
            w[p + "mlp.gate_up_proj.weight"] = rand(2 * I, D)
        else:
            w[p + "mlp.gate_proj.weight"] = rand(I, D)
            w[p + "mlp.up_proj.weight"] = rand(I, D)
        w[p + "mlp.down_proj.weight"] = rand(D, I)
    return w


class TestGLM:
    def _cfg(self, **over):
        cfg = {"model_type": "glm", "vocab_size": 150, "hidden_size": 32,
               "intermediate_size": 64, "num_hidden_layers": 2,
               "num_attention_heads": 4, "num_key_value_heads": 2,
               "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
               "tie_word_embeddings": False}
        cfg.update(over)
        return cfg

    def test_generate(self):
        cfg = self._cfg()
        rand = _rng_rand(np.random.default_rng(0))
        m = load_model_from_weights(
            cfg, _llama_like_weights(cfg, rand, gate_up_fused=True),
            jnp.float32)
        assert len(_gen(m)) == 3

    def test_traditional_rope_differs_from_neox(self):
        """glm rotates interleaved pairs — outputs must differ from the
        half-split convention on the same weights."""
        cfg = self._cfg()
        rand = _rng_rand(np.random.default_rng(1))
        w = _llama_like_weights(cfg, rand, gate_up_fused=True)
        m = load_model_from_weights(dict(cfg), dict(w), jnp.float32)
        from mlx_vlm_tpu.core.rope import apply_rope

        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(IDS))
        pos = np.broadcast_to(np.arange(6, dtype=np.int32), (1, 6)).copy()
        ref, _ = m(m.params, e, None, jnp.asarray(pos))
        # monkeypatch to neox rope: logits must change
        import mlx_vlm_tpu.models.glm.glm as glm_mod

        orig = glm_mod.apply_rope_traditional
        glm_mod.apply_rope_traditional = apply_rope
        try:
            m2 = load_model_from_weights(dict(cfg), dict(w), jnp.float32)
            alt, _ = m2(m2.params, e, None, jnp.asarray(pos))
        finally:
            glm_mod.apply_rope_traditional = orig
        assert np.abs(np.asarray(ref) - np.asarray(alt)).max() > 1e-5


class TestDeepseekV1:
    def _cfg(self, moe=True, **over):
        cfg = {"model_type": "deepseek", "vocab_size": 150,
               "hidden_size": 32, "intermediate_size": 64,
               "moe_intermediate_size": 16, "num_hidden_layers": 3,
               "num_attention_heads": 4, "num_key_value_heads": 4,
               "rms_norm_eps": 1e-6, "rope_theta": 10000.0,
               "max_position_embeddings": 512}
        if moe:
            cfg.update(n_routed_experts=4, num_experts_per_tok=2,
                       n_shared_experts=1, first_k_dense_replace=1,
                       moe_layer_freq=1)
        cfg.update(over)
        return cfg

    def _weights(self, cfg, seed=0):
        rand = _rng_rand(np.random.default_rng(seed))
        D, V = cfg["hidden_size"], cfg["vocab_size"]
        I, MI = cfg["intermediate_size"], cfg["moe_intermediate_size"]
        nh = cfg["num_attention_heads"]
        hd = D // nh
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.norm.weight": np.ones(D, np.float32),
             "lm_head.weight": rand(V, D)}
        E = cfg.get("n_routed_experts")
        ns = cfg.get("n_shared_experts")
        for i in range(cfg["num_hidden_layers"]):
            p = f"model.layers.{i}."
            w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
            w[p + "post_attention_layernorm.weight"] = np.ones(
                D, np.float32)
            for kk, n in (("q", nh * hd), ("k", nh * hd), ("v", nh * hd)):
                w[p + f"self_attn.{kk}_proj.weight"] = rand(n, D)
            w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
            is_moe = (E is not None and i >= cfg["first_k_dense_replace"]
                      and i % cfg["moe_layer_freq"] == 0)
            if is_moe:
                w[p + "mlp.gate.weight"] = rand(E, D)
                for e in range(E):
                    q = f"{p}mlp.experts.{e}."
                    w[q + "gate_proj.weight"] = rand(MI, D)
                    w[q + "up_proj.weight"] = rand(MI, D)
                    w[q + "down_proj.weight"] = rand(D, MI)
                if ns:
                    si = MI * ns
                    w[p + "mlp.shared_experts.gate_proj.weight"] = rand(
                        si, D)
                    w[p + "mlp.shared_experts.up_proj.weight"] = rand(si, D)
                    w[p + "mlp.shared_experts.down_proj.weight"] = rand(
                        D, si)
            else:
                w[p + "mlp.gate_proj.weight"] = rand(I, D)
                w[p + "mlp.up_proj.weight"] = rand(I, D)
                w[p + "mlp.down_proj.weight"] = rand(D, I)
        return w

    def test_moe_generate(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        # first layer dense, rest MoE
        layers = m.params["language_model"]["model"]["layers"]
        assert "experts" not in layers["0"]["mlp"]
        assert "experts" in layers["1"]["mlp"]
        # experts stacked [E, MI, D]
        gp = layers["1"]["mlp"]["experts"]["gate_proj"]["weight"]
        assert gp.shape[0] == 4
        assert len(_gen(m)) == 3

    def test_dense_generate(self):
        cfg = self._cfg(moe=False)
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        assert len(_gen(m)) == 3


class TestMinistral3:
    def _cfg(self, **over):
        cfg = {"model_type": "ministral3", "vocab_size": 150,
               "hidden_size": 32, "intermediate_size": 64,
               "num_hidden_layers": 4, "num_attention_heads": 4,
               "num_key_value_heads": 2, "rms_norm_eps": 1e-5,
               "sliding_window": 4,
               "layer_types": ["sliding_attention", "sliding_attention",
                               "sliding_attention", "full_attention"],
               "rope_parameters": {
                   "rope_theta": 100000.0,
                   "llama_4_scaling_beta": 0.1,
                   "original_max_position_embeddings": 4,
               },
               "tie_word_embeddings": False}
        cfg.update(over)
        return cfg

    def test_generate_and_attn_scale(self):
        cfg = self._cfg()
        rand = _rng_rand(np.random.default_rng(3))
        w = _llama_like_weights(cfg, rand)
        m = load_model_from_weights(dict(cfg), dict(w), jnp.float32)
        assert len(_gen(m, 4)) == 4
        # beta=0 changes logits (position >= orig_max engages the scale)
        cfg0 = self._cfg()
        cfg0["rope_parameters"] = dict(cfg0["rope_parameters"],
                                       llama_4_scaling_beta=0.0)
        m0 = load_model_from_weights(dict(cfg0), dict(w), jnp.float32)
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(IDS))
        pos = np.broadcast_to(np.arange(6, dtype=np.int32), (1, 6)).copy()
        a, _ = m(m.params, e, None, jnp.asarray(pos))
        b, _ = m0(m0.params, e, None, jnp.asarray(pos))
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6

    def test_sliding_mask_limits_context(self):
        """With all-sliding layers and window 2, a token 3+ steps back
        cannot influence the logits."""
        cfg = self._cfg(
            layer_types=["sliding_attention"] * 4, sliding_window=2)
        cfg["rope_parameters"] = {"rope_theta": 100000.0}
        rand = _rng_rand(np.random.default_rng(4))
        w = _llama_like_weights(cfg, rand)
        m = load_model_from_weights(cfg, w, jnp.float32)
        ids1 = np.asarray([[5, 9, 22, 31, 40, 17]], np.int32)
        ids2 = ids1.copy()
        ids2[0, 0] = 77  # outside every layer's window for the last token
        pos = np.broadcast_to(np.arange(6, dtype=np.int32), (1, 6)).copy()

        def last_logits(ids):
            e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
            l, _ = m(m.params, e, None, jnp.asarray(pos))
            return np.asarray(l)[0, -1]

        np.testing.assert_allclose(last_logits(ids1), last_logits(ids2),
                                   atol=1e-5)


class TestGPTBigCode:
    def _cfg(self, **over):
        cfg = {"model_type": "gpt_bigcode", "n_embd": 32, "n_layer": 2,
               "n_head": 4, "n_inner": 64, "n_positions": 64,
               "layer_norm_epsilon": 1e-5, "vocab_size": 150,
               "multi_query": True, "tie_word_embeddings": True}
        cfg.update(over)
        return cfg

    def _weights(self, cfg, seed=5):
        rand = _rng_rand(np.random.default_rng(seed))
        D, V = cfg["n_embd"], cfg["vocab_size"]
        hd = D // cfg["n_head"]
        kvd = hd  # MQA: one kv head
        I = cfg["n_inner"]
        w = {"transformer.wte.weight": rand(V, D),
             "transformer.wpe.weight": rand(cfg["n_positions"], D),
             "transformer.ln_f.weight": np.ones(D, np.float32),
             "transformer.ln_f.bias": np.zeros(D, np.float32)}
        for i in range(cfg["n_layer"]):
            p = f"transformer.h.{i}."
            for ln in ("ln_1", "ln_2"):
                w[p + ln + ".weight"] = np.ones(D, np.float32)
                w[p + ln + ".bias"] = np.zeros(D, np.float32)
            w[p + "attn.c_attn.weight"] = rand(D + 2 * kvd, D)
            w[p + "attn.c_attn.bias"] = rand(D + 2 * kvd)
            w[p + "attn.c_proj.weight"] = rand(D, D)
            w[p + "attn.c_proj.bias"] = rand(D)
            w[p + "mlp.c_fc.weight"] = rand(I, D)
            w[p + "mlp.c_fc.bias"] = rand(I)
            w[p + "mlp.c_proj.weight"] = rand(D, I)
            w[p + "mlp.c_proj.bias"] = rand(D)
        return w

    def test_generate_mqa(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        assert m.language_model.n_kv_heads == 1
        assert len(_gen(m)) == 3

    def test_learned_positions_used(self):
        cfg = self._cfg()
        w = self._weights(cfg)
        m = load_model_from_weights(dict(cfg), dict(w), jnp.float32)
        # zero wpe -> different logits
        w2 = dict(w)
        w2["transformer.wpe.weight"] = np.zeros_like(
            w["transformer.wpe.weight"])
        m2 = load_model_from_weights(dict(cfg), w2, jnp.float32)
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(IDS))
        pos = np.broadcast_to(np.arange(6, dtype=np.int32), (1, 6)).copy()
        a, _ = m(m.params, e, None, jnp.asarray(pos))
        b, _ = m2(m2.params, e, None, jnp.asarray(pos))
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6
