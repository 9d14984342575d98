"""Sliding-pattern text families: olmo3 and exaone4."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights

IDS = (np.arange(6, dtype=np.int32) * 7 % 120)[None]


def _gen(model, n=3):
    e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(IDS))
    return [int(t[0]) for t, _ in generate_step(e, model, max_tokens=n)]


def rand_fn(seed):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    return rand


class TestOlmo3:
    def _cfg(self):
        return {"model_type": "olmo3", "hidden_size": 32,
                "num_hidden_layers": 4, "num_attention_heads": 4,
                "num_key_value_heads": 2, "intermediate_size": 64,
                "vocab_size": 128, "rms_norm_eps": 1e-6,
                "sliding_window": 3,
                "rope_scaling": {"rope_type": "yarn", "factor": 2.0,
                                 "original_max_position_embeddings": 64}}

    def _weights(self, seed=0):
        rand = rand_fn(seed)
        D, V = 32, 128
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.norm.weight": np.ones(D, np.float32),
             "lm_head.weight": rand(V, D)}
        for i in range(4):
            p = f"model.layers.{i}."
            w[p + "post_attention_layernorm.weight"] = np.ones(
                D, np.float32)
            w[p + "post_feedforward_layernorm.weight"] = np.ones(
                D, np.float32)
            w[p + "self_attn.q_proj.weight"] = rand(D, D)
            w[p + "self_attn.k_proj.weight"] = rand(16, D)
            w[p + "self_attn.v_proj.weight"] = rand(16, D)
            w[p + "self_attn.o_proj.weight"] = rand(D, D)
            w[p + "self_attn.q_norm.weight"] = np.ones(D, np.float32)
            w[p + "self_attn.k_norm.weight"] = np.ones(16, np.float32)
            w[p + "mlp.gate_proj.weight"] = rand(64, D)
            w[p + "mlp.up_proj.weight"] = rand(64, D)
            w[p + "mlp.down_proj.weight"] = rand(D, 64)
        return w

    def test_layer_pattern(self):
        m = load_model_from_weights(self._cfg(), self._weights(),
                                    jnp.float32)
        assert m.language_model.is_full.tolist() == [False, False, False,
                                                     True]
        assert len(_gen(m)) == 3

    def test_sliding_restricts_context(self):
        """Shrinking the window must change outputs on a long prompt."""
        cfg = self._cfg()
        w = self._weights()
        base = load_model_from_weights(cfg, dict(w), jnp.float32)
        tight = load_model_from_weights(dict(cfg, sliding_window=1), w,
                                        jnp.float32)

        def logits(m):
            e = jax.jit(m.get_input_embeddings)(m.params,
                                                jnp.asarray(IDS))
            pos = np.arange(6, dtype=np.int32)[None]
            l, _ = m(m.params, e, m.language_model.init_cache(
                1, 8, jnp.float32), jnp.asarray(pos))
            return np.asarray(l)

        assert not np.allclose(logits(base), logits(tight))


class TestExaone4:
    def _cfg(self):
        return {"model_type": "exaone4", "hidden_size": 32,
                "num_hidden_layers": 4, "num_attention_heads": 4,
                "num_key_value_heads": 2, "head_dim": 8,
                "intermediate_size": 64, "vocab_size": 128,
                "rms_norm_eps": 1e-6, "sliding_window": 3,
                "sliding_window_pattern": "LLG"}

    def _weights(self, seed=0):
        rand = rand_fn(seed)
        D, V, hd = 32, 128, 8
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.norm.weight": np.ones(D, np.float32),
             "lm_head.weight": rand(V, D)}
        for i in range(4):
            p = f"model.layers.{i}."
            w[p + "post_attention_layernorm.weight"] = np.ones(
                D, np.float32)
            w[p + "post_feedforward_layernorm.weight"] = np.ones(
                D, np.float32)
            w[p + "self_attn.q_proj.weight"] = rand(D, D)
            w[p + "self_attn.k_proj.weight"] = rand(16, D)
            w[p + "self_attn.v_proj.weight"] = rand(16, D)
            w[p + "self_attn.o_proj.weight"] = rand(D, D)
            w[p + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
            w[p + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
            w[p + "mlp.gate_proj.weight"] = rand(64, D)
            w[p + "mlp.up_proj.weight"] = rand(64, D)
            w[p + "mlp.down_proj.weight"] = rand(D, 64)
        return w

    def test_pattern_and_generate(self):
        m = load_model_from_weights(self._cfg(), self._weights(),
                                    jnp.float32)
        # "LLG" tiled over 4 layers: L L G L
        assert m.language_model.is_local.tolist() == [True, True, False,
                                                      True]
        assert len(_gen(m)) == 3

    def test_nope_global_layers(self):
        """With an all-'G' pattern, logits must be invariant to a rope
        phase shift (no layer applies rope)."""
        cfg = dict(self._cfg(), sliding_window_pattern="G",
                   sliding_window=None)
        m = load_model_from_weights(cfg, self._weights(), jnp.float32)
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(IDS))
        lm = m.language_model

        def run(shift):
            pos = (np.arange(6, dtype=np.int32) + shift)[None]
            cache = lm.init_cache(1, 8, jnp.float32)
            h, _ = m(m.params, e, cache, jnp.asarray(pos))
            return np.asarray(h)

        np.testing.assert_allclose(run(0), run(2), atol=1e-5)
