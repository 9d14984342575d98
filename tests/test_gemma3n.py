"""Gemma3n text: altup streams, laurel, per-layer inputs, KV sharing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step, make_cache
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_g3n_config(**overrides):
    cfg = {
        "model_type": "gemma3n_text",
        "hidden_size": 48,
        "num_hidden_layers": 4,
        "intermediate_size": 96,
        "num_attention_heads": 4,
        "head_dim": 16,
        "num_key_value_heads": 2,
        "vocab_size": 256,
        "vocab_size_per_layer_input": 200,
        "laurel_rank": 8,
        "altup_num_inputs": 2,
        "altup_coef_clip": 120.0,
        "hidden_size_per_layer_input": 16,
        "sliding_window": 4,
        "sliding_window_pattern": 2,
        "num_kv_shared_layers": 2,
        "activation_sparsity_pattern": [0.95, 0.0, 0.0, 0.0],
        "final_logit_softcapping": 30.0,
    }
    cfg.update(overrides)
    return cfg


def tiny_g3n_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    D, V, I = cfg["hidden_size"], cfg["vocab_size"], cfg["intermediate_size"]
    L, Dp = cfg["num_hidden_layers"], cfg["hidden_size_per_layer_input"]
    nh, nkv, hd = (cfg["num_attention_heads"], cfg["num_key_value_heads"],
                   cfg["head_dim"])
    A = cfg["altup_num_inputs"]
    w = {
        "model.embed_tokens.weight": rand(V, D),
        "model.embed_tokens_per_layer.weight": rand(
            cfg["vocab_size_per_layer_input"], L * Dp),
        "model.per_layer_model_projection.weight": rand(L * Dp, D),
        "model.per_layer_projection_norm.weight": np.ones(Dp, np.float32),
        "model.norm.weight": np.ones(D, np.float32),
    }
    for i in range(A - 1):
        w[f"model.altup_projections.{i}.weight"] = rand(D, D)
        w[f"model.altup_unembed_projections.{i}.weight"] = rand(D, D)
    for i in range(L):
        p = f"model.layers.{i}."
        for nm in ("input_layernorm", "post_attention_layernorm",
                   "pre_feedforward_layernorm", "post_feedforward_layernorm",
                   "post_per_layer_input_norm"):
            w[p + nm + ".weight"] = np.ones(D, np.float32)
        w[p + "self_attn.q_proj.weight"] = rand(nh * hd, D)
        w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
        w[p + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
        w[p + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
        w[p + "mlp.gate_proj.weight"] = rand(I, D)
        w[p + "mlp.up_proj.weight"] = rand(I, D)
        w[p + "mlp.down_proj.weight"] = rand(D, I)
        w[p + "laurel.linear_left.weight"] = rand(cfg["laurel_rank"], D)
        w[p + "laurel.linear_right.weight"] = rand(D, cfg["laurel_rank"])
        w[p + "laurel.post_laurel_norm.weight"] = np.ones(D, np.float32)
        w[p + "altup.correct_output_scale"] = np.ones(D, np.float32)
        w[p + "altup.correction_coefs.weight"] = rand(A, A)
        w[p + "altup.prediction_coefs.weight"] = rand(A * A, A)
        w[p + "altup.modality_router.weight"] = rand(A, D)
        w[p + "altup.router_norm.weight"] = np.ones(D, np.float32)
        w[p + "per_layer_input_gate.weight"] = rand(Dp, D)
        w[p + "per_layer_projection.weight"] = rand(D, Dp)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_g3n_config()
    return load_model_from_weights(cfg, tiny_g3n_weights(cfg, 3), jnp.float32)


class TestGemma3n:
    def test_cache_covers_concrete_layers_only(self, model):
        cache = make_cache(model, 1, 16, jnp.float32)
        assert cache.k.shape[0] == 2  # 4 layers - 2 shared

    def test_generate(self, model):
        ids = (np.arange(8, dtype=np.int32) % 200)[None]
        e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        assert e.shape[-1] == 48 + 4 * 16  # packed per-layer inputs
        toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=4)]
        assert len(toks) == 4

    def test_prefill_matches_stepwise(self, model):
        S = 6
        ids = (np.arange(S, dtype=np.int32) * 11 % 200)[None]
        e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S)).copy()
        cache = make_cache(model, 1, 16, jnp.float32)
        lf, _ = model(model.params, e, cache, jnp.asarray(pos))
        cache2 = make_cache(model, 1, 16, jnp.float32)
        for t in range(S):
            p = np.full((3, 1, 1), t, np.int32)
            lg, cache2 = model(model.params, e[:, t:t + 1], cache2,
                               jnp.asarray(p))
        np.testing.assert_allclose(np.asarray(lf[0, -1]), np.asarray(lg[0, 0]),
                                   atol=3e-4, rtol=1e-3)

    def test_logit_softcap(self, model):
        ids = (np.arange(5, dtype=np.int32) % 200)[None]
        e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        cache = make_cache(model, 1, 16, jnp.float32)
        pos = np.broadcast_to(np.arange(5, dtype=np.int32), (3, 1, 5)).copy()
        l, _ = model(model.params, e, cache, jnp.asarray(pos))
        assert np.abs(np.asarray(l)).max() <= 30.0 + 1e-4

    def test_extended_vocab_token_per_layer_zeroed(self, model):
        """ids >= vocab_size_per_layer_input fall back to row 0 embeds."""
        e1 = np.asarray(jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray([[250]], np.int32)))
        e0 = np.asarray(jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray([[0]], np.int32)))
        D = 48
        np.testing.assert_allclose(e1[0, 0, D:], e0[0, 0, D:], atol=1e-6)
