"""LFM2: gated short-conv hybrid."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step, make_cache
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_lfm2_config():
    return {
        "model_type": "lfm2",
        "vocab_size": 256,
        "hidden_size": 48,
        "num_hidden_layers": 4,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "max_position_embeddings": 1024,
        "norm_eps": 1e-5,
        "conv_bias": False,
        "conv_L_cache": 3,
        "block_dim": 48,
        "block_ff_dim": 96,
        "block_multiple_of": 16,
        "block_auto_adjust_ff_dim": False,
        "rope_theta": 10000.0,
        "full_attn_idxs": [1, 3],
        "tie_word_embeddings": True,
    }


def tiny_lfm2_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    D, V, I = cfg["hidden_size"], cfg["vocab_size"], cfg["block_ff_dim"]
    nh, nkv = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    hd = D // nh
    K = cfg["conv_L_cache"]
    w = {
        "model.embed_tokens.weight": rand(V, D),
        "model.embedding_norm.weight": np.ones(D, np.float32),
    }
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}."
        w[p + "operator_norm.weight"] = np.ones(D, np.float32)
        w[p + "ffn_norm.weight"] = np.ones(D, np.float32)
        if i in cfg["full_attn_idxs"]:
            w[p + "self_attn.q_proj.weight"] = rand(nh * hd, D)
            w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
            w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
            w[p + "self_attn.out_proj.weight"] = rand(D, nh * hd)
            w[p + "self_attn.q_layernorm.weight"] = np.ones(hd, np.float32)
            w[p + "self_attn.k_layernorm.weight"] = np.ones(hd, np.float32)
        else:
            w[p + "conv.in_proj.weight"] = rand(3 * D, D)
            w[p + "conv.out_proj.weight"] = rand(D, D)
            w[p + "conv.conv.weight"] = rand(D, 1, K)
        w[p + "feed_forward.w1.weight"] = rand(I, D)
        w[p + "feed_forward.w3.weight"] = rand(I, D)
        w[p + "feed_forward.w2.weight"] = rand(D, I)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_lfm2_config()
    return load_model_from_weights(cfg, tiny_lfm2_weights(cfg, 5), jnp.float32)


class TestLfm2:
    def test_generate(self, model):
        ids = (np.arange(8, dtype=np.int32) % 200)[None]
        e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=4)]
        assert len(toks) == 4

    def test_prefill_matches_stepwise(self, model):
        S = 6
        ids = (np.arange(S, dtype=np.int32) * 7 % 200)[None]
        e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S)).copy()
        cache = make_cache(model, 1, 16, jnp.float32)
        lf, cf = model(model.params, e, cache, jnp.asarray(pos))
        cache2 = make_cache(model, 1, 16, jnp.float32)
        for t in range(S):
            p = np.full((3, 1, 1), t, np.int32)
            lg, cache2 = model(model.params, e[:, t:t + 1], cache2,
                               jnp.asarray(p))
        np.testing.assert_allclose(np.asarray(lf[0, -1]), np.asarray(lg[0, 0]),
                                   atol=3e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(cf.conv),
                                   np.asarray(cache2.conv), atol=1e-5)

    def test_padded_prefill_matches_exact(self, model):
        S = 5
        ids = (np.arange(S, dtype=np.int32) * 3 % 200)[None]
        e = np.asarray(jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids)))
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S)).copy()
        cache = make_cache(model, 1, 16, jnp.float32)
        _, c1 = model(model.params, jnp.asarray(e), cache, jnp.asarray(pos))
        pad = 3
        e_p = np.concatenate([e, np.zeros((1, pad, e.shape[-1]), e.dtype)], 1)
        pos_p = np.concatenate([pos, np.zeros((3, 1, pad), np.int32)], -1)
        cache = make_cache(model, 1, 16, jnp.float32)
        _, c2 = model(model.params, jnp.asarray(e_p), cache,
                      jnp.asarray(pos_p))
        np.testing.assert_allclose(np.asarray(c1.conv), np.asarray(c2.conv),
                                   atol=1e-6)
