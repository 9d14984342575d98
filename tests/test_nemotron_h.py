"""Nemotron-H: mamba2 scan correctness, run-length hybrid pattern."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step, make_cache
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_nem_config():
    return {
        "model_type": "nemotron_h",
        "vocab_size": 256,
        "hidden_size": 48,
        "intermediate_size": 96,
        "num_hidden_layers": 5,
        "max_position_embeddings": 1024,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "attention_bias": False,
        "mamba_num_heads": 4,
        "mamba_head_dim": 8,
        "mamba_proj_bias": False,
        "ssm_state_size": 8,
        "conv_kernel": 4,
        "n_groups": 2,
        "mlp_bias": False,
        "layer_norm_epsilon": 1e-5,
        "use_bias": False,
        "use_conv_bias": True,
        "hybrid_override_pattern": ["M", "M", "*", "-", "M"],
        "time_step_limit": [0.001, 100.0],
    }


def tiny_nem_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    D, V = cfg["hidden_size"], cfg["vocab_size"]
    H, P, N, G = (cfg["mamba_num_heads"], cfg["mamba_head_dim"],
                  cfg["ssm_state_size"], cfg["n_groups"])
    inter = H * P
    conv_dim = inter + 2 * G * N
    K = cfg["conv_kernel"]
    nh, nkv = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    hd = D // nh
    w = {
        "backbone.embeddings.weight": rand(V, D),
        "backbone.norm_f.weight": np.ones(D, np.float32),
        "lm_head.weight": rand(V, D),
    }
    for i, t in enumerate(cfg["hybrid_override_pattern"]):
        p = f"backbone.layers.{i}."
        w[p + "norm.weight"] = np.ones(D, np.float32)
        if t == "M":
            w[p + "mixer.in_proj.weight"] = rand(inter + conv_dim + H, D)
            w[p + "mixer.conv1d.weight"] = rand(conv_dim, 1, K)
            w[p + "mixer.conv1d.bias"] = rand(conv_dim)
            w[p + "mixer.dt_bias"] = np.zeros(H, np.float32)
            w[p + "mixer.A_log"] = np.log(
                np.arange(1, H + 1)).astype(np.float32)
            w[p + "mixer.D"] = np.ones(H, np.float32)
            w[p + "mixer.norm.weight"] = np.ones(inter, np.float32)
            w[p + "mixer.out_proj.weight"] = rand(D, inter)
        elif t == "*":
            w[p + "mixer.q_proj.weight"] = rand(nh * hd, D)
            w[p + "mixer.k_proj.weight"] = rand(nkv * hd, D)
            w[p + "mixer.v_proj.weight"] = rand(nkv * hd, D)
            w[p + "mixer.o_proj.weight"] = rand(D, nh * hd)
        else:
            w[p + "mixer.up_proj.weight"] = rand(cfg["intermediate_size"], D)
            w[p + "mixer.down_proj.weight"] = rand(D, cfg["intermediate_size"])
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_nem_config()
    return load_model_from_weights(cfg, tiny_nem_weights(cfg, 4), jnp.float32)


class TestMamba2Scan:
    def test_matches_naive_recurrence(self):
        from mlx_vlm_tpu.core.ssm import mamba2_scan

        rng = np.random.default_rng(1)
        B, S, H, P, G, N = 2, 6, 4, 3, 2, 5
        x = rng.standard_normal((B, S, H, P)).astype(np.float32)
        A_log = rng.standard_normal(H).astype(np.float32)
        Bm = rng.standard_normal((B, S, G, N)).astype(np.float32)
        Cm = rng.standard_normal((B, S, G, N)).astype(np.float32)
        D = rng.standard_normal(H).astype(np.float32)
        dt = rng.standard_normal((B, S, H)).astype(np.float32)
        dt_bias = rng.standard_normal(H).astype(np.float32)
        h0 = rng.standard_normal((B, H, P, N)).astype(np.float32)
        y, hT = mamba2_scan(
            jnp.asarray(x), jnp.asarray(A_log), jnp.asarray(Bm),
            jnp.asarray(Cm), jnp.asarray(D), jnp.asarray(dt),
            jnp.asarray(dt_bias), jnp.asarray(h0), (0.001, 100.0),
        )
        # naive loop
        dtp = np.clip(np.log1p(np.exp(dt + dt_bias)), 0.001, 100.0)
        a = -np.exp(A_log)
        Bh = np.repeat(Bm, H // G, axis=2)
        Ch = np.repeat(Cm, H // G, axis=2)
        h = h0.copy()
        ys = np.zeros((B, S, H, P), np.float32)
        for t in range(S):
            dA = np.exp(dtp[:, t] * a)  # [B, H]
            h = (dA[..., None, None] * h
                 + dtp[:, t][..., None, None]
                 * Bh[:, t][:, :, None, :] * x[:, t][..., None])
            ys[:, t] = np.einsum("bhn,bhpn->bhp", Ch[:, t], h)
            ys[:, t] += D[None, :, None] * x[:, t]
        np.testing.assert_allclose(np.asarray(y), ys, atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(hT), h, atol=2e-4, rtol=1e-3)


class TestNemotronH:
    def test_generate(self, model):
        ids = (np.arange(8, dtype=np.int32) % 200)[None]
        e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=4)]
        assert len(toks) == 4

    def test_prefill_matches_stepwise(self, model):
        S = 6
        ids = (np.arange(S, dtype=np.int32) * 9 % 200)[None]
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
        np.testing.assert_allclose(np.asarray(cf.state),
                                   np.asarray(cache2.state),
                                   atol=2e-4, rtol=1e-3)

    def test_padded_prefill_matches_exact(self, model):
        S = 5
        ids = (np.arange(S, dtype=np.int32) * 3 % 200)[None]
        e = np.asarray(jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids)))
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S)).copy()
        cache = make_cache(model, 1, 16, jnp.float32)
        _, c_exact = model(model.params, jnp.asarray(e), cache,
                           jnp.asarray(pos))
        pad = 3
        e_p = np.concatenate([e, np.zeros((1, pad, e.shape[-1]), e.dtype)], 1)
        pos_p = np.concatenate([pos, np.zeros((3, 1, pad), np.int32)], -1)
        cache = make_cache(model, 1, 16, jnp.float32)
        _, c_pad = model(model.params, jnp.asarray(e_p), cache,
                         jnp.asarray(pos_p))
        np.testing.assert_allclose(np.asarray(c_exact.state),
                                   np.asarray(c_pad.state), atol=1e-5,
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(c_exact.conv),
                                   np.asarray(c_pad.conv), atol=1e-6)
