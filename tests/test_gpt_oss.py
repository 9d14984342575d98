"""gpt_oss family: attention sinks, sliding/full alternation, clipped
SwiGLU MoE with expert biases."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_gpt_oss_config(**overrides):
    cfg = {
        "model_type": "gpt_oss",
        "hidden_size": 32,
        "num_hidden_layers": 2,
        "intermediate_size": 24,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "head_dim": 8,
        "num_local_experts": 4,
        "num_experts_per_tok": 2,
        "sliding_window": 4,
        "rms_norm_eps": 1e-5,
        "vocab_size": 96,
        "rope_theta": 150000.0,
        "layer_types": ["sliding_attention", "full_attention"],
        "tie_word_embeddings": False,
    }
    cfg.update(overrides)
    return cfg


def gpt_oss_hf_weights(cfg, seed=0, scale=0.05, sink_scale=0.5):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    D = cfg["hidden_size"]
    I = cfg["intermediate_size"]
    E = cfg["num_local_experts"]
    nh = cfg["num_attention_heads"]
    nkv = cfg["num_key_value_heads"]
    hd = cfg["head_dim"]
    V = cfg["vocab_size"]
    w = {
        "model.embed_tokens.weight": rand(V, D),
        "model.norm.weight": 1.0 + rand(D),
        "lm_head.weight": rand(V, D),
    }
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}."
        w[p + "input_layernorm.weight"] = 1.0 + rand(D)
        w[p + "post_attention_layernorm.weight"] = 1.0 + rand(D)
        for nm, o in (("q_proj", nh * hd), ("k_proj", nkv * hd),
                      ("v_proj", nkv * hd)):
            w[p + f"self_attn.{nm}.weight"] = rand(o, D)
            w[p + f"self_attn.{nm}.bias"] = rand(o)
        w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
        w[p + "self_attn.o_proj.bias"] = rand(D)
        w[p + "self_attn.sinks"] = (
            rng.standard_normal(nh) * sink_scale
        ).astype(np.float32)
        w[p + "mlp.router.weight"] = rand(E, D)
        w[p + "mlp.router.bias"] = rand(E)
        # HF layout: [E, D, 2I] interleaved gate/up, [E, I, D] down
        w[p + "mlp.experts.gate_up_proj"] = rand(E, D, 2 * I)
        w[p + "mlp.experts.gate_up_proj_bias"] = rand(E, 2 * I)
        w[p + "mlp.experts.down_proj"] = rand(E, I, D)
        w[p + "mlp.experts.down_proj_bias"] = rand(E, D)
    return w


IDS = (np.arange(8, dtype=np.int32) * 5 % 90)[None]


def _logits(model, ids):
    e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
    S = ids.shape[1]
    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S)).copy()
    l, _ = model(model.params, e, None, jnp.asarray(pos))
    return np.asarray(l)


class TestGptOss:
    def test_generate(self):
        from mlx_vlm_tpu.generate.ar import generate_step

        cfg = tiny_gpt_oss_config()
        m = load_model_from_weights(cfg, gpt_oss_hf_weights(cfg), jnp.float32)
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(IDS))
        toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=4)]
        assert len(toks) == 4

    def test_prefill_matches_decode(self):
        """Cached incremental forward == uncached full forward (window +
        sinks must be position-consistent)."""
        from mlx_vlm_tpu.generate.ar import make_cache

        cfg = tiny_gpt_oss_config()
        m = load_model_from_weights(cfg, gpt_oss_hf_weights(cfg), jnp.float32)
        S = IDS.shape[1]
        full = _logits(m, IDS)  # [1, S, V]

        cache = make_cache(m, 1, 16, jnp.float32)
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(IDS))
        outs = []
        for t in range(S):
            pos = np.full((3, 1, 1), t, np.int32)
            l, cache = m(m.params, e[:, t : t + 1], cache, jnp.asarray(pos))
            import dataclasses

            cache = dataclasses.replace(
                cache, offset=jnp.asarray(t + 1, jnp.int32)
            )
            outs.append(np.asarray(l)[0, -1])
        np.testing.assert_allclose(
            np.stack(outs), full[0], rtol=2e-4, atol=2e-4
        )

    def test_sinks_affect_logits(self):
        cfg = tiny_gpt_oss_config()
        w = gpt_oss_hf_weights(cfg, sink_scale=0.0)
        m0 = load_model_from_weights(cfg, dict(w), jnp.float32)
        for k in list(w):
            if k.endswith("sinks"):
                w[k] = np.full_like(w[k], 4.0)
        m1 = load_model_from_weights(cfg, w, jnp.float32)
        assert not np.allclose(_logits(m0, IDS), _logits(m1, IDS), atol=1e-4)

    def test_window_limits_attention(self):
        """With all-sliding layers, tokens beyond the window cannot
        influence the last position: perturbing token 0 changes full-attn
        logits but not sliding-window logits at position 7."""
        w_kwargs = dict(seed=3, sink_scale=0.0)
        cfg_s = tiny_gpt_oss_config(
            layer_types=["sliding_attention", "sliding_attention"]
        )
        cfg_f = tiny_gpt_oss_config(
            layer_types=["full_attention", "full_attention"]
        )
        ids2 = IDS.copy()
        ids2[0, 0] = (ids2[0, 0] + 1) % 90
        w = gpt_oss_hf_weights(cfg_s, **w_kwargs)
        ms = load_model_from_weights(cfg_s, dict(w), jnp.float32)
        mf = load_model_from_weights(cfg_f, dict(w), jnp.float32)
        last = lambda m, ids: _logits(m, ids)[0, -1]  # noqa: E731
        np.testing.assert_allclose(
            last(ms, IDS), last(ms, ids2), atol=1e-5
        )
        assert not np.allclose(last(mf, IDS), last(mf, ids2), atol=1e-5)


class TestSinksSdpa:
    def test_neg_inf_sink_equals_no_sink(self):
        from mlx_vlm_tpu.ops.attention import sdpa

        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((1, 4, 3, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 2, 5, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 2, 5, 8)), jnp.float32)
        base = sdpa(q, k, v, 0.35)
        off = sdpa(q, k, v, 0.35, sinks=jnp.full((4,), -1e9))
        np.testing.assert_allclose(np.asarray(base), np.asarray(off),
                                   atol=1e-6)
        on = sdpa(q, k, v, 0.35, sinks=jnp.zeros((4,)))
        assert not np.allclose(np.asarray(base), np.asarray(on), atol=1e-4)

    def test_sink_shrinks_mass(self):
        """Each row's output with a finite sink is a uniform down-scaling of
        the no-sink probabilities: out_sink = out * Z/(Z+e^s)."""
        from mlx_vlm_tpu.ops.attention import sdpa

        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.standard_normal((1, 2, 1, 4)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 2, 3, 4)), jnp.float32)
        v = jnp.asarray(np.ones((1, 2, 3, 4)), jnp.float32)
        base = np.asarray(sdpa(q, k, v, 1.0))
        sunk = np.asarray(sdpa(q, k, v, 1.0, sinks=jnp.zeros((2,))))
        # with v == 1, outputs equal total probability mass: < 1 with sink
        assert np.all(sunk < base + 1e-6)
        assert np.all(sunk < 1.0)
        np.testing.assert_allclose(base, np.ones_like(base), atol=1e-5)
