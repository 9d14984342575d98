"""Text-family tranche 5c: recurrent_gemma (Griffin), hrm_text."""

import numpy as np

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights

IDS = (np.arange(7, dtype=np.int32) * 9 % 70)[None]


def _rand(rng):
    def f(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)
    return f


def _gen(model, n=3):
    e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(IDS))
    return [int(t[0]) for t, _ in generate_step(e, model, max_tokens=n)]


def _chunk_parity(model, split=4, atol=3e-5):
    lm = model.language_model
    e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(IDS))
    S = IDS.shape[1]
    pos = np.arange(S, dtype=np.int32)[None]
    cache = lm.init_cache(1, S, jnp.float32)
    whole, _ = model(model.params, e, cache, jnp.asarray(pos))
    cache = lm.init_cache(1, S, jnp.float32)
    _, cache = model(model.params, e[:, :split], cache,
                     jnp.asarray(pos[:, :split]))
    part, _ = model(model.params, e[:, split:], cache,
                    jnp.asarray(pos[:, split:]))
    np.testing.assert_allclose(np.asarray(part[:, -1]),
                               np.asarray(whole[:, -1]), atol=atol)


class TestRecurrentGemma:
    def _cfg(self):
        return {"model_type": "recurrent_gemma", "attention_bias": False,
                "conv1d_width": 4, "hidden_size": 32,
                "intermediate_size": 96, "logits_soft_cap": 30.0,
                "num_attention_heads": 4, "num_hidden_layers": 3,
                "num_key_value_heads": 1, "rms_norm_eps": 1e-6,
                "rope_theta": 10000.0, "attention_window_size": 4,
                "vocab_size": 80, "embeddings_scale_by_sqrt_dim": True,
                "block_types": ["recurrent", "recurrent", "attention"]}

    def _weights(self, cfg, seed=0):
        rand = _rand(np.random.default_rng(seed))
        D, V = cfg["hidden_size"], cfg["vocab_size"]
        H = cfg["num_attention_heads"]
        hd = D // H
        K = cfg["conv1d_width"]
        I2 = cfg["intermediate_size"] // 2
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.final_norm.weight": np.zeros(D, np.float32),
             "lm_head.weight": rand(V, D)}
        for i in range(cfg["num_hidden_layers"]):
            p = f"model.layers.{i}."
            w[p + "temporal_pre_norm.weight"] = np.zeros(D, np.float32)
            w[p + "channel_pre_norm.weight"] = np.zeros(D, np.float32)
            bt = cfg["block_types"][i % len(cfg["block_types"])]
            t = p + "temporal_block."
            if bt == "recurrent":
                w[t + "linear_y.weight"] = rand(D, D)
                w[t + "linear_y.bias"] = rand(D)
                w[t + "linear_x.weight"] = rand(D, D)
                w[t + "linear_x.bias"] = rand(D)
                w[t + "linear_out.weight"] = rand(D, D)
                w[t + "linear_out.bias"] = rand(D)
                w[t + "conv_1d.weight"] = rand(D, K, 1)
                w[t + "conv_1d.bias"] = rand(D)
                w[t + "rg_lru.recurrent_param"] = rand(D)
                w[t + "rg_lru.input_gate_weight"] = rand(H, hd, hd)
                w[t + "rg_lru.input_gate_bias"] = rand(H, hd)
                w[t + "rg_lru.recurrent_gate_weight"] = rand(H, hd, hd)
                w[t + "rg_lru.recurrent_gate_bias"] = rand(H, hd)
            else:
                w[t + "q_proj.weight"] = rand(D, D)
                w[t + "k_proj.weight"] = rand(hd, D)
                w[t + "v_proj.weight"] = rand(hd, D)
                w[t + "o_proj.weight"] = rand(D, D)
                w[t + "o_proj.bias"] = rand(D)
            m = p + "mlp_block."
            w[m + "gate_proj.weight"] = rand(I2, D)
            w[m + "gate_proj.bias"] = rand(I2)
            w[m + "up_proj.weight"] = rand(I2, D)
            w[m + "up_proj.bias"] = rand(I2)
            w[m + "down_proj.weight"] = rand(D, I2)
            w[m + "down_proj.bias"] = rand(D)
        return w

    def test_generate(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        assert len(_gen(m)) == 3

    def test_recurrence_state_carries_across_chunks(self):
        """RG-LRU state + conv tail must make chunked prefill match the
        whole-prompt forward exactly."""
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        for split in (1, 3, 5):
            _chunk_parity(m, split=split, atol=5e-5)

    def test_logit_softcap(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(IDS))
        S = IDS.shape[1]
        cache = m.language_model.init_cache(1, S, jnp.float32)
        pos = jnp.asarray(np.arange(S, dtype=np.int32)[None])
        logits, _ = m(m.params, e, cache, pos)
        assert np.abs(np.asarray(logits)).max() <= 30.0


class TestHrmText:
    def _cfg(self):
        return {"model_type": "hrm_text", "vocab_size": 90,
                "hidden_size": 32, "intermediate_size": 64,
                "num_hidden_layers": 2, "num_attention_heads": 4,
                "num_key_value_heads": 2, "head_dim": 8,
                "rms_norm_eps": 1e-6, "max_position_embeddings": 256,
                "initializer_range": 0.02, "rope_theta": 10000.0,
                "H_cycles": 2, "L_cycles": 2,
                "tie_word_embeddings": False}

    def _weights(self, cfg, seed=1):
        rand = _rand(np.random.default_rng(seed))
        D, V = cfg["hidden_size"], cfg["vocab_size"]
        hd = cfg["head_dim"]
        nh, nkv = cfg["num_attention_heads"], cfg["num_key_value_heads"]
        I = cfg["intermediate_size"]
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.z_L_init": rand(D),
             "lm_head.weight": rand(V, D)}
        for stack in ("L_module", "H_module"):
            for j in range(cfg["num_hidden_layers"]):
                p = f"model.{stack}.layers.{j}."
                w[p + "self_attn.q_proj.weight"] = rand(nh * hd, D)
                w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
                w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
                w[p + "self_attn.gate_proj.weight"] = rand(nh * hd, D)
                w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
                w[p + "mlp.gate_proj.weight"] = rand(I, D)
                w[p + "mlp.up_proj.weight"] = rand(I, D)
                w[p + "mlp.down_proj.weight"] = rand(D, I)
        return w

    def test_generate_and_parity(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        # effective cache depth = stack * H * (L+1) = 2 * 2 * 3 = 12
        assert m.config.num_hidden_layers == 12
        assert len(_gen(m)) == 3
        _chunk_parity(m)

    def test_cycles_share_weights(self):
        """More cycles with the same stacks changes depth (and output)
        but loads the SAME weight set."""
        cfg = self._cfg()
        w = self._weights(cfg)
        m1 = load_model_from_weights(dict(cfg), dict(w), jnp.float32)
        cfg2 = dict(cfg, H_cycles=1, L_cycles=1)
        m2 = load_model_from_weights(cfg2, dict(w), jnp.float32)
        e = jax.jit(m1.get_input_embeddings)(m1.params, jnp.asarray(IDS))
        S = IDS.shape[1]
        pos = jnp.asarray(np.arange(S, dtype=np.int32)[None])
        c1 = m1.language_model.init_cache(1, S, jnp.float32)
        c2 = m2.language_model.init_cache(1, S, jnp.float32)
        l1, _ = m1(m1.params, e, c1, pos)
        l2, _ = m2(m2.params, e, c2, pos)
        assert np.abs(np.asarray(l1) - np.asarray(l2)).max() > 1e-5
