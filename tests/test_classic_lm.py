"""Classic text families on the shared ClassicLanguageModel: gpt2,
gpt_neox, starcoder2, stablelm, nemotron (+ qwen3 remap)."""

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


def _logits(model):
    e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(IDS))
    pos = np.arange(IDS.shape[1], dtype=np.int32)[None]
    l, _ = model(model.params, e, None, jnp.asarray(pos))
    return np.asarray(l)


def rand_fn(seed):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    return rand


class TestGpt2:
    def _weights(self, seed=0):
        rand = rand_fn(seed)
        D, V, L = 32, 128, 2
        w = {"wte.weight": rand(V, D), "wpe.weight": rand(64, D),
             "ln_f.weight": np.ones(D, np.float32),
             "ln_f.bias": np.zeros(D, np.float32)}
        for i in range(L):
            p = f"h.{i}."
            for nm in ("ln_1", "ln_2"):
                w[p + nm + ".weight"] = np.ones(D, np.float32)
                w[p + nm + ".bias"] = np.zeros(D, np.float32)
            # HF Conv1D layout [in, out]
            w[p + "attn.c_attn.weight"] = rand(D, 3 * D)
            w[p + "attn.c_attn.bias"] = rand(3 * D)
            w[p + "attn.c_proj.weight"] = rand(D, D)
            w[p + "attn.c_proj.bias"] = rand(D)
            w[p + "mlp.c_fc.weight"] = rand(D, 4 * D)
            w[p + "mlp.c_fc.bias"] = rand(4 * D)
            w[p + "mlp.c_proj.weight"] = rand(4 * D, D)
            w[p + "mlp.c_proj.bias"] = rand(D)
        return w

    def _cfg(self):
        return {"model_type": "gpt2", "n_embd": 32, "n_layer": 2,
                "n_head": 4, "vocab_size": 128, "n_positions": 64}

    def test_generate(self):
        m = load_model_from_weights(self._cfg(), self._weights(),
                                    jnp.float32)
        assert len(_gen(m)) == 3

    def test_wpe_active(self):
        w = self._weights()
        base = _logits(load_model_from_weights(self._cfg(), dict(w),
                                               jnp.float32))
        w2 = dict(w, **{"wpe.weight": np.zeros_like(w["wpe.weight"])})
        nz = _logits(load_model_from_weights(self._cfg(), w2, jnp.float32))
        assert not np.allclose(base, nz)


class TestGptNeox:
    def _cfg(self):
        return {"model_type": "gpt_neox", "hidden_size": 32,
                "num_hidden_layers": 2, "num_attention_heads": 4,
                "intermediate_size": 64, "vocab_size": 128,
                "rotary_pct": 0.5, "use_parallel_residual": True}

    def _weights(self, seed=0):
        rand = rand_fn(seed)
        D, V, L, H, hd = 32, 128, 2, 4, 8
        w = {"gpt_neox.embed_in.weight": rand(V, D),
             "gpt_neox.final_layer_norm.weight": np.ones(D, np.float32),
             "gpt_neox.final_layer_norm.bias": np.zeros(D, np.float32),
             "embed_out.weight": rand(V, D)}
        for i in range(L):
            p = f"gpt_neox.layers.{i}."
            for nm in ("input_layernorm", "post_attention_layernorm"):
                w[p + nm + ".weight"] = np.ones(D, np.float32)
                w[p + nm + ".bias"] = np.zeros(D, np.float32)
            w[p + "attention.query_key_value.weight"] = rand(3 * D, D)
            w[p + "attention.query_key_value.bias"] = rand(3 * D)
            w[p + "attention.dense.weight"] = rand(D, D)
            w[p + "attention.dense.bias"] = rand(D)
            w[p + "mlp.dense_h_to_4h.weight"] = rand(64, D)
            w[p + "mlp.dense_h_to_4h.bias"] = rand(64)
            w[p + "mlp.dense_4h_to_h.weight"] = rand(D, 64)
            w[p + "mlp.dense_4h_to_h.bias"] = rand(D)
        return w

    def test_generate(self):
        m = load_model_from_weights(self._cfg(), self._weights(),
                                    jnp.float32)
        assert len(_gen(m)) == 3

    def test_qkv_interleave_split(self):
        """Per-head interleaved fused qkv must split to coherent blocks:
        a checkpoint whose v-rows are zero must make attention output
        position-independent of values (all-zero context)."""
        w = self._weights()
        H, hd, D = 4, 8, 32
        qkv = w["gpt_neox.layers.0.attention.query_key_value.weight"]
        v3 = qkv.reshape(H, 3, hd, D)
        v3[:, 2] = 0.0  # zero the per-head v rows
        w["gpt_neox.layers.0.attention.query_key_value.weight"] = (
            v3.reshape(3 * D, D))
        m = load_model_from_weights(self._cfg(), w, jnp.float32)
        vw = np.asarray(
            m.params["language_model"]["model"]["layers"]["attn"]["v_proj"]
            ["weight"])
        assert np.allclose(vw[0], 0.0)  # layer 0 v_proj all zero
        assert not np.allclose(vw[1], 0.0)


class TestStarcoder2:
    def _cfg(self):
        return {"model_type": "starcoder2", "hidden_size": 32,
                "num_hidden_layers": 2, "num_attention_heads": 4,
                "num_key_value_heads": 2, "intermediate_size": 64,
                "vocab_size": 128, "tie_word_embeddings": True}

    def _weights(self, seed=0):
        rand = rand_fn(seed)
        D, V, L = 32, 128, 2
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.norm.weight": np.ones(D, np.float32),
             "model.norm.bias": np.zeros(D, np.float32)}
        for i in range(L):
            p = f"model.layers.{i}."
            for nm in ("input_layernorm", "post_attention_layernorm"):
                w[p + nm + ".weight"] = np.ones(D, np.float32)
                w[p + nm + ".bias"] = np.zeros(D, np.float32)
            w[p + "self_attn.q_proj.weight"] = rand(D, D)
            w[p + "self_attn.q_proj.bias"] = rand(D)
            w[p + "self_attn.k_proj.weight"] = rand(16, D)
            w[p + "self_attn.k_proj.bias"] = rand(16)
            w[p + "self_attn.v_proj.weight"] = rand(16, D)
            w[p + "self_attn.v_proj.bias"] = rand(16)
            w[p + "self_attn.o_proj.weight"] = rand(D, D)
            w[p + "self_attn.o_proj.bias"] = rand(D)
            w[p + "mlp.c_fc.weight"] = rand(64, D)
            w[p + "mlp.c_fc.bias"] = rand(64)
            w[p + "mlp.c_proj.weight"] = rand(D, 64)
            w[p + "mlp.c_proj.bias"] = rand(D)
        return w

    def test_generate(self):
        m = load_model_from_weights(self._cfg(), self._weights(),
                                    jnp.float32)
        assert len(_gen(m)) == 3


class TestStablelm:
    def _cfg(self, **over):
        cfg = {"model_type": "stablelm", "hidden_size": 32,
               "num_hidden_layers": 2, "num_attention_heads": 4,
               "num_key_value_heads": 4, "intermediate_size": 64,
               "vocab_size": 128, "partial_rotary_factor": 0.25,
               "use_parallel_residual": False, "qk_layernorm": True,
               "use_qkv_bias": False}
        cfg.update(over)
        return cfg

    def _weights(self, cfg, seed=0):
        rand = rand_fn(seed)
        D, V = 32, 128
        hd = 8
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.norm.weight": np.ones(D, np.float32),
             "model.norm.bias": np.zeros(D, np.float32),
             "lm_head.weight": rand(V, D)}
        for i in range(cfg["num_hidden_layers"]):
            p = f"model.layers.{i}."
            w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
            w[p + "input_layernorm.bias"] = np.zeros(D, np.float32)
            if not cfg["use_parallel_residual"]:
                w[p + "post_attention_layernorm.weight"] = np.ones(
                    D, np.float32)
                w[p + "post_attention_layernorm.bias"] = np.zeros(
                    D, np.float32)
            for nm, n_out in (("q_proj", D), ("k_proj", D), ("v_proj", D),
                              ("o_proj", D)):
                w[p + f"self_attn.{nm}.weight"] = rand(n_out, D)
            if cfg["qk_layernorm"]:
                for which, H in (("q", 4), ("k", 4)):
                    for h in range(H):
                        w[p + f"self_attn.{which}_layernorm.norms.{h}"
                          ".weight"] = (1.0 + rand(hd) * 0.1)
            w[p + "mlp.gate_proj.weight"] = rand(64, D)
            w[p + "mlp.up_proj.weight"] = rand(64, D)
            w[p + "mlp.down_proj.weight"] = rand(D, 64)
        return w

    def test_generate_with_headnorms(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        ln = m.params["language_model"]["model"]["layers"]["attn"]
        assert ln["q_norms"]["weight"].shape == (2, 4, 8)  # [L, H, hd]
        assert len(_gen(m)) == 3

    def test_parallel_residual(self):
        cfg = self._cfg(use_parallel_residual=True, qk_layernorm=False)
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        assert len(_gen(m)) == 3


class TestNemotron:
    def _cfg(self):
        return {"model_type": "nemotron", "hidden_size": 32,
                "num_hidden_layers": 2, "num_attention_heads": 4,
                "num_key_value_heads": 2, "intermediate_size": 64,
                "vocab_size": 128, "partial_rotary_factor": 0.5,
                "rope_scaling": {"type": "linear", "factor": 2.0}}

    def _weights(self, seed=0):
        rand = rand_fn(seed)
        D, V = 32, 128
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.norm.weight": np.zeros(D, np.float32),  # 1P: w+1
             "model.norm.bias": np.zeros(D, np.float32),
             "lm_head.weight": rand(V, D)}
        for i in range(2):
            p = f"model.layers.{i}."
            for nm in ("input_layernorm", "post_attention_layernorm"):
                w[p + nm + ".weight"] = np.zeros(D, np.float32)
                w[p + nm + ".bias"] = np.zeros(D, np.float32)
            w[p + "self_attn.q_proj.weight"] = rand(D, D)
            w[p + "self_attn.k_proj.weight"] = rand(16, D)
            w[p + "self_attn.v_proj.weight"] = rand(16, D)
            w[p + "self_attn.o_proj.weight"] = rand(D, D)
            w[p + "mlp.up_proj.weight"] = rand(64, D)
            w[p + "mlp.down_proj.weight"] = rand(D, 64)
        return w

    def test_generate_and_1p_norm(self):
        m = load_model_from_weights(self._cfg(), self._weights(),
                                    jnp.float32)
        # zero checkpoint norm weights + 1P semantics => effective scale 1
        assert len(_gen(m)) == 3
        out = _logits(m)
        assert np.isfinite(out).all() and not np.allclose(out, 0)


class TestQwen3Remap:
    def test_remap_and_generate(self):
        from mlx_vlm_tpu.utils.loader import MODEL_REMAPPING

        assert MODEL_REMAPPING.get("qwen3") == "llama"
        rand = rand_fn(3)
        D, V, hd = 32, 128, 8
        cfg = {"model_type": "qwen3", "hidden_size": D,
               "num_hidden_layers": 2, "num_attention_heads": 4,
               "num_key_value_heads": 2, "head_dim": hd,
               "intermediate_size": 64, "vocab_size": V,
               "rms_norm_eps": 1e-6, "rope_theta": 1e6}
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.norm.weight": np.ones(D, np.float32),
             "lm_head.weight": rand(V, D)}
        for i in range(2):
            p = f"model.layers.{i}."
            w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
            w[p + "post_attention_layernorm.weight"] = np.ones(
                D, np.float32)
            w[p + "self_attn.q_proj.weight"] = rand(4 * hd, D)
            w[p + "self_attn.k_proj.weight"] = rand(2 * hd, D)
            w[p + "self_attn.v_proj.weight"] = rand(2 * hd, D)
            w[p + "self_attn.o_proj.weight"] = rand(D, 4 * hd)
            w[p + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
            w[p + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
            w[p + "mlp.gate_proj.weight"] = rand(64, D)
            w[p + "mlp.up_proj.weight"] = rand(64, D)
            w[p + "mlp.down_proj.weight"] = rand(D, 64)
        m = load_model_from_weights(cfg, w, jnp.float32)
        assert len(_gen(m)) == 3


class TestPhi:
    def test_generate(self):
        rand = rand_fn(11)
        D, V = 32, 128
        cfg = {"model_type": "phi", "hidden_size": D,
               "num_hidden_layers": 2, "num_attention_heads": 4,
               "intermediate_size": 64, "vocab_size": V,
               "partial_rotary_factor": 0.5}
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.final_layernorm.weight": np.ones(D, np.float32),
             "model.final_layernorm.bias": np.zeros(D, np.float32),
             "lm_head.weight": rand(V, D), "lm_head.bias": rand(V)}
        for i in range(2):
            p = f"model.layers.{i}."
            w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
            w[p + "input_layernorm.bias"] = np.zeros(D, np.float32)
            for nm in ("q_proj", "k_proj", "v_proj", "dense"):
                w[p + f"self_attn.{nm}.weight"] = rand(D, D)
                w[p + f"self_attn.{nm}.bias"] = rand(D)
            w[p + "mlp.fc1.weight"] = rand(64, D)
            w[p + "mlp.fc1.bias"] = rand(64)
            w[p + "mlp.fc2.weight"] = rand(D, 64)
            w[p + "mlp.fc2.bias"] = rand(D)
        m = load_model_from_weights(cfg, w, jnp.float32)
        assert m.config.parallel and m.config.parallel_shared_ln
        assert len(_gen(m)) == 3


class TestQwen1:
    def test_generate(self):
        rand = rand_fn(12)
        D, V, I2 = 32, 128, 32  # intermediate // 2
        cfg = {"model_type": "qwen", "hidden_size": D,
               "num_hidden_layers": 2, "num_attention_heads": 4,
               "kv_channels": 8, "intermediate_size": 64,
               "vocab_size": V}
        w = {"transformer.wte.weight": rand(V, D),
             "transformer.ln_f.weight": np.ones(D, np.float32),
             "lm_head.weight": rand(V, D)}
        for i in range(2):
            p = f"transformer.h.{i}."
            w[p + "ln_1.weight"] = np.ones(D, np.float32)
            w[p + "ln_2.weight"] = np.ones(D, np.float32)
            w[p + "attn.c_attn.weight"] = rand(3 * D, D)
            w[p + "attn.c_attn.bias"] = rand(3 * D)
            w[p + "attn.c_proj.weight"] = rand(D, D)
            w[p + "mlp.w1.weight"] = rand(I2, D)
            w[p + "mlp.w2.weight"] = rand(I2, D)
            w[p + "mlp.c_proj.weight"] = rand(D, I2)
        m = load_model_from_weights(cfg, w, jnp.float32)
        assert len(_gen(m)) == 3


class TestPhixtral:
    def test_generate(self):
        rand = rand_fn(21)
        D, V, E = 32, 128, 4
        cfg = {"model_type": "phixtral", "model_dim": D, "num_layers": 2,
               "num_heads": 4, "num_vocab": V, "rotary_dim": 4,
               "num_local_experts": E, "num_experts_per_tok": 2}
        w = {"transformer.embd.wte.weight": rand(V, D),
             "lm_head.ln.weight": np.ones(D, np.float32),
             "lm_head.ln.bias": np.zeros(D, np.float32),
             "lm_head.linear.weight": rand(V, D),
             "lm_head.linear.bias": rand(V)}
        for i in range(2):
            p = f"transformer.h.{i}."
            w[p + "ln.weight"] = np.ones(D, np.float32)
            w[p + "ln.bias"] = np.zeros(D, np.float32)
            w[p + "mixer.Wqkv.weight"] = rand(3 * D, D)
            w[p + "mixer.Wqkv.bias"] = rand(3 * D)
            w[p + "mixer.out_proj.weight"] = rand(D, D)
            w[p + "mixer.out_proj.bias"] = rand(D)
            w[p + "moe.gate.weight"] = rand(E, D)
            for e in range(E):
                w[p + f"moe.mlp.{e}.fc1.weight"] = rand(4 * D, D)
                w[p + f"moe.mlp.{e}.fc1.bias"] = rand(4 * D)
                w[p + f"moe.mlp.{e}.fc2.weight"] = rand(D, 4 * D)
                w[p + f"moe.mlp.{e}.fc2.bias"] = rand(D)
        m = load_model_from_weights(cfg, w, jnp.float32)
        ex = m.params["language_model"]["model"]["layers"]["mlp"]["fc1"]
        assert ex["weight"].shape == (2, 4, 128, 32)  # [L, E, I, D]
        assert len(_gen(m)) == 3
