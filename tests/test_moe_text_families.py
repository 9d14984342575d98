"""Text-MoE family tranche: mixtral / olmoe / granitemoe.

Each family loads through the real pipeline (sanitize -> stack -> scan) and
is checked for key-layout equivalence against the shared qwen2_moe decoder
where the architectures coincide."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.utils.loader import load_model_from_weights
from mlx_vlm_tpu.utils.testing import (
    qwen2_moe_hf_weights,
    tiny_qwen2_moe_config,
)


def _moe_weights_no_shared(cfg, seed=0):
    w = qwen2_moe_hf_weights(cfg, seed)
    return {k: v for k, v in w.items() if "shared_expert" not in k}


def _logits(model, ids):
    e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
    S = ids.shape[1]
    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S)).copy()
    l, _ = model(model.params, e, None, jnp.asarray(pos))
    return np.asarray(l)


IDS = (np.arange(6, dtype=np.int32) * 7 % 200)[None]


class TestMixtral:
    def test_renamed_keys_match_qwen2_moe(self):
        cfg = tiny_qwen2_moe_config(norm_topk_prob=True, attention_bias=False)
        w = _moe_weights_no_shared(cfg)
        ref = load_model_from_weights(cfg, dict(w), jnp.float32)

        mw = {}
        ren = {"gate_proj": "w1", "up_proj": "w3", "down_proj": "w2"}
        for k, v in w.items():
            if ".mlp.experts." in k:
                for new, old in ren.items():
                    k = k.replace(f".{new}.", f".{old}.")
                k = k.replace(".mlp.experts.", ".block_sparse_moe.experts.")
            k = k.replace(".mlp.gate.", ".block_sparse_moe.gate.")
            mw[k] = v
        mcfg = dict(cfg)
        mcfg["model_type"] = "mixtral"
        mcfg["num_local_experts"] = cfg["num_experts"]
        m = load_model_from_weights(mcfg, mw, jnp.float32)
        np.testing.assert_allclose(_logits(m, IDS), _logits(ref, IDS), atol=1e-5)

    def test_generate(self):
        from mlx_vlm_tpu.generate.ar import generate_step

        cfg = tiny_qwen2_moe_config(norm_topk_prob=True, attention_bias=False)
        cfg["model_type"] = "mixtral"
        cfg["num_local_experts"] = cfg["num_experts"]
        w = {}
        ren = {"gate_proj": "w1", "up_proj": "w3", "down_proj": "w2"}
        for k, v in _moe_weights_no_shared(cfg).items():
            if ".mlp.experts." in k:
                for new, old in ren.items():
                    k = k.replace(f".{new}.", f".{old}.")
                k = k.replace(".mlp.experts.", ".block_sparse_moe.experts.")
            k = k.replace(".mlp.gate.", ".block_sparse_moe.gate.")
            w[k] = v
        m = load_model_from_weights(cfg, w, jnp.float32)
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(IDS))
        toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=4)]
        assert len(toks) == 4


class TestOlmoe:
    def _weights(self, cfg, seed=0):
        rng = np.random.default_rng(seed + 77)
        w = _moe_weights_no_shared(cfg, seed)
        D = cfg["hidden_size"]
        for i in range(cfg["num_hidden_layers"]):
            p = f"model.layers.{i}.self_attn."
            w[p + "q_norm.weight"] = (
                1.0 + rng.standard_normal(D) * 0.05
            ).astype(np.float32)
            w[p + "k_norm.weight"] = (
                1.0 + rng.standard_normal(D) * 0.05
            ).astype(np.float32)
        return w

    def test_generate_with_flat_qk_norms(self):
        from mlx_vlm_tpu.generate.ar import generate_step

        cfg = tiny_qwen2_moe_config(attention_bias=False)
        cfg["model_type"] = "olmoe"
        # flat norms need n_kv == n_heads * head_dim shapes; tiny cfg uses
        # n_kv_heads == n_heads here so q/k norm dims both equal hidden
        cfg["num_key_value_heads"] = cfg["num_attention_heads"]
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(IDS))
        toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=4)]
        assert len(toks) == 4

    def test_flat_norm_differs_from_identity(self):
        cfg = tiny_qwen2_moe_config(attention_bias=False)
        cfg["model_type"] = "olmoe"
        cfg["num_key_value_heads"] = cfg["num_attention_heads"]
        w = self._weights(cfg)
        m = load_model_from_weights(cfg, dict(w), jnp.float32)
        # identity norms -> same as raw projections
        for k in list(w):
            if "q_norm" in k or "k_norm" in k:
                w[k] = np.ones_like(w[k])
        m_id = load_model_from_weights(cfg, w, jnp.float32)
        assert not np.allclose(_logits(m, IDS), _logits(m_id, IDS))


class TestGraniteMoe:
    def test_fused_split_matches_qwen2_moe(self):
        cfg = tiny_qwen2_moe_config(norm_topk_prob=True, attention_bias=False)
        w = _moe_weights_no_shared(cfg)
        ref = load_model_from_weights(cfg, dict(w), jnp.float32)

        gw = {}
        E = cfg["num_experts"]
        for i in range(cfg["num_hidden_layers"]):
            p = f"model.layers.{i}."
            gate = np.stack(
                [w.pop(p + f"mlp.experts.{e}.gate_proj.weight") for e in range(E)]
            )
            up = np.stack(
                [w.pop(p + f"mlp.experts.{e}.up_proj.weight") for e in range(E)]
            )
            down = np.stack(
                [w.pop(p + f"mlp.experts.{e}.down_proj.weight") for e in range(E)]
            )
            gw[p + "block_sparse_moe.input_linear.weight"] = np.concatenate(
                [gate, up], axis=1
            )
            gw[p + "block_sparse_moe.output_linear.weight"] = down
            gw[p + "block_sparse_moe.router.layer.weight"] = w.pop(
                p + "mlp.gate.weight"
            )
        gw.update(w)
        gcfg = dict(cfg)
        gcfg["model_type"] = "granitemoe"
        gcfg["num_local_experts"] = E
        gcfg["tie_word_embeddings"] = False
        m = load_model_from_weights(gcfg, gw, jnp.float32)
        np.testing.assert_allclose(_logits(m, IDS), _logits(ref, IDS), atol=1e-5)

    def test_multipliers_change_logits(self):
        cfg = tiny_qwen2_moe_config(norm_topk_prob=True, attention_bias=False)
        cfg["model_type"] = "granitemoe"
        cfg["num_local_experts"] = cfg["num_experts"]
        cfg["tie_word_embeddings"] = False
        w = _moe_weights_no_shared(cfg)
        base = load_model_from_weights(cfg, dict(w), jnp.float32)
        scaled_cfg = dict(cfg, logits_scaling=4.0)
        scaled = load_model_from_weights(scaled_cfg, dict(w), jnp.float32)
        np.testing.assert_allclose(
            _logits(scaled, IDS) * 4.0, _logits(base, IDS), atol=1e-5
        )


class TestPhiMoe:
    def _weights(self, cfg, seed=0):
        rng = np.random.default_rng(seed + 5)
        w = _moe_weights_no_shared(cfg, seed)
        D = cfg["hidden_size"]
        V = cfg["vocab_size"]
        nh = cfg["num_attention_heads"]
        hd = D // nh
        nkv = cfg["num_key_value_heads"]

        def rand(*shape):
            return (rng.standard_normal(shape) * 0.05).astype(np.float32)

        # rename expert keys to phimoe's w1/w3/w2 + block_sparse_moe
        ren = {"gate_proj": "w1", "up_proj": "w3", "down_proj": "w2"}
        out = {}
        for k, v in w.items():
            if ".mlp.experts." in k:
                for new, old in ren.items():
                    k = k.replace(f".{new}.", f".{old}.")
                k = k.replace(".mlp.experts.", ".block_sparse_moe.experts.")
            k = k.replace(".mlp.gate.", ".block_sparse_moe.gate.")
            out[k] = v
        # layernorm biases + attention biases + biased lm_head
        for i in range(cfg["num_hidden_layers"]):
            p = f"model.layers.{i}."
            out[p + "input_layernorm.bias"] = rand(D)
            out[p + "post_attention_layernorm.bias"] = rand(D)
            for nm, o in (("q_proj", nh * hd), ("k_proj", nkv * hd),
                          ("v_proj", nkv * hd), ("o_proj", D)):
                out[p + f"self_attn.{nm}.bias"] = rand(o)
        out["model.norm.bias"] = rand(D)
        out["lm_head.weight"] = rand(V, D)
        out["lm_head.bias"] = rand(V)
        return out

    def _cfg(self):
        cfg = tiny_qwen2_moe_config(norm_topk_prob=True, attention_bias=True)
        cfg["model_type"] = "phimoe"
        cfg["num_local_experts"] = cfg["num_experts"]
        cfg["max_position_embeddings"] = 64
        cfg["original_max_position_embeddings"] = 16
        hd = cfg["hidden_size"] // cfg["num_attention_heads"]
        cfg["rope_scaling"] = {
            "type": "longrope",
            "short_factor": [1.0] * (hd // 2),
            "long_factor": [1.5] * (hd // 2),
            "short_mscale": 1.0,
            "long_mscale": 1.2,
        }
        return cfg

    def test_generate_with_su_rope_and_layernorm(self):
        from mlx_vlm_tpu.generate.ar import generate_step

        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        assert m.language_model.rope.attention_scaling == pytest.approx(1.2)
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(IDS))
        toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=4)]
        assert len(toks) == 4

    def test_layernorm_bias_matters(self):
        cfg = self._cfg()
        w = self._weights(cfg)
        m = load_model_from_weights(cfg, dict(w), jnp.float32)
        for k in list(w):
            if "layernorm.bias" in k or k == "model.norm.bias":
                w[k] = np.zeros_like(w[k])
        m0 = load_model_from_weights(cfg, w, jnp.float32)
        assert not np.allclose(_logits(m, IDS), _logits(m0, IDS), atol=1e-5)
