"""Text-family tranche 5b: exaone_moe, afmoe, cohere2_moe, mimo_v2_flash,
nemotron_nas."""

import numpy as np

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights

IDS = (np.arange(7, dtype=np.int32) * 13 % 80)[None]


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


def _expert_weights(prefix, E, MI, D, rand, w):
    for e in range(E):
        w[f"{prefix}.experts.{e}.gate_proj.weight"] = rand(MI, D)
        w[f"{prefix}.experts.{e}.up_proj.weight"] = rand(MI, D)
        w[f"{prefix}.experts.{e}.down_proj.weight"] = rand(D, MI)


class TestExaoneMoE:
    def _cfg(self):
        return {"model_type": "exaone_moe", "vocab_size": 100,
                "hidden_size": 32, "intermediate_size": 64,
                "moe_intermediate_size": 16, "num_hidden_layers": 3,
                "num_attention_heads": 4, "num_key_value_heads": 2,
                "head_dim": 8, "num_experts": 4, "num_experts_per_tok": 2,
                "num_shared_experts": 1, "rms_norm_eps": 1e-5,
                "max_position_embeddings": 256, "sliding_window": 4,
                "layer_types": ["sliding_attention", "full_attention",
                                "sliding_attention"],
                "is_moe_layer": [False, True, True],
                "n_group": 2, "topk_group": 1,
                "routed_scaling_factor": 2.5, "norm_topk_prob": True,
                "rope_theta": 1e6, "tie_word_embeddings": True}

    def _weights(self, cfg, seed=0):
        rand = _rand(np.random.default_rng(seed))
        D, V = cfg["hidden_size"], cfg["vocab_size"]
        hd, nh, nkv = cfg["head_dim"], cfg["num_attention_heads"], \
            cfg["num_key_value_heads"]
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.norm.weight": np.ones(D, np.float32)}
        for i in range(cfg["num_hidden_layers"]):
            p = f"model.layers.{i}."
            w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
            w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
            w[p + "self_attn.q_proj.weight"] = rand(nh * hd, D)
            w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
            w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
            w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
            w[p + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
            w[p + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
            if cfg["is_moe_layer"][i]:
                w[p + "mlp.gate.weight"] = rand(cfg["num_experts"], D)
                w[p + "mlp.gate.e_score_correction_bias"] = rand(
                    cfg["num_experts"])
                _expert_weights(p + "mlp", cfg["num_experts"],
                                cfg["moe_intermediate_size"], D, rand, w)
                w[p + "mlp.shared_experts.gate_proj.weight"] = rand(16, D)
                w[p + "mlp.shared_experts.up_proj.weight"] = rand(16, D)
                w[p + "mlp.shared_experts.down_proj.weight"] = rand(D, 16)
            else:
                w[p + "mlp.gate_proj.weight"] = rand(64, D)
                w[p + "mlp.up_proj.weight"] = rand(64, D)
                w[p + "mlp.down_proj.weight"] = rand(D, 64)
        return w

    def test_generate_and_parity(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        assert len(_gen(m)) == 3
        _chunk_parity(m)

    def test_nope_on_full_layers(self):
        """Full-attention layers skip rope: shifting all positions must
        not change a single-layer full-attn model's output."""
        cfg = self._cfg()
        cfg["num_hidden_layers"] = 1
        cfg["layer_types"] = ["full_attention"]
        cfg["is_moe_layer"] = [False]
        w = {k: v for k, v in self._weights(cfg).items()
             if ".layers.0." in k or "embed" in k or k == "model.norm.weight"}
        m = load_model_from_weights(cfg, w, jnp.float32)
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(IDS))
        S = IDS.shape[1]
        cache = m.language_model.init_cache(1, S, jnp.float32)
        p0 = np.arange(S, dtype=np.int32)[None]
        l0, _ = m(m.params, e, cache, jnp.asarray(p0))
        cache = m.language_model.init_cache(1, S, jnp.float32)
        l1, _ = m(m.params, e, cache, jnp.asarray(p0 + 17))
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-6)


class TestAfmoe:
    def _cfg(self):
        return {"model_type": "afmoe", "vocab_size": 90, "hidden_size": 32,
                "intermediate_size": 64, "moe_intermediate_size": 16,
                "num_hidden_layers": 3, "num_attention_heads": 4,
                "num_key_value_heads": 2, "head_dim": 8,
                "layer_types": ["sliding_attention", "full_attention",
                                "sliding_attention"],
                "num_experts": 4, "num_experts_per_tok": 2,
                "num_shared_experts": 1, "num_dense_layers": 1,
                "route_scale": 2.0, "sliding_window": 4,
                "rms_norm_eps": 1e-5, "mup_enabled": True,
                "max_position_embeddings": 256}

    def _weights(self, cfg, seed=1):
        rand = _rand(np.random.default_rng(seed))
        D, V = cfg["hidden_size"], cfg["vocab_size"]
        hd, nh, nkv = cfg["head_dim"], cfg["num_attention_heads"], \
            cfg["num_key_value_heads"]
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.norm.weight": np.ones(D, np.float32),
             "lm_head.weight": rand(V, D)}
        for i in range(cfg["num_hidden_layers"]):
            p = f"model.layers.{i}."
            for n in ("input_layernorm", "post_attention_layernorm",
                      "pre_mlp_layernorm", "post_mlp_layernorm"):
                w[p + n + ".weight"] = np.ones(D, np.float32)
            w[p + "self_attn.q_proj.weight"] = rand(nh * hd, D)
            w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
            w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
            w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
            w[p + "self_attn.gate_proj.weight"] = rand(nh * hd, D)
            w[p + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
            w[p + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
            if i < cfg["num_dense_layers"]:
                w[p + "mlp.gate_proj.weight"] = rand(64, D)
                w[p + "mlp.up_proj.weight"] = rand(64, D)
                w[p + "mlp.down_proj.weight"] = rand(D, 64)
            else:
                w[p + "mlp.router.gate.weight"] = rand(cfg["num_experts"], D)
                w[p + "mlp.expert_bias"] = rand(cfg["num_experts"])
                _expert_weights(p + "mlp", cfg["num_experts"], 16, D,
                                rand, w)
                w[p + "mlp.shared_experts.gate_proj.weight"] = rand(16, D)
                w[p + "mlp.shared_experts.up_proj.weight"] = rand(16, D)
                w[p + "mlp.shared_experts.down_proj.weight"] = rand(D, 16)
        return w

    def test_generate_and_parity(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        assert len(_gen(m)) == 3
        _chunk_parity(m)


class TestCohere2MoE:
    def _cfg(self):
        return {"model_type": "cohere2_moe", "vocab_size": 100,
                "hidden_size": 32, "head_dim": 8, "num_hidden_layers": 3,
                "intermediate_size": 16, "num_attention_heads": 4,
                "num_key_value_heads": 2, "rope_theta": 50000.0,
                "layer_norm_eps": 1e-5, "logit_scale": 0.0625,
                "sliding_window": 4, "sliding_window_pattern": 2,
                "num_experts": 4, "num_experts_per_tok": 2,
                "norm_topk_prob": True, "moe_num_shared_experts": 2,
                "moe_gate_act": "sigmoid",
                "shared_expert_combination_strategy": "average",
                "first_k_dense_replace": 1}

    def _weights(self, cfg, seed=2):
        rand = _rand(np.random.default_rng(seed))
        D, V = cfg["hidden_size"], cfg["vocab_size"]
        hd, nh, nkv = cfg["head_dim"], cfg["num_attention_heads"], \
            cfg["num_key_value_heads"]
        I = cfg["intermediate_size"]
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.norm.weight": np.ones(D, np.float32)}
        for i in range(cfg["num_hidden_layers"]):
            p = f"model.layers.{i}."
            w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
            w[p + "self_attn.q_proj.weight"] = rand(nh * hd, D)
            w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
            w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
            w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
            if i < cfg["first_k_dense_replace"]:
                w[p + "mlp.gate_proj.weight"] = rand(I, D)
                w[p + "mlp.up_proj.weight"] = rand(I, D)
                w[p + "mlp.down_proj.weight"] = rand(D, I)
            else:
                w[p + "mlp.gate.weight"] = rand(cfg["num_experts"], D)
                _expert_weights(p + "mlp", cfg["num_experts"], I, D,
                                rand, w)
                sh = I * cfg["moe_num_shared_experts"]
                w[p + "mlp.shared_experts.gate_proj.weight"] = rand(sh, D)
                w[p + "mlp.shared_experts.up_proj.weight"] = rand(sh, D)
                w[p + "mlp.shared_experts.down_proj.weight"] = rand(D, sh)
        return w

    def test_generate_and_parity(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        assert len(_gen(m)) == 3
        _chunk_parity(m)

    def test_logit_scale(self):
        cfg = self._cfg()
        w = self._weights(cfg)
        m1 = load_model_from_weights(dict(cfg), dict(w), jnp.float32)
        cfg2 = dict(cfg, logit_scale=0.125)
        m2 = load_model_from_weights(cfg2, dict(w), jnp.float32)
        e = jax.jit(m1.get_input_embeddings)(m1.params, jnp.asarray(IDS))
        S = IDS.shape[1]
        pos = jnp.asarray(np.arange(S, dtype=np.int32)[None])
        c1 = m1.language_model.init_cache(1, S, jnp.float32)
        c2 = m2.language_model.init_cache(1, S, jnp.float32)
        l1, _ = m1(m1.params, e, c1, pos)
        l2, _ = m2(m2.params, e, c2, pos)
        np.testing.assert_allclose(np.asarray(l1) * 2, np.asarray(l2),
                                   atol=1e-5)


class TestMimoV2Flash:
    def _cfg(self):
        return {"model_type": "mimo_v2_flash", "vocab_size": 100,
                "hidden_size": 32, "intermediate_size": 48,
                "moe_intermediate_size": 16, "num_hidden_layers": 3,
                "num_attention_heads": 4, "num_key_value_heads": 2,
                "head_dim": 8, "v_head_dim": 8,
                "swa_num_attention_heads": 2, "swa_num_key_value_heads": 1,
                "swa_head_dim": 16, "swa_v_head_dim": 8,
                "hybrid_layer_pattern": [1, 0, 1],
                "moe_layer_freq": [0, 1, 1],
                "add_swa_attention_sink_bias": True,
                "add_full_attention_sink_bias": False,
                "sliding_window_size": 4, "n_shared_experts": 1,
                "n_routed_experts": 4, "num_experts_per_tok": 2,
                "routed_scaling_factor": 2.0, "topk_method": "noaux_tc",
                "scoring_func": "sigmoid", "norm_topk_prob": True,
                "n_group": 1, "topk_group": 1,
                "max_position_embeddings": 256,
                "layernorm_epsilon": 1e-6, "rope_theta": 640000.0,
                "swa_rope_theta": 10000.0, "partial_rotary_factor": 0.5}

    def _weights(self, cfg, seed=3):
        rand = _rand(np.random.default_rng(seed))
        D, V = cfg["hidden_size"], cfg["vocab_size"]
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.norm.weight": np.ones(D, np.float32),
             "lm_head.weight": rand(V, D)}
        for i in range(cfg["num_hidden_layers"]):
            p = f"model.layers.{i}."
            sliding = cfg["hybrid_layer_pattern"][i] == 1
            nh = cfg["swa_num_attention_heads"] if sliding else \
                cfg["num_attention_heads"]
            nkv = cfg["swa_num_key_value_heads"] if sliding else \
                cfg["num_key_value_heads"]
            hd = cfg["swa_head_dim"] if sliding else cfg["head_dim"]
            vd = cfg["swa_v_head_dim"] if sliding else cfg["v_head_dim"]
            w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
            w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
            w[p + "self_attn.q_proj.weight"] = rand(nh * hd, D)
            w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
            w[p + "self_attn.v_proj.weight"] = rand(nkv * vd, D)
            w[p + "self_attn.o_proj.weight"] = rand(D, nh * vd)
            if sliding and cfg["add_swa_attention_sink_bias"]:
                w[p + "self_attn.attention_sink_bias"] = np.ones(
                    nh, np.float32)
            if cfg["moe_layer_freq"][i] == 1:
                w[p + "mlp.gate.weight"] = rand(cfg["n_routed_experts"], D)
                w[p + "mlp.gate.e_score_correction_bias"] = rand(
                    cfg["n_routed_experts"])
                _expert_weights(p + "mlp", cfg["n_routed_experts"], 16, D,
                                rand, w)
                w[p + "mlp.shared_experts.gate_proj.weight"] = rand(16, D)
                w[p + "mlp.shared_experts.up_proj.weight"] = rand(16, D)
                w[p + "mlp.shared_experts.down_proj.weight"] = rand(D, 16)
            else:
                w[p + "mlp.gate_proj.weight"] = rand(48, D)
                w[p + "mlp.up_proj.weight"] = rand(48, D)
                w[p + "mlp.down_proj.weight"] = rand(D, 48)
        return w

    def test_generate_and_parity(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        assert len(_gen(m)) == 3
        _chunk_parity(m)

    def test_sinks_change_output(self):
        cfg = self._cfg()
        w = self._weights(cfg)
        m1 = load_model_from_weights(dict(cfg), dict(w), jnp.float32)
        w2 = dict(w)
        w2["model.layers.0.self_attn.attention_sink_bias"] = np.full(
            2, 25.0, np.float32)
        m2 = load_model_from_weights(dict(cfg), w2, jnp.float32)
        e = jax.jit(m1.get_input_embeddings)(m1.params, jnp.asarray(IDS))
        S = IDS.shape[1]
        pos = jnp.asarray(np.arange(S, dtype=np.int32)[None])
        c1 = m1.language_model.init_cache(1, S, jnp.float32)
        c2 = m2.language_model.init_cache(1, S, jnp.float32)
        l1, _ = m1(m1.params, e, c1, pos)
        l2, _ = m2(m2.params, e, c2, pos)
        assert np.abs(np.asarray(l1) - np.asarray(l2)).max() > 1e-5


class TestNemotronNAS:
    def _cfg(self):
        blocks = [
            {"attention": {"n_heads_in_group": 2}, "ffn": {"ffn_mult": 1.0}},
            {"attention": {"no_op": True}, "ffn": {"ffn_mult": 2.0}},
            {"attention": {"replace_with_linear": True},
             "ffn": {"no_op": True}},
            {"attention": {"n_heads_in_group": 4},
             "ffn": {"replace_with_linear": True}},
        ]
        return {"model_type": "nemotron-nas", "hidden_size": 32,
                "num_hidden_layers": 4, "num_attention_heads": 4,
                "rms_norm_eps": 1e-5, "vocab_size": 90,
                "block_configs": blocks, "rope_theta": 500000.0,
                "max_position_embeddings": 256}

    def _weights(self, cfg, seed=4):
        from mlx_vlm_tpu.models.nemotron_nas import (
            ffn_mult_to_intermediate_size)
        rand = _rand(np.random.default_rng(seed))
        D, V = cfg["hidden_size"], cfg["vocab_size"]
        hd = D // cfg["num_attention_heads"]
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.norm.weight": np.ones(D, np.float32),
             "lm_head.weight": rand(V, D)}
        for i, bc in enumerate(cfg["block_configs"]):
            p = f"model.layers.{i}."
            ac, fc = bc["attention"], bc["ffn"]
            if not ac.get("no_op"):
                w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
                if ac.get("replace_with_linear"):
                    w[p + "self_attn.linear_attn.weight"] = rand(D, D)
                else:
                    nkv = cfg["num_attention_heads"] // ac["n_heads_in_group"]
                    w[p + "self_attn.q_proj.weight"] = rand(D, D)
                    w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
                    w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
                    w[p + "self_attn.o_proj.weight"] = rand(D, D)
            if not fc.get("no_op"):
                w[p + "post_attention_layernorm.weight"] = np.ones(
                    D, np.float32)
                if fc.get("replace_with_linear"):
                    w[p + "mlp.linear_mlp.weight"] = rand(D, D)
                else:
                    I = ffn_mult_to_intermediate_size(fc["ffn_mult"], D)
                    w[p + "mlp.gate_proj.weight"] = rand(I, D)
                    w[p + "mlp.up_proj.weight"] = rand(I, D)
                    w[p + "mlp.down_proj.weight"] = rand(D, I)
        return w

    def test_generate_and_parity(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        assert len(_gen(m)) == 3
        _chunk_parity(m)
