"""Gemma-4 text decoder: role-split hybrid layers, KV-shared tail,
per-layer inputs, proportional rope, optional MoE.

Contract parity: reference mlx_vlm/models/gemma4_text/ — layer pattern and
KV sharing (language.py:371), per-type head dims + scale 1.0 + v-norm
(language.py:121), double-wide GeGLU shared MLP (language.py:44), softcap
tied head, Router/Experts (language.py:62/98).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step, make_cache
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_gemma4_config(**over):
    cfg = {
        "model_type": "gemma4_text",
        "hidden_size": 32,
        "num_hidden_layers": 6,
        "intermediate_size": 64,
        "num_attention_heads": 2,
        "head_dim": 8,
        "global_head_dim": 16,
        "num_key_value_heads": 1,
        "num_kv_shared_layers": 3,
        "hidden_size_per_layer_input": 4,
        "vocab_size": 128,
        "vocab_size_per_layer_input": 128,
        "sliding_window": 4,
        "sliding_window_pattern": 3,
        "final_logit_softcapping": 30.0,
        "use_double_wide_mlp": True,
        "tie_word_embeddings": True,
    }
    cfg.update(over)
    return cfg


def tiny_gemma4_weights(cfg, seed=0, scale=0.08):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    D = cfg["hidden_size"]
    L = cfg["num_hidden_layers"]
    Dp = cfg["hidden_size_per_layer_input"]
    V = cfg["vocab_size"]
    nh, nkv = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    hd, hdg = cfg["head_dim"], cfg["global_head_dim"]
    p = cfg["sliding_window_pattern"]
    concrete = L - cfg["num_kv_shared_layers"]
    I = cfg["intermediate_size"]
    moe = cfg.get("enable_moe_block")
    w = {
        "model.embed_tokens.weight": rand(V, D),
        "model.embed_tokens_per_layer.weight": rand(V, L * Dp),
        "model.per_layer_model_projection.weight": rand(L * Dp, D),
        "model.per_layer_projection_norm.weight": np.ones(Dp, np.float32),
        "model.norm.weight": np.ones(D, np.float32),
    }
    for i in range(L):
        is_full = (i % p) == (p - 1)
        has_kv = i < concrete
        dwide = cfg["use_double_wide_mlp"] and not has_kv
        Ii = I * (2 if dwide else 1)
        d = hdg if is_full else hd
        q = f"model.layers.{i}."
        for nm in ("input_layernorm", "post_attention_layernorm",
                   "pre_feedforward_layernorm",
                   "post_feedforward_layernorm"):
            w[q + nm + ".weight"] = np.ones(D, np.float32)
        w[q + "self_attn.q_proj.weight"] = rand(nh * d, D)
        w[q + "self_attn.o_proj.weight"] = rand(D, nh * d)
        w[q + "self_attn.q_norm.weight"] = np.ones(d, np.float32)
        if has_kv:
            w[q + "self_attn.k_proj.weight"] = rand(nkv * d, D)
            w[q + "self_attn.v_proj.weight"] = rand(nkv * d, D)
            w[q + "self_attn.k_norm.weight"] = np.ones(d, np.float32)
        if moe:
            w[q + "router.proj.weight"] = rand(cfg["num_experts"], D)
            w[q + "router.scale"] = np.ones(D, np.float32)
            w[q + "router.per_expert_scale"] = np.ones(
                cfg["num_experts"], np.float32)
            for nm in ("post_feedforward_layernorm_1",
                       "post_feedforward_layernorm_2",
                       "pre_feedforward_layernorm_2"):
                w[q + nm + ".weight"] = np.ones(D, np.float32)
            E, Im = cfg["num_experts"], cfg["moe_intermediate_size"]
            w[q + "experts.switch_glu.gate_proj.weight"] = rand(E, Im, D)
            w[q + "experts.switch_glu.up_proj.weight"] = rand(E, Im, D)
            w[q + "experts.switch_glu.down_proj.weight"] = rand(E, D, Im)
        w[q + "mlp.gate_proj.weight"] = rand(Ii, D)
        w[q + "mlp.up_proj.weight"] = rand(Ii, D)
        w[q + "mlp.down_proj.weight"] = rand(D, Ii)
        w[q + "per_layer_input_gate.weight"] = rand(Dp, D)
        w[q + "per_layer_projection.weight"] = rand(D, Dp)
        w[q + "post_per_layer_input_norm.weight"] = np.ones(D, np.float32)
        w[q + "layer_scalar"] = np.ones(1, np.float32)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_gemma4_config()
    return load_model_from_weights(cfg, tiny_gemma4_weights(cfg),
                                   jnp.float32)


class TestStructure:
    def test_role_split(self, model):
        lm = model.params["language_model"]["model"]
        assert lm["sliding_layers"]["self_attn"]["q_proj"][
            "weight"].shape[0] == 2
        assert lm["full_layers"]["self_attn"]["q_proj"][
            "weight"].shape[0] == 1
        assert lm["shared_sliding_layers"]["self_attn"]["q_proj"][
            "weight"].shape[0] == 2
        # shared layers carry no k/v projections
        assert "k_proj" not in lm["shared_sliding_layers"]["self_attn"]
        # double-wide MLP on the shared tail
        assert (lm["shared_full_layers"]["mlp"]["gate_proj"]["weight"]
                .shape[-2] == 128)

    def test_rope_types(self, model):
        lm = model.language_model
        # global rope: proportional partial 0.25 -> 3/4 of inv freqs zero
        inv = np.asarray(lm.rope_f.inv_freq)
        assert (inv == 0).sum() == inv.size - int(0.25 * 16 // 2)
        assert (np.asarray(lm.rope_s.inv_freq) > 0).all()


class TestForward:
    def test_cached_matches_cachefree(self, model):
        S = 6
        ids = (np.arange(S, dtype=np.int32) * 7 % 120)[None]
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S)).copy()
        emb = model.get_input_embeddings(model.params, jnp.asarray(ids))
        lg_nc, _ = model(model.params, emb, None, jnp.asarray(pos))
        cache = make_cache(model, 1, 32, jnp.float32)
        lg_c, _ = model(model.params, emb, cache, jnp.asarray(pos))
        np.testing.assert_allclose(np.asarray(lg_nc), np.asarray(lg_c),
                                   rtol=2e-4, atol=2e-5)

    def test_incremental_decode_matches_full(self, model):
        S = 5
        ids = (np.arange(S, dtype=np.int32) * 3 % 120)[None]
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S)).copy()
        emb = model.get_input_embeddings(model.params, jnp.asarray(ids))
        cache = make_cache(model, 1, 32, jnp.float32)
        lg_full, _ = model(model.params, emb, cache, jnp.asarray(pos))

        cache2 = make_cache(model, 1, 32, jnp.float32)
        outs = []
        for t in range(S):
            pt = np.broadcast_to(np.asarray([t], np.int32), (3, 1, 1)).copy()
            lg, cache2 = model(model.params, emb[:, t:t + 1], cache2,
                               jnp.asarray(pt))
            outs.append(np.asarray(lg[0, 0]))
        for t in range(S):
            np.testing.assert_allclose(outs[t], np.asarray(lg_full[0, t]),
                                       rtol=3e-4, atol=3e-5)

    def test_softcap_bounds_logits(self, model):
        ids = jnp.asarray([[5, 9]], jnp.int32)
        pos = np.broadcast_to(np.arange(2, dtype=np.int32), (3, 1, 2)).copy()
        emb = model.get_input_embeddings(model.params, ids)
        lg, _ = model(model.params, emb, None, jnp.asarray(pos))
        assert np.abs(np.asarray(lg)).max() <= 30.0

    def test_greedy_generation(self, model):
        ids = (np.arange(7, dtype=np.int32) + 2)[None]
        emb = jax.jit(model.get_input_embeddings)(model.params,
                                                  jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(emb, model,
                                                    max_tokens=5)]
        toks2 = [int(t[0]) for t, _ in generate_step(emb, model,
                                                     max_tokens=5)]
        assert toks == toks2 and len(toks) == 5


class TestMoE:
    def test_moe_forward(self):
        cfg = tiny_gemma4_config(
            enable_moe_block=True, num_experts=4, top_k_experts=2,
            moe_intermediate_size=16)
        model = load_model_from_weights(cfg, tiny_gemma4_weights(cfg, 3),
                                        jnp.float32)
        ids = (np.arange(5, dtype=np.int32) + 1)[None]
        pos = np.broadcast_to(np.arange(5, dtype=np.int32), (3, 1, 5)).copy()
        emb = model.get_input_embeddings(model.params, jnp.asarray(ids))
        lg, _ = model(model.params, emb, None, jnp.asarray(pos))
        assert np.isfinite(np.asarray(lg)).all()
        # cached parity holds with the MoE branch too
        cache = make_cache(model, 1, 16, jnp.float32)
        lg_c, _ = model(model.params, emb, cache, jnp.asarray(pos))
        np.testing.assert_allclose(np.asarray(lg), np.asarray(lg_c),
                                   rtol=2e-4, atol=2e-5)
