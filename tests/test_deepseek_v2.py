import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_dsv2_config():
    return {
        "model_type": "deepseek_v2",
        "vocab_size": 256,
        "hidden_size": 64,
        "intermediate_size": 128,
        "moe_intermediate_size": 32,
        "num_hidden_layers": 3,
        "num_attention_heads": 4,
        "n_routed_experts": 4,
        "n_shared_experts": 1,
        "num_experts_per_tok": 2,
        "first_k_dense_replace": 1,
        "kv_lora_rank": 16,
        "q_lora_rank": 24,
        "qk_rope_head_dim": 8,
        "qk_nope_head_dim": 16,
        "v_head_dim": 16,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
    }


def tiny_dsv2_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    D = cfg["hidden_size"]
    nh = cfg["num_attention_heads"]
    dn, dpe, dv, r = (cfg["qk_nope_head_dim"], cfg["qk_rope_head_dim"],
                      cfg["v_head_dim"], cfg["kv_lora_rank"])
    qd = dn + dpe
    w = {
        "model.embed_tokens.weight": rand(cfg["vocab_size"], D),
        "model.norm.weight": np.ones(D, np.float32),
        "lm_head.weight": rand(cfg["vocab_size"], D),
    }
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.q_a_proj.weight"] = rand(cfg["q_lora_rank"], D)
        w[p + "self_attn.q_a_layernorm.weight"] = np.ones(cfg["q_lora_rank"], np.float32)
        w[p + "self_attn.q_b_proj.weight"] = rand(nh * qd, cfg["q_lora_rank"])
        w[p + "self_attn.kv_a_proj_with_mqa.weight"] = rand(r + dpe, D)
        w[p + "self_attn.kv_a_layernorm.weight"] = np.ones(r, np.float32)
        w[p + "self_attn.kv_b_proj.weight"] = rand(nh * (dn + dv), r)
        w[p + "self_attn.o_proj.weight"] = rand(D, nh * dv)
        if i < cfg["first_k_dense_replace"]:
            w[p + "mlp.gate_proj.weight"] = rand(cfg["intermediate_size"], D)
            w[p + "mlp.up_proj.weight"] = rand(cfg["intermediate_size"], D)
            w[p + "mlp.down_proj.weight"] = rand(D, cfg["intermediate_size"])
        else:
            Im = cfg["moe_intermediate_size"]
            w[p + "mlp.gate.weight"] = rand(cfg["n_routed_experts"], D)
            for e in range(cfg["n_routed_experts"]):
                w[p + f"mlp.experts.{e}.gate_proj.weight"] = rand(Im, D)
                w[p + f"mlp.experts.{e}.up_proj.weight"] = rand(Im, D)
                w[p + f"mlp.experts.{e}.down_proj.weight"] = rand(D, Im)
            Is = Im * cfg["n_shared_experts"]
            w[p + "mlp.shared_experts.gate_proj.weight"] = rand(Is, D)
            w[p + "mlp.shared_experts.up_proj.weight"] = rand(Is, D)
            w[p + "mlp.shared_experts.down_proj.weight"] = rand(D, Is)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_dsv2_config()
    return load_model_from_weights(cfg, tiny_dsv2_weights(cfg), jnp.float32)


class TestDeepseekV2:
    def test_latent_cache_shapes(self, model):
        cache = model.language_model.init_cache(1, 16, jnp.float32)
        assert cache.c.shape == (3, 1, 16, 16)  # [L, B, C, r]
        assert cache.kpe.shape == (3, 1, 16, 8)

    def test_generate(self, model):
        ids = (np.arange(8, dtype=np.int32) % 200)[None]
        embeds = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=4)]
        assert len(toks) == 4

    def test_incremental_matches_full(self, model):
        """MLA latent cache + absorbed decode must equal full forward."""
        S = 7
        ids = (np.arange(S, dtype=np.int32) * 3 % 200)[None]
        embeds = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S))
        cache = model.language_model.init_cache(1, 16, jnp.float32)
        full, _ = model(model.params, embeds, cache, jnp.asarray(pos))
        cache = model.language_model.init_cache(1, 16, jnp.float32)
        outs = []
        for t in range(S):
            lt, cache = model(
                model.params, embeds[:, t : t + 1], cache,
                jnp.asarray(pos[:, :, t : t + 1]),
            )
            outs.append(np.asarray(lt)[:, 0])
        np.testing.assert_allclose(
            np.asarray(full), np.stack(outs, 1), atol=3e-4, rtol=1e-3
        )

    def test_expert_stacking(self, model):
        moe = model.params["language_model"]["model"]["layers"]["1"]["mlp"]
        assert moe["experts"]["gate_proj"]["weight"].shape == (4, 32, 64)


class TestDeepseekV3Routing:
    def test_group_expert_select_matches_reference(self):
        """noaux_tc: bias steers SELECTION, weights come from raw sigmoid."""
        from mlx_vlm_tpu.core.moe import group_expert_select

        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.standard_normal((6, 8)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal(8), jnp.float32)
        idx, wts = group_expert_select(logits, bias, 2, 4, 2, 1.5, True)
        scores = 1 / (1 + np.exp(-np.asarray(logits)))
        sel = scores + np.asarray(bias)
        g = sel.reshape(6, 4, 2)
        gs = np.sort(g, -1)[..., -2:].sum(-1)
        mask = np.zeros((6, 4), bool)
        for r in range(6):
            mask[r, np.argsort(-gs[r])[:2]] = True
        sel2 = np.where(mask[..., None], g, 0).reshape(6, 8)
        ref_idx = np.sort(np.argsort(-sel2, -1)[:, :2], -1)
        np.testing.assert_array_equal(np.sort(np.asarray(idx), -1), ref_idx)
        ref_w = np.take_along_axis(scores, np.asarray(idx), -1)
        ref_w = ref_w / ref_w.sum(-1, keepdims=True) * 1.5
        np.testing.assert_allclose(np.asarray(wts), ref_w, atol=1e-6)

    def test_v3_model_generates(self):
        cfg = tiny_dsv2_config()
        cfg["model_type"] = "deepseek_v3"
        cfg["topk_method"] = "noaux_tc"
        cfg["n_group"] = 2
        cfg["topk_group"] = 1
        cfg["norm_topk_prob"] = True
        w = tiny_dsv2_weights(cfg)
        for i in range(1, cfg["num_hidden_layers"]):
            w[f"model.layers.{i}.mlp.gate.e_score_correction_bias"] = (
                np.zeros(cfg["n_routed_experts"], np.float32)
            )
        m = load_model_from_weights(cfg, w, jnp.float32)
        ids = (np.arange(7, dtype=np.int32) % 200)[None]
        embeds = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(embeds, m, max_tokens=4)]
        assert len(toks) == 4
