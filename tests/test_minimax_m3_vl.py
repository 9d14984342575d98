"""MiniMax M3 VL: block-sparse indexer, sigmoid MoE, clipped SwiGLU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_minimax_config(**text_overrides):
    text = {
        "model_type": "minimax_m3",
        "hidden_size": 32,
        "intermediate_size": 16,
        "dense_intermediate_size": 64,
        "shared_intermediate_size": 16,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "head_dim": 8,
        "num_hidden_layers": 4,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
        "vocab_size": 256,
        "num_local_experts": 4,
        "num_experts_per_tok": 2,
        "n_shared_experts": 1,
        "routed_scaling_factor": 2.0,
        "mlp_layer_types": ["dense", "sparse", "sparse", "sparse"],
        "layer_types": [
            "minimax_m3_dense",
            "minimax_m3_sparse",
            "minimax_m3_sparse",
            "minimax_m3_sparse",
        ],
        "index_n_heads": 2,
        "index_head_dim": 8,
        "index_block_size": 8,
        "index_topk_blocks": 2,
        "index_local_blocks": 1,
    }
    text.update(text_overrides)
    return {
        "model_type": "minimax_m3_vl",
        "image_token_index": 64,
        "video_token_index": 65,
        "vision_feature_layer": -1,
        "vision_feature_select_strategy": "full",
        "projector_hidden_size": 24,
        "projector_hidden_act": "gelu",
        "multimodal_projector_bias": True,
        "patch_merge_bias": True,
        "text_config": text,
        "vision_config": {
            "model_type": "minimax_m3_vl",
            "hidden_size": 16,
            "num_attention_heads": 2,
            "num_hidden_layers": 2,
            "intermediate_size": 32,
            "patch_size": 14,
            "temporal_patch_size": 1,
            "spatial_merge_size": 2,
        },
    }


def tiny_minimax_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tc, vc = cfg["text_config"], cfg["vision_config"]
    D = tc["hidden_size"]
    H, KV, hd = tc["num_attention_heads"], tc["num_key_value_heads"], tc["head_dim"]
    Hi, Di = tc["index_n_heads"], tc["index_head_dim"]
    E, I = tc["num_local_experts"], tc["intermediate_size"]
    V = tc["vocab_size"]
    w = {}
    lp = "model.language_model.model."
    w[lp + "embed_tokens.weight"] = rand(V, D)
    w[lp + "norm.weight"] = np.zeros(D, np.float32)  # gemma norm: stored w-1
    w["lm_head.weight"] = rand(V, D)
    for i, kind in enumerate(tc["mlp_layer_types"]):
        p = lp + f"layers.{i}."
        w[p + "input_layernorm.weight"] = np.zeros(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.zeros(D, np.float32)
        w[p + "self_attn.q_proj.weight"] = rand(H * hd, D)
        w[p + "self_attn.k_proj.weight"] = rand(KV * hd, D)
        w[p + "self_attn.v_proj.weight"] = rand(KV * hd, D)
        w[p + "self_attn.o_proj.weight"] = rand(D, H * hd)
        w[p + "self_attn.q_norm.weight"] = np.zeros(hd, np.float32)
        w[p + "self_attn.k_norm.weight"] = np.zeros(hd, np.float32)
        if kind == "dense":
            di = tc["dense_intermediate_size"]
            w[p + "mlp.gate_proj.weight"] = rand(di, D)
            w[p + "mlp.up_proj.weight"] = rand(di, D)
            w[p + "mlp.down_proj.weight"] = rand(D, di)
            continue
        w[p + "self_attn.index_q_proj.weight"] = rand(Hi * Di, D)
        w[p + "self_attn.index_k_proj.weight"] = rand(Di, D)
        w[p + "self_attn.index_q_norm.weight"] = np.zeros(Di, np.float32)
        w[p + "self_attn.index_k_norm.weight"] = np.zeros(Di, np.float32)
        bp = p + "block_sparse_moe."
        w[bp + "gate.weight"] = rand(E, D)
        w[bp + "e_score_correction_bias"] = np.zeros(E, np.float32)
        for e in range(E):
            w[bp + f"experts.{e}.w1.weight"] = rand(I, D)
            w[bp + f"experts.{e}.w3.weight"] = rand(I, D)
            w[bp + f"experts.{e}.w2.weight"] = rand(D, I)
        w[bp + "shared_experts.gate_proj.weight"] = rand(I, D)
        w[bp + "shared_experts.up_proj.weight"] = rand(I, D)
        w[bp + "shared_experts.down_proj.weight"] = rand(D, I)
    # vision
    Ev, P = vc["hidden_size"], vc["patch_size"]
    vp = "model.vision_tower.vision_model."
    w[vp + "embeddings.patch_embedding.weight"] = rand(Ev, 3, 1, P, P)
    w[vp + "pre_layrnorm.weight"] = np.ones(Ev, np.float32)
    w[vp + "pre_layrnorm.bias"] = np.zeros(Ev, np.float32)
    for i in range(vc["num_hidden_layers"]):
        q = vp + f"encoder.layers.{i}."
        for n in ("layer_norm1", "layer_norm2"):
            w[q + n + ".weight"] = np.ones(Ev, np.float32)
            w[q + n + ".bias"] = np.zeros(Ev, np.float32)
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            w[q + f"self_attn.{n}.weight"] = rand(Ev, Ev)
            w[q + f"self_attn.{n}.bias"] = rand(Ev)
        w[q + "mlp.fc1.weight"] = rand(vc["intermediate_size"], Ev)
        w[q + "mlp.fc1.bias"] = rand(vc["intermediate_size"])
        w[q + "mlp.fc2.weight"] = rand(Ev, vc["intermediate_size"])
        w[q + "mlp.fc2.bias"] = rand(Ev)
    ph = cfg["projector_hidden_size"]
    w["model.multi_modal_projector.linear_1.weight"] = rand(ph, Ev)
    w["model.multi_modal_projector.linear_1.bias"] = rand(ph)
    w["model.multi_modal_projector.linear_2.weight"] = rand(D, ph)
    w["model.multi_modal_projector.linear_2.bias"] = rand(D)
    w["model.patch_merge_mlp.linear_1.weight"] = rand(D, D * 4)
    w["model.patch_merge_mlp.linear_1.bias"] = rand(D)
    w["model.patch_merge_mlp.linear_2.weight"] = rand(D, D)
    w["model.patch_merge_mlp.linear_2.bias"] = rand(D)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_minimax_config()
    return load_model_from_weights(cfg, tiny_minimax_weights(cfg), jnp.float32)


class TestPrimitives:
    def test_swiglu_oai_formula(self):
        from mlx_vlm_tpu.models.minimax_m3_vl.language import swiglu_oai

        g = jnp.asarray([-1.0, 0.5, 9.0])
        u = jnp.asarray([8.0, -9.0, 1.0])
        got = np.asarray(swiglu_oai(g, u, 1.702, 7.0, 1.0))
        gc = np.minimum(np.asarray(g), 7.0)
        uc = np.clip(np.asarray(u), -7.0, 7.0)
        want = gc * (1 / (1 + np.exp(-1.702 * gc))) * (uc + 1.0)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_router_bias_affects_selection_not_weights(self):
        from mlx_vlm_tpu.models.minimax_m3_vl.language import minimax_router

        x = jnp.ones((1, 4))
        gate_w = jnp.asarray(
            np.diag([1.0, 0.9, 0.8, 0.7]).astype(np.float32)
        )
        bias = jnp.asarray([0.0, 0.0, 10.0, 10.0])
        inds, wts = minimax_router(x, gate_w, bias, 2, 2.0, "sigmoid")
        assert set(np.asarray(inds)[0].tolist()) == {2, 3}
        s = 1 / (1 + np.exp(-np.asarray([0.8, 0.7])))
        want = s / (s.sum() + 1e-20) * 2.0
        np.testing.assert_allclose(
            sorted(np.asarray(wts)[0].tolist(), reverse=True),
            sorted(want.tolist(), reverse=True),
            rtol=1e-4,
        )


class TestSparseSelection:
    def test_dense_equivalence_when_few_blocks(self, model):
        """With <= topk valid blocks the sparse mask equals causal."""
        lm = model.language_model
        lmp = model.params["language_model"]
        ids = np.asarray([[1, 5, 9, 13, 2]], np.int32)
        emb = lm.embed(lmp, jnp.asarray(ids))
        pos = jnp.broadcast_to(jnp.arange(5, dtype=jnp.int32), (1, 5))
        # capacity 16 = bs*topk -> sparse path disabled (dense reference)
        c_small = lm.init_cache(1, 16, jnp.float32)
        h_dense, _ = lm(lmp, emb, c_small, pos)
        # capacity 32 > threshold -> sparse mask active, but only 1 valid
        # block -> identical output on the first 5 tokens
        c_big = lm.init_cache(1, 32, jnp.float32)
        h_sparse, _ = lm(lmp, emb, c_big, pos)
        np.testing.assert_allclose(
            np.asarray(h_dense), np.asarray(h_sparse), atol=1e-5
        )

    def test_selection_drops_low_scoring_blocks(self, model):
        """Long context: only topk + local blocks stay attended."""
        lm = model.language_model
        lmp = model.params["language_model"]
        S = 40  # 5 full blocks of 8
        ids = np.asarray([np.arange(S) % 60], np.int32)
        emb = lm.embed(lmp, jnp.asarray(ids))
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (1, S))
        cache = lm.init_cache(1, 64, jnp.float32)
        h, new_cache = lm(lmp, emb, cache, pos)
        assert np.asarray(new_cache.ik).any()  # index keys were written
        assert h.shape == (1, S, 32)

    def test_prefill_decode_consistency(self, model):
        """Greedy decode == teacher-forced logits argmax (ik cache carries
        the index keys across prefill -> decode)."""
        ids = np.asarray([[1, 7, 11, 13, 2]], np.int32)
        lmp = model.params["language_model"]
        emb = model.language_model.embed(lmp, jnp.asarray(ids))
        toks = [
            int(t[0]) for t, _ in generate_step(emb, model, max_tokens=3, seed=0)
        ]
        full = np.concatenate([ids[0], np.asarray(toks[:-1])])[None]
        fe = model.language_model.embed(lmp, jnp.asarray(full))
        cache = model.language_model.init_cache(1, 256, jnp.float32)
        pos = jnp.broadcast_to(
            jnp.arange(full.shape[1], dtype=jnp.int32), (1, full.shape[1])
        )
        logits, _ = jax.jit(model.__call__)(
            model.params, fe, cache, pos
        )
        want = np.argmax(np.asarray(logits)[0, ids.shape[1] - 1 :], axis=-1)
        np.testing.assert_array_equal(np.asarray(toks), want)


class TestMiniMaxVL:
    def test_text_generate(self, model):
        ids = np.asarray([[1, 5, 9, 2]], np.int32)
        emb = model.language_model.embed(
            model.params["language_model"], jnp.asarray(ids)
        )
        toks = [int(t[0]) for t, _ in generate_step(emb, model, max_tokens=4)]
        assert len(toks) == 4

    def test_image_generate_and_merge(self, model):
        grid = (1, 4, 4)
        n_img = 4  # 16 patches -> merge 2x2 -> 4 tokens
        ids = np.asarray([[1, 2] + [64] * n_img + [3]], np.int32)
        rng = np.random.default_rng(0)
        P = model.config.vision_config.patch_size
        pixels = (rng.standard_normal((16, 3 * P * P)) * 0.1).astype(np.float32)
        aux = model.vision_aux_inputs(np.asarray([grid]))
        embeds = jax.jit(model.get_input_embeddings)(
            model.params,
            jnp.asarray(ids),
            pixel_values=jnp.asarray(pixels),
            **{k: jnp.asarray(v) for k, v in aux.items()},
        )
        assert embeds.shape == (1, 7, 32)
        plain = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids)
        )
        assert not np.allclose(np.asarray(embeds[0, 3]), np.asarray(plain[0, 3]))
        np.testing.assert_allclose(
            np.asarray(embeds[0, 0]), np.asarray(plain[0, 0]), atol=1e-6
        )
        toks = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=3)]
        assert len(toks) == 3

    def test_kv_quant_generate(self, model):
        ids = np.asarray([[1, 7, 11, 13, 2]], np.int32)
        emb = model.language_model.embed(
            model.params["language_model"], jnp.asarray(ids)
        )
        t_ref = [int(t[0]) for t, _ in generate_step(emb, model, max_tokens=3)]
        t_q = [
            int(t[0])
            for t, _ in generate_step(
                emb, model, max_tokens=3, kv_bits=8, kv_group_size=8
            )
        ]
        assert t_ref == t_q

    def test_packed_switch_import(self):
        """mlx packed switch_mlp layout (routed + shared expert) unpacks."""
        cfg = tiny_minimax_config()
        w = tiny_minimax_weights(cfg)
        tc = cfg["text_config"]
        E, I, D = 4, tc["intermediate_size"], tc["hidden_size"]
        lp = "model.language_model.model.layers.1.block_sparse_moe."
        gate = np.stack(
            [w.pop(lp + f"experts.{e}.w1.weight") for e in range(E)]
        )
        up = np.stack(
            [w.pop(lp + f"experts.{e}.w3.weight") for e in range(E)]
        )
        down = np.stack(
            [w.pop(lp + f"experts.{e}.w2.weight") for e in range(E)]
        )
        sg = w.pop(lp + "shared_experts.gate_proj.weight")
        su = w.pop(lp + "shared_experts.up_proj.weight")
        sd = w.pop(lp + "shared_experts.down_proj.weight")
        gate_up = np.concatenate(
            [
                np.concatenate([gate, up], axis=1),
                np.concatenate([sg, su], axis=0)[None],
            ],
            axis=0,
        )
        w[lp + "switch_mlp.gate_up_proj.weight"] = gate_up
        w[lp + "switch_mlp.down_proj.weight"] = np.concatenate(
            [down, sd[None]], axis=0
        )
        m = load_model_from_weights(cfg, w, jnp.float32)
        ref = load_model_from_weights(
            tiny_minimax_config(), tiny_minimax_weights(cfg), jnp.float32
        )
        ids = np.asarray([[1, 5, 9, 2]], np.int32)
        for mm in (m, ref):
            emb = mm.language_model.embed(
                mm.params["language_model"], jnp.asarray(ids)
            )
            cache = mm.language_model.init_cache(1, 8, jnp.float32)
            pos = jnp.broadcast_to(jnp.arange(4, dtype=jnp.int32), (1, 4))
            lg, _ = mm(mm.params, emb, cache, pos)
            mm._lg = np.asarray(lg)
        np.testing.assert_allclose(m._lg, ref._lg, atol=1e-5)
