"""Gemma-4 multimodal: 2-D-rope ViT + pooler + soft-token merge.

Contract parity: reference mlx_vlm/models/gemma4/ — patch embed on [-1,1]
pixels with 2-axis position table (vision.py:282), per-axis rotate-half
rope (vision.py:103), position-bucket pooling * sqrt(D) (vision.py:350),
projected features replacing image ids in the scaled stream (gemma4.py:107),
per-layer ids zeroed at mm positions (gemma4.py:99).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from tests.test_gemma4_text import tiny_gemma4_config, tiny_gemma4_weights


def tiny_gemma4_mm_config():
    return {
        "model_type": "gemma4",
        "image_token_id": 99,
        "audio_token_id": 98,
        "text_config": tiny_gemma4_config(),
        "vision_config": {
            "model_type": "gemma4_vision",
            "hidden_size": 16,
            "intermediate_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 2,
            "num_key_value_heads": 2,
            "head_dim": 8,
            "patch_size": 4,
            "position_embedding_size": 8,
            "pooling_kernel_size": 2,
            "default_output_length": 4,
            "rope_parameters": {"rope_theta": 100.0},
        },
    }


def tiny_gemma4_mm_weights(cfg, seed=0, scale=0.08):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w = dict(tiny_gemma4_weights(cfg["text_config"], seed))
    vc = cfg["vision_config"]
    E, P = vc["hidden_size"], vc["patch_size"]
    hd, nh = vc["head_dim"], vc["num_attention_heads"]
    p = "vision_tower."
    w[p + "patch_embedder.input_proj.weight"] = rand(E, 3 * P * P)
    w[p + "patch_embedder.position_embedding_table"] = rand(
        2, vc["position_embedding_size"], E)
    for i in range(vc["num_hidden_layers"]):
        q = p + f"encoder.layers.{i}."
        for nm in ("input_layernorm", "post_attention_layernorm",
                   "pre_feedforward_layernorm",
                   "post_feedforward_layernorm"):
            w[q + nm + ".weight"] = np.ones(E, np.float32)
        w[q + "self_attn.q_proj.weight"] = rand(nh * hd, E)
        w[q + "self_attn.k_proj.weight"] = rand(nh * hd, E)
        w[q + "self_attn.v_proj.weight"] = rand(nh * hd, E)
        w[q + "self_attn.o_proj.weight"] = rand(E, nh * hd)
        w[q + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
        w[q + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
        # dropped-at-sanitize activation clipping calibration
        w[q + "self_attn.q_proj.input_max"] = np.ones(1, np.float32)
        w[q + "mlp.gate_proj.weight"] = rand(vc["intermediate_size"], E)
        w[q + "mlp.up_proj.weight"] = rand(vc["intermediate_size"], E)
        w[q + "mlp.down_proj.weight"] = rand(E, vc["intermediate_size"])
    D = cfg["text_config"]["hidden_size"]
    w["embed_vision.embedding_projection.weight"] = rand(D, E)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_gemma4_mm_config()
    return load_model_from_weights(cfg, tiny_gemma4_mm_weights(cfg),
                                   jnp.float32)


class TestVisionTower:
    def test_pooled_shape(self, model):
        # 16x16 image, patch 4 -> 4x4=16 patches, pool 2 -> 4 tokens
        px = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (1, 3, 16, 16)), jnp.float32)
        out = model.vision_tower(model.params["vision_tower"], px)
        assert out.shape == (1, 4, 16)
        assert np.isfinite(np.asarray(out)).all()

    def test_rope2d_distinguishes_axes(self, model):
        from mlx_vlm_tpu.models.gemma4.vision import rope_2d

        x = jnp.ones((1, 1, 1, 8), jnp.float32)
        px = rope_2d(x, jnp.asarray([[[3, 0]]], jnp.int32), 100.0)
        py = rope_2d(x, jnp.asarray([[[0, 3]]], jnp.int32), 100.0)
        # rotation applies to disjoint head partitions per axis: x-position
        # rotates only the first half, y-position only the second half
        assert not np.allclose(np.asarray(px), np.asarray(py))
        np.testing.assert_allclose(np.asarray(px)[..., 4:],
                                   np.asarray(x)[..., 4:], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(py)[..., :4],
                                   np.asarray(x)[..., :4], rtol=1e-6)

    def test_clipping_params_dropped(self, model):
        enc = model.params["vision_tower"]["encoder"]["layers"]
        assert "input_max" not in enc["self_attn"].get("q_proj", {})


class TestMerge:
    def test_image_tokens_replaced(self, model):
        n_img = 4
        ids = np.asarray([[2, 5] + [99] * n_img + [7]], np.int32)
        px = jnp.asarray(np.random.default_rng(1).uniform(
            0, 1, (1, 3, 16, 16)), jnp.float32)
        emb_img = model.get_input_embeddings(model.params,
                                             jnp.asarray(ids), px)
        emb_txt = model.get_input_embeddings(model.params,
                                             jnp.asarray(ids))
        D = model.config.text_config.hidden_size
        # text positions unchanged, image positions replaced
        np.testing.assert_allclose(np.asarray(emb_img[:, :2, :D]),
                                   np.asarray(emb_txt[:, :2, :D]),
                                   rtol=1e-6)
        assert not np.allclose(np.asarray(emb_img[:, 2:6, :D]),
                               np.asarray(emb_txt[:, 2:6, :D]))
        # per-layer channels identical (ids zeroed at mm positions anyway)
        np.testing.assert_allclose(np.asarray(emb_img[..., D:]),
                                   np.asarray(emb_txt[..., D:]), rtol=1e-6)

    def test_generate_with_image(self, model):
        ids = np.asarray([[2, 5] + [99] * 4 + [7]], np.int32)
        px = jnp.asarray(np.random.default_rng(2).uniform(
            0, 1, (1, 3, 16, 16)), jnp.float32)
        emb = jax.jit(model.get_input_embeddings)(model.params,
                                                  jnp.asarray(ids), px)
        toks = [int(t[0]) for t, _ in generate_step(emb, model,
                                                    max_tokens=4)]
        assert len(toks) == 4


class TestGemma4Unified:
    def _model(self):
        cfg = {
            "model_type": "gemma4_unified",
            "image_token_id": 99,
            "text_config": dict(tiny_gemma4_config(
                num_kv_shared_layers=0,
                hidden_size_per_layer_input=0,
                attention_k_eq_v=True,
                num_global_key_value_heads=1,
                use_double_wide_mlp=False,
                sliding_window_pattern=3,
            ), model_type="gemma4_unified_text"),
            "vision_config": {
                "model_type": "gemma4_unified_vision",
                "model_patch_size": 4,
                "mm_embed_dim": 24,
                "mm_posemb_size": 8,
                "output_proj_dims": 24,
            },
        }
        rng = np.random.default_rng(5)

        def rand(*shape):
            return (rng.standard_normal(shape) * 0.08).astype(np.float32)

        tc = cfg["text_config"]
        w = {}
        for k, v in tiny_gemma4_weights(tc, 5).items():
            # unified has no per-layer tables and k==v global attention
            if ("per_layer" in k or "embed_tokens_per_layer" in k
                    or "layer_scalar" in k):
                continue
            w[k] = v
        # drop v_proj on full-attention (k==v) layers
        p = tc["sliding_window_pattern"]
        for i in range(tc["num_hidden_layers"]):
            if (i % p) == (p - 1):
                w.pop(f"model.layers.{i}.self_attn.v_proj.weight", None)
        patch_dim = 3 * 4 * 4
        E = cfg["vision_config"]["mm_embed_dim"]
        D = tc["hidden_size"]
        for nm, dim in (("patch_ln1", patch_dim), ("patch_ln2", E),
                        ("pos_norm", E)):
            w[f"vision_embedder.{nm}.weight"] = np.ones(dim, np.float32)
            w[f"vision_embedder.{nm}.bias"] = np.zeros(dim, np.float32)
        w["vision_embedder.patch_dense.weight"] = rand(E, patch_dim)
        w["vision_embedder.patch_dense.bias"] = rand(E)
        w["vision_embedder.pos_embedding"] = rand(8, 2, E)
        w["embed_vision.embedding_projection.weight"] = rand(D, E)
        return load_model_from_weights(cfg, w, jnp.float32)

    def test_encoderfree_merge_and_generate(self):
        model = self._model()
        n_patches = 4
        ids = np.asarray([[2, 5] + [99] * n_patches + [7]], np.int32)
        px = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (1, n_patches, 48)), jnp.float32)
        pos = jnp.asarray(np.asarray(
            [[[0, 0], [1, 0], [0, 1], [1, 1]]]), jnp.int32)
        emb = model.get_input_embeddings(model.params, jnp.asarray(ids),
                                         px, image_position_ids=pos)
        assert emb.shape == (1, 7, 32)
        toks = [int(t[0]) for t, _ in generate_step(emb, model,
                                                    max_tokens=4)]
        assert len(toks) == 4

    def test_k_eq_v_layers_loaded(self):
        model = self._model()
        fl = model.params["language_model"]["model"]["full_layers"]
        assert "v_proj" not in fl["self_attn"]
