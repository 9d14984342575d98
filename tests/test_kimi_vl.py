"""Kimi-VL: bicubic pos-emb plan, 2D rope pairs, MoonViT + MLA decode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from tests.test_deepseek_v2 import tiny_dsv2_config, tiny_dsv2_weights


def tiny_kimi_config():
    text = tiny_dsv2_config()
    text["model_type"] = "deepseek_v3"
    text["topk_method"] = "noaux_tc"
    text["n_group"] = 2
    text["topk_group"] = 1
    text["norm_topk_prob"] = True
    return {
        "model_type": "kimi_vl",
        "media_placeholder_token_id": 64,
        "text_config": text,
        "vision_config": {
            "model_type": "moonvit",
            "depth": 2,
            "embed_dim": 32,
            "hidden_size": 32,
            "num_heads": 4,
            "patch_size": 14,
            "intermediate_size": 64,
            "init_pos_emb_height": 8,
            "init_pos_emb_width": 8,
            "spatial_merge_size": 2,
        },
    }


def tiny_kimi_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed + 7)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tc, vc = cfg["text_config"], cfg["vision_config"]
    w = {"language_model." + k: v
         for k, v in tiny_dsv2_weights(tc, seed).items()}
    for i in range(1, tc["num_hidden_layers"]):
        w[f"language_model.model.layers.{i}.mlp.gate."
          f"e_score_correction_bias"] = np.zeros(
            tc["n_routed_experts"], np.float32)
    E, P = vc["embed_dim"], vc["patch_size"]
    p = "vision_tower."
    w[p + "patch_embed.proj.weight"] = rand(E, 3, P, P)
    w[p + "patch_embed.proj.bias"] = rand(E)
    w[p + "patch_embed.pos_emb.weight"] = rand(
        vc["init_pos_emb_height"], vc["init_pos_emb_width"], E
    )
    w[p + "final_layernorm.weight"] = np.ones(E, np.float32)
    w[p + "final_layernorm.bias"] = np.zeros(E, np.float32)
    for i in range(vc["depth"]):
        q = p + f"blocks.{i}."
        for nm in ("norm0", "norm1"):
            w[q + nm + ".weight"] = np.ones(E, np.float32)
            w[q + nm + ".bias"] = np.zeros(E, np.float32)
        w[q + "wqkv.weight"] = rand(3 * E, E)  # pre-fixup key form
        w[q + "wqkv.bias"] = rand(3 * E)
        w[q + "wo.weight"] = rand(E, E)
        w[q + "wo.bias"] = rand(E)
        w[q + "mlp.fc0.weight"] = rand(vc["intermediate_size"], E)
        w[q + "mlp.fc0.bias"] = rand(vc["intermediate_size"])
        w[q + "mlp.fc1.weight"] = rand(E, vc["intermediate_size"])
        w[q + "mlp.fc1.bias"] = rand(E)
    D = tc["hidden_size"]
    merged = E * 4
    w["multi_modal_projector.pre_norm.weight"] = np.ones(E, np.float32)
    w["multi_modal_projector.pre_norm.bias"] = np.zeros(E, np.float32)
    w["multi_modal_projector.linear_1.weight"] = rand(merged, merged)
    w["multi_modal_projector.linear_1.bias"] = rand(merged)
    w["multi_modal_projector.linear_2.weight"] = rand(D, merged)
    w["multi_modal_projector.linear_2.bias"] = rand(D)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_kimi_config()
    return load_model_from_weights(cfg, tiny_kimi_weights(cfg), jnp.float32)


class TestBicubicPlan:
    def test_identity_when_same_size(self):
        from mlx_vlm_tpu.models.kimi_vl.kimi_vl import bicubic_pos_plan

        idx, wgt = bicubic_pos_plan([(8, 8)], 8, 8)
        assert wgt[0].min() == 1.0 and wgt[1:].sum() == 0.0

    def test_weights_sum_to_one(self):
        from mlx_vlm_tpu.models.kimi_vl.kimi_vl import bicubic_pos_plan

        idx, wgt = bicubic_pos_plan([(4, 6)], 8, 8)
        np.testing.assert_allclose(wgt.sum(axis=0), 1.0, atol=1e-5)

    def test_reproduces_linear_ramp(self):
        """Bicubic (torch a=-0.75 kernel) reproduces linear functions exactly
        away from the clamped borders."""
        from mlx_vlm_tpu.models.kimi_vl.kimi_vl import bicubic_pos_plan

        yy, xx = np.mgrid[0:8, 0:8].astype(np.float32)
        table = (2 * yy + 3 * xx)[..., None]  # linear in both axes
        idx, wgt = bicubic_pos_plan([(4, 4)], 8, 8)
        got = (wgt[..., None] * table.reshape(64, 1)[idx]).sum(0).reshape(4, 4)
        # expected source coords: (i+0.5)*2 - 0.5
        pos = (np.arange(4) + 0.5) * 2 - 0.5
        exp = 2 * pos[:, None] + 3 * pos[None, :]
        np.testing.assert_allclose(got[1:-1, 1:-1], exp[1:-1, 1:-1],
                                   atol=1e-4)


class TestKimiVL:
    def test_image_generate(self, model):
        # one 28x42 image -> grid (2, 3)... use (2, 2) for merge: 28x28
        ids = np.asarray([[1, 64, 2, 3]], np.int32)
        grids = np.asarray([[2, 2]])
        aux = model.vision_aux_inputs(grids)
        rng = np.random.default_rng(0)
        P = model.config.vision_config.patch_size
        pixels = rng.standard_normal((4, 3 * P * P)).astype(np.float32) * 0.05
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids),
            pixel_values=jnp.asarray(pixels),
            **{k: jnp.asarray(v) for k, v in aux.items()},
        )
        plain = jax.jit(model.get_input_embeddings)(model.params,
                                                    jnp.asarray(ids))
        assert not np.allclose(np.asarray(embeds[0, 1]), np.asarray(plain[0, 1]))
        np.testing.assert_allclose(np.asarray(embeds[0, 0]),
                                   np.asarray(plain[0, 0]), atol=1e-6)
        toks = [int(t[0]) for t, _ in generate_step(embeds, model,
                                                    max_tokens=3)]
        assert len(toks) == 3

    def test_text_only(self, model):
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=3)]
        assert len(toks) == 3
