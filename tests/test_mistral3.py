"""Mistral3: patch-merger gather plan vs unfold reference + generate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from tests.test_pixtral import tiny_pixtral_config, tiny_pixtral_weights


def tiny_mistral3_config():
    cfg = tiny_pixtral_config()
    cfg["model_type"] = "mistral3"
    cfg["spatial_merge_size"] = 2
    cfg["multimodal_projector_bias"] = False
    return cfg


def tiny_mistral3_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed + 100)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w = tiny_pixtral_weights(cfg, seed, scale)
    E = cfg["vision_config"]["hidden_size"]
    D = cfg["text_config"]["hidden_size"]
    m = cfg["spatial_merge_size"]
    for k in list(w):
        if "multi_modal_projector" in k:
            del w[k]
    w["multi_modal_projector.norm.weight"] = np.ones(E, np.float32)
    w["multi_modal_projector.patch_merger.merging_layer.weight"] = rand(
        E, E * m * m
    )
    w["multi_modal_projector.linear_1.weight"] = rand(D, E)
    w["multi_modal_projector.linear_2.weight"] = rand(D, D)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_mistral3_config()
    return load_model_from_weights(cfg, tiny_mistral3_weights(cfg), jnp.float32)


class TestPatchMergePlan:
    def test_matches_unfold(self):
        """Gather plan reproduces torch-unfold channel-major merging."""
        from mlx_vlm_tpu.models.mistral3.mistral3 import patch_merge_plan

        h, w, d, m = 4, 6, 5, 2
        rng = np.random.default_rng(0)
        feats = rng.standard_normal((h * w, d)).astype(np.float32)
        idx = patch_merge_plan([(h, w)], m)
        got = feats[idx].transpose(0, 2, 1).reshape(idx.shape[0], -1)

        # reference: reshape to grid, unfold k=stride=m, channel-major rows
        grid = feats.reshape(h, w, d).transpose(2, 0, 1)  # [d, h, w]
        blocks = []
        for br in range(h // m):
            for bc in range(w // m):
                blk = grid[:, br * m:(br + 1) * m, bc * m:(bc + 1) * m]
                blocks.append(blk.reshape(-1))  # c-major, then (di, dj)
        ref = np.stack(blocks)
        np.testing.assert_allclose(got, ref, atol=0)

    def test_multi_image_offsets(self):
        from mlx_vlm_tpu.models.mistral3.mistral3 import patch_merge_plan

        idx = patch_merge_plan([(2, 2), (2, 4)], 2)
        assert idx.shape == (3, 4)
        assert idx[0].tolist() == [0, 1, 2, 3]
        assert idx[1].min() == 4  # second image starts after the first


class TestMistral3:
    def test_image_generate(self, model):
        # one 32x32 image -> 2x2 patches -> 1 merged token
        ids = np.asarray([[1, 10, 2, 3]], np.int32)
        grid = np.asarray([[2, 2]])
        aux = model.vision_aux_inputs(grid)
        rng = np.random.default_rng(0)
        P = model.config.vision_config.patch_size
        pixels = rng.standard_normal((4, 3 * P * P)).astype(np.float32) * 0.05
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), pixel_values=jnp.asarray(pixels),
            **{k: jnp.asarray(v) for k, v in aux.items()},
        )
        assert embeds.shape == (1, 4, 64)
        toks = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=3)]
        assert len(toks) == 3

    def test_text_only(self, model):
        ids = (np.arange(5, dtype=np.int32) % 200)[None]
        embeds = jax.jit(model.get_input_embeddings)(model.params,
                                                     jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=3)]
        assert len(toks) == 3
