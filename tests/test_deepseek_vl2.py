"""DeepSeek-VL2: tile layout, downsample projector, MLA decode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from tests.test_deepseek_v2 import tiny_dsv2_config, tiny_dsv2_weights


def tiny_dsvl2_config():
    return {
        "model_type": "deepseek_vl_v2",
        "image_token_index": 64,
        "tile_tag": "2D",
        "global_view_pos": "head",
        "language_config": tiny_dsv2_config(),
        "vision_config": {
            "model_type": "vision",
            "layers": 2,
            "width": 32,
            "intermediate_size": 64,
            "num_attention_heads": 4,
            "image_size": 64,  # 4x4 patches
            "patch_size": 16,
        },
        "projector_config": {
            "projector_type": "downsample_mlp_gelu",
            "input_dim": 32,
            "n_embed": 64,  # text hidden
            "depth": 2,
            "mlp_ratio": 1,
            "downsample_ratio": 2,
        },
    }


def tiny_dsvl2_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed + 11)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w = {"language." + k: v
         for k, v in tiny_dsv2_weights(cfg["language_config"], seed).items()}
    vc = cfg["vision_config"]
    E, P = vc["width"], vc["patch_size"]
    n_pos = (vc["image_size"] // P) ** 2
    p = "vision."
    w[p + "patch_embed.proj.weight"] = rand(E, 3, P, P)
    w[p + "patch_embed.proj.bias"] = rand(E)
    w[p + "pos_embed"] = rand(1, n_pos, E)
    w[p + "norm.weight"] = np.ones(E, np.float32)
    w[p + "norm.bias"] = np.zeros(E, np.float32)
    for i in range(vc["layers"]):
        q = p + f"blocks.{i}."
        for nm in ("norm1", "norm2"):
            w[q + nm + ".weight"] = np.ones(E, np.float32)
            w[q + nm + ".bias"] = np.zeros(E, np.float32)
        w[q + "attn.qkv.weight"] = rand(3 * E, E)
        w[q + "attn.qkv.bias"] = rand(3 * E)
        w[q + "attn.proj.weight"] = rand(E, E)
        w[q + "attn.proj.bias"] = rand(E)
        w[q + "mlp.fc1.weight"] = rand(vc["intermediate_size"], E)
        w[q + "mlp.fc1.bias"] = rand(vc["intermediate_size"])
        w[q + "mlp.fc2.weight"] = rand(E, vc["intermediate_size"])
        w[q + "mlp.fc2.bias"] = rand(E)
    pc = cfg["projector_config"]
    w["projector.layers.0.weight"] = rand(pc["n_embed"], pc["input_dim"] * 4)
    w["projector.layers.0.bias"] = rand(pc["n_embed"])
    w["projector.layers.2.weight"] = rand(pc["n_embed"], pc["n_embed"])
    w["projector.layers.2.bias"] = rand(pc["n_embed"])
    w["image_newline"] = rand(pc["n_embed"])
    w["view_seperator"] = rand(pc["n_embed"])  # reference's typo form
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_dsvl2_config()
    return load_model_from_weights(cfg, tiny_dsvl2_weights(cfg), jnp.float32)


class TestDeepseekVL2:
    def test_image_generate(self, model):
        # 1 image, 1x1 local grid: tiles = 1 global + 1 local
        # projector: 4x4 patches -> 2x2 tokens; per view: 2 rows x (2+1) = 6
        # total = 6 (global) + 1 (sep) + 6 (local) = 13
        cnt = 13
        ids = np.asarray([[1] + [64] * cnt + [2]], np.int32)
        rng = np.random.default_rng(0)
        pixels = rng.standard_normal((2, 3, 64, 64)).astype(np.float32) * 0.1
        embeds = jax.jit(
            model.get_input_embeddings,
            static_argnames=("images_spatial_crop",),
        )(model.params, jnp.asarray(ids), pixel_values=jnp.asarray(pixels),
          images_spatial_crop=((1, 1),))
        assert embeds.shape == (1, cnt + 2, 64)
        plain = jax.jit(model.get_input_embeddings)(model.params,
                                                    jnp.asarray(ids))
        assert not np.allclose(np.asarray(embeds[0, 1]), np.asarray(plain[0, 1]))
        toks = [int(t[0]) for t, _ in generate_step(embeds, model,
                                                    max_tokens=3)]
        assert len(toks) == 3

    def test_view_separator_position(self, model):
        """global_view_pos=head: separator embedding sits after the global
        view (row 6 within the image span)."""
        cnt = 13
        ids = np.asarray([[1] + [64] * cnt + [2]], np.int32)
        rng = np.random.default_rng(0)
        pixels = rng.standard_normal((2, 3, 64, 64)).astype(np.float32) * 0.1
        embeds = jax.jit(
            model.get_input_embeddings,
            static_argnames=("images_spatial_crop",),
        )(model.params, jnp.asarray(ids), pixel_values=jnp.asarray(pixels),
          images_spatial_crop=((1, 1),))
        sep = np.asarray(model.params["view_separator"])
        np.testing.assert_allclose(np.asarray(embeds[0, 1 + 6]), sep,
                                   atol=1e-6)

    def test_text_only(self, model):
        ids = (np.arange(5, dtype=np.int32) % 200)[None]
        e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=3)]
        assert len(toks) == 3
