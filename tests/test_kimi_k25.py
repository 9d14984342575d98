"""Kimi-K2.5: MoonViT video grids (temporal sin-cos, whole-video
segments, per-frame merging) over the deepseek_v3 decoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights

from test_kimi_vl import tiny_kimi_config, tiny_kimi_weights


def tiny_cfg():
    cfg = tiny_kimi_config()
    cfg["model_type"] = "kimi_k25"
    return cfg


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    return load_model_from_weights(cfg, tiny_kimi_weights(cfg), jnp.float32)


def _embed_with(model, grid):
    n_img = sum(int(np.prod(r)) // 4 for r in grid)  # merge 2x2
    ids = np.asarray([[1] + [64] * n_img + [2]], np.int32)
    aux = model.vision_aux_inputs(np.asarray(grid))
    n_patches = sum(int(np.prod(r)) for r in grid)
    cfg = model.config.vision_config
    rng = np.random.default_rng(0)
    px = rng.standard_normal(
        (n_patches, 3 * cfg.patch_size**2)).astype(np.float32) * 0.05
    return jax.jit(model.get_input_embeddings)(
        model.params, jnp.asarray(ids), pixel_values=jnp.asarray(px),
        **{k: jnp.asarray(v) for k, v in aux.items()}), ids


class TestKimiK25:
    def test_image_generate(self, model):
        embeds, ids = _embed_with(model, [[1, 4, 4]])
        toks = [int(t[0]) for t, _ in generate_step(embeds, model,
                                                    max_tokens=3)]
        assert len(toks) == 3

    def test_video_grid(self, model):
        # 2-frame video: 2*4*4 = 32 patches -> 8 merged tokens
        embeds, ids = _embed_with(model, [[2, 4, 4]])
        assert embeds.shape[1] == ids.shape[1]
        toks = [int(t[0]) for t, _ in generate_step(embeds, model,
                                                    max_tokens=2)]
        assert len(toks) == 2

    def test_temporal_embedding_distinguishes_frames(self, model):
        """A 2-frame video with identical frames must produce different
        features per frame (temporal sin-cos breaks the tie)."""
        cfg = model.config.vision_config
        rng = np.random.default_rng(1)
        frame = rng.standard_normal(
            (16, 3 * cfg.patch_size**2)).astype(np.float32) * 0.05
        px = np.concatenate([frame, frame])
        aux = model.vision_aux_inputs(np.asarray([[2, 4, 4]]))
        blocks = self_features = model.vision_tower(
            model.params["vision_tower"], jnp.asarray(px),
            **{k: jnp.asarray(v) for k, v in aux.items()
               if k in ("rotary_freqs", "segment_ids", "pos_idx",
                        "pos_weights", "merge_idx", "temporal_emb")})
        b = np.asarray(blocks)  # [8 merged, 4, E] — first 4 frame0
        assert not np.allclose(b[:4], b[4:], atol=1e-6)

    def test_temporal_emb_table(self):
        from mlx_vlm_tpu.models.kimi_k25.kimi_k25 import temporal_sincos_emb

        e = temporal_sincos_emb(4, 32)
        assert e.shape == (4, 32)
        # frame 0: sin(0)=0, cos(0)=1
        np.testing.assert_allclose(e[0, :16], 0.0, atol=1e-7)
        np.testing.assert_allclose(e[0, 16:], 1.0, atol=1e-7)
        assert not np.allclose(e[1], e[2])
