"""Per-model processor ports: minicpmv4_6 slicing geometry + prompt
expansion; molmo2 overlapping-crop tiling + pooled index maps."""

import numpy as np
import pytest
from PIL import Image


class FakeTok:
    unk_token_id = 3
    pad_token_id = 0

    def convert_ids_to_tokens(self, i):
        return "<unk>"

    def encode(self, t):
        # crude: one id per char chunk; <unk> -> id 3
        ids = []
        i = 0
        while i < len(t):
            if t.startswith("<unk>", i):
                ids.append(3)
                i += 5
            else:
                ids.append(10 + (ord(t[i]) % 50))
                i += 1
        return ids


class TestMiniCPMVProcessing:
    def test_best_resize_divisible(self):
        from mlx_vlm_tpu.models.minicpmv4_6.processing import (
            find_best_resize)

        w, h = find_best_resize((1000, 700), 448, 14)
        assert w % 14 == 0 and h % 14 == 0
        assert w * h <= (448 * 448) * 1.2
        # aspect preserved approximately
        assert abs((w / h) - (1000 / 700)) < 0.2

    def test_sliced_grid_matches_area(self):
        from mlx_vlm_tpu.models.minicpmv4_6.processing import (
            get_sliced_grid)

        g = get_sliced_grid((2000, 1000), 448, max_slice_nums=9)
        assert g is not None
        gx, gy = g
        assert 1 < gx * gy <= 10
        assert gx >= gy  # wide image -> wider grid

        assert get_sliced_grid((300, 300), 448, 9) is None

    def test_slice_image_shapes(self):
        from mlx_vlm_tpu.models.minicpmv4_6.processing import slice_image

        img = Image.fromarray(
            (np.random.default_rng(0).random((800, 1600, 3)) * 255
             ).astype(np.uint8))
        source, patches, grid = slice_image(img, 448, 14, 9)
        assert grid is not None
        assert source.size[0] % 14 == 0 and source.size[1] % 14 == 0
        assert len(patches) == grid[1] and len(patches[0]) == grid[0]

    def test_processor_expands_unk_tokens(self):
        from mlx_vlm_tpu.models.minicpmv4_6.processing import (
            MiniCPMVProcessor)

        proc = MiniCPMVProcessor(FakeTok(), merger_times=1)
        img = Image.fromarray(
            (np.random.default_rng(1).random((448, 448, 3)) * 255
             ).astype(np.uint8))
        out = proc(text="hi(<image>./</image>)done", images=[img])
        g = out["image_grid_thw"][0]
        f = 2 * 2  # vit_merger 2x2 + one halving
        n = (int(g[1]) // f) * (int(g[2]) // f)
        ids = out["input_ids"][0]
        assert (ids == 3).sum() == n
        assert out["pixel_values"].shape[1] == 3  # NCHW


class TestMolmo2Processing:
    def test_select_tiling_covers(self):
        from mlx_vlm_tpu.models.molmo2.processing import select_tiling

        rows, cols = select_tiling(700, 1400, 336, 12)
        assert rows * cols <= 12
        assert cols >= rows  # wide image

    def test_pooling_idx_centered_padding(self):
        from mlx_vlm_tpu.models.molmo2.processing import arange_for_pooling

        idx = np.arange(5 * 7, dtype=np.int32).reshape(5, 7)
        win = arange_for_pooling(idx, 2, 2)
        assert win.shape == (3, 4, 4)
        flat = win.reshape(-1, 4)
        # every original index appears exactly once among non-(-1)s
        vals = flat[flat >= 0]
        assert sorted(vals.tolist()) == list(range(35))

    def test_image_to_patches_order_and_indices(self):
        from mlx_vlm_tpu.models.molmo2.processing import (
            image_to_patches_and_grids)

        rng = np.random.default_rng(2)
        img = (rng.random((500, 900, 3)) * 255).astype(np.uint8)
        grid, patches, pooling, (hh, hw) = image_to_patches_and_grids(
            img, max_crops=4, base_size=(336, 336), patch=14)
        n_crops, n_patch, pdim = patches.shape
        assert pdim == 14 * 14 * 3
        assert n_patch == (336 // 14) ** 2
        # pooled rows = low-res block + high-res block
        lo_h, lo_w, hi_h, hi_w = grid[0]
        assert (hh, hw) == (hi_h, hi_w)
        assert pooling.shape == (lo_h * lo_w + hi_h * hi_w, 4)
        # every index addresses a real patch
        assert pooling.max() < n_crops * n_patch
        # low-res rows reference crop 0 only
        lo_rows = pooling[: lo_h * lo_w]
        assert lo_rows[lo_rows >= 0].max() < n_patch

    def test_processor_prompt_tokens(self):
        from mlx_vlm_tpu.models.molmo2.processing import (IM_END, IM_PATCH,
                                                          IM_START,
                                                          Molmo2Processor,
                                                          image_token_string)

        row = image_token_string((2, 3, 4, 5))
        assert row.count(IM_PATCH) == 2 * 3 + 4 * 5
        assert row.count(IM_START) == 2 and row.count(IM_END) == 2

        proc = Molmo2Processor(FakeTok(), max_crops=4)
        img = Image.fromarray(
            (np.random.default_rng(3).random((400, 600, 3)) * 255
             ).astype(np.uint8))
        out = proc(text="look <|image|> here", images=[img])
        assert out["pixel_values"].ndim == 3
        assert out["pooled_patches_idx"].shape[1] == 4
        assert out["input_ids"].shape[0] == 1


class _CallTok:
    """Callable fake tokenizer (HF __call__ signature)."""

    pad_token_id = 0

    def __call__(self, text, add_special_tokens=False, **kw):
        return {"input_ids": [10 + (ord(c) % 50) for c in text]}


class TestPhi4MMProcessing:
    def test_naflex_sizing_no_upscale_band(self):
        from mlx_vlm_tpu.models.phi4mm.processing import fit_num_patches

        hp, wp = fit_num_patches(80, 100, 14, 256)
        assert hp * wp <= 256
        assert abs((wp / hp) - (100 / 80)) < 0.3

    def test_image_expansion_matches_patch_count(self):
        from mlx_vlm_tpu.models.phi4mm.processing import (
            IMAGE_TOKEN_INDEX, Phi4MMProcessor)

        proc = Phi4MMProcessor(_CallTok())
        img = Image.fromarray(
            (np.random.default_rng(0).random((80, 100, 3)) * 255
             ).astype(np.uint8))
        out = proc(text="hi <|image_1|> bye", images=[img])
        g = out["image_grid_thw"][0]
        n = int(g[1] * g[2])
        assert out["pixel_values"].shape == (n, 14 * 14 * 3)
        assert (out["input_ids"][0] == IMAGE_TOKEN_INDEX).sum() == n

    def test_audio_features_and_expansion(self):
        from mlx_vlm_tpu.models.phi4mm.processing import (
            AUDIO_TOKEN_INDEX, Phi4MMProcessor)

        proc = Phi4MMProcessor(_CallTok())
        wav = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)).astype(
            np.float32)
        out = proc(text="say <|audio_1|> now", audio=[wav])
        n_frames = (16000 - 400) // 160 + 1
        assert out["input_features"].shape == (1, n_frames, 80)
        want = -(-n_frames // 8)
        assert (out["input_ids"][0] == AUDIO_TOKEN_INDEX).sum() == want
        assert int(out["audio_embed_sizes"][0]) == want

    def test_audio_embed_size_matches_model_conv_formula(self):
        """ceil(T/8) (processor) == 3x stride-2 conv output (model)."""
        import jax.numpy as jnp

        from tests.test_phi4mm import _model

        m = _model()
        for t in (7, 8, 9, 24, 98, 500, 501):
            assert m.audio_embed_size(t) == -(-t // 8), t
