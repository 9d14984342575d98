import numpy as np

from mlx_vlm_tpu.models.gemma3.processing import (
    Gemma3ImageProcessor,
    pan_and_scan_crops,
)


class TestPanAndScan:
    def test_square_image_no_crops(self):
        assert pan_and_scan_crops(512, 512) == []

    def test_wide_image_crops(self):
        boxes = pan_and_scan_crops(1200, 400)
        assert len(boxes) >= 2
        # crops tile the full width
        assert boxes[0][0] == 0 and boxes[-1][2] == 1200
        for (x0, y0, x1, y1) in boxes:
            assert y0 == 0 and y1 == 400

    def test_tall_image_crops(self):
        boxes = pan_and_scan_crops(400, 1200)
        assert len(boxes) >= 2
        for (x0, y0, x1, y1) in boxes:
            assert x0 == 0 and x1 == 400

    def test_small_image_skipped(self):
        # crops would be under min_crop_size -> no pan and scan
        assert pan_and_scan_crops(300, 100) == []

    def test_max_crops_respected(self):
        assert len(pan_and_scan_crops(6000, 500, max_num_crops=4)) <= 4


class TestGemma3Processor:
    def test_output_shapes(self):
        proc = Gemma3ImageProcessor(image_size=56, do_pan_and_scan=True,
                                    pan_and_scan_min_crop_size=50)
        wide = (np.random.default_rng(0).random((100, 320, 3)) * 255).astype(np.uint8)
        out = proc([wide])
        n = out["pixel_values"].shape[0]
        assert n == 1 + out["num_crops"][0]
        assert out["num_crops"][0] >= 2
        assert out["pixel_values"].shape[1:] == (3, 56, 56)

    def test_no_pas_by_default(self):
        proc = Gemma3ImageProcessor(image_size=56)
        img = (np.zeros((100, 320, 3))).astype(np.uint8)
        out = proc([img])
        assert out["pixel_values"].shape[0] == 1
