"""Gemma 3 image processing with pan-and-scan cropping.

Role parity: reference mlx_vlm/models/gemma3/processing_gemma3.py (pan-and-
scan :83-86): wide/tall images are split into up to `max_num_crops` crops
that are processed alongside the full image.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np

SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)


def pan_and_scan_crops(
    width: int,
    height: int,
    min_crop_size: int = 256,
    max_num_crops: int = 4,
    min_ratio_to_activate: float = 1.2,
) -> List[Tuple[int, int, int, int]]:
    """Crop boxes (x0, y0, x1, y1); empty when the image is near-square."""
    if width >= height:
        if width / height < min_ratio_to_activate:
            return []
        num_w = int(math.floor(width / height + 0.5))
        num_w = min(int(math.floor(width / min_crop_size)), num_w)
        num_w = max(2, num_w)
        num_w = min(max_num_crops, num_w)
        num_h = 1
    else:
        if height / width < min_ratio_to_activate:
            return []
        num_h = int(math.floor(height / width + 0.5))
        num_h = min(int(math.floor(height / min_crop_size)), num_h)
        num_h = max(2, num_h)
        num_h = min(max_num_crops, num_h)
        num_w = 1

    crop_w = int(math.ceil(width / num_w))
    crop_h = int(math.ceil(height / num_h))
    if crop_w < min_crop_size or crop_h < min_crop_size:
        return []
    boxes = []
    for iy in range(num_h):
        for ix in range(num_w):
            x0 = ix * crop_w
            y0 = iy * crop_h
            boxes.append((x0, y0, min(x0 + crop_w, width), min(y0 + crop_h, height)))
    return boxes


class Gemma3ImageProcessor:
    """SigLIP-normalized square resize, optionally with pan-and-scan crops."""

    def __init__(
        self,
        image_size: int = 896,
        do_pan_and_scan: bool = False,
        pan_and_scan_min_crop_size: int = 256,
        pan_and_scan_max_num_crops: int = 4,
        image_mean=SIGLIP_MEAN,
        image_std=SIGLIP_STD,
    ):
        self.image_size = image_size
        self.do_pan_and_scan = do_pan_and_scan
        self.min_crop = pan_and_scan_min_crop_size
        self.max_crops = pan_and_scan_max_num_crops
        self.mean = np.asarray(image_mean, np.float32)
        self.std = np.asarray(image_std, np.float32)

    def _one(self, arr: np.ndarray) -> np.ndarray:
        from PIL import Image

        img = Image.fromarray(arr).resize(
            (self.image_size, self.image_size), Image.BICUBIC
        )
        x = np.asarray(img, np.float32) / 255.0
        x = (x - self.mean) / self.std
        return x.transpose(2, 0, 1)  # CHW

    def __call__(self, images) -> dict:
        from ...utils.processing import load_image

        if not isinstance(images, (list, tuple)):
            images = [images]
        out = []
        num_crops = []
        for im in images:
            arr = np.asarray(load_image(im))
            h, w = arr.shape[:2]
            crops = (
                pan_and_scan_crops(w, h, self.min_crop, self.max_crops)
                if self.do_pan_and_scan
                else []
            )
            out.append(self._one(arr))
            for (x0, y0, x1, y1) in crops:
                out.append(self._one(arr[y0:y1, x0:x1]))
            num_crops.append(len(crops))
        return {
            "pixel_values": np.stack(out).astype(np.float32),
            "num_crops": np.asarray(num_crops),
        }
