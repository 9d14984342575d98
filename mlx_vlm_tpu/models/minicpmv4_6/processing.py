"""MiniCPM-V 4.6 processor port.

Role parity: reference mlx_vlm/models/minicpmv4_6/processing_minicpmv4_6.py
(1,643 LoC) — these checkpoints ship a trust_remote_code AutoProcessor, so
the slicing geometry and prompt construction must live in-framework:

- _find_best_resize / _get_refine_size / _get_sliced_grid / slice_image:
  the MiniCPM-V adaptive slicing geometry (scale to ~max_slice_nums crops
  of patch-divisible sizes), ported faithfully and unit-tested.
- MiniCPMVImageProcessor.preprocess: resize to patch-divisible dims,
  rescale + normalize (0.5 mean/std), NCHW pixel_values + grid shapes.
- MiniCPMVProcessor: expands each ``(<image>./</image>)`` marker into
  ``<image><unk>*N</image>`` where N is the post-merger token count of
  THIS repo's tower (vit_merger 2x2 + merger halvings — __init__.py:136),
  tokenizes, and returns the prepare_inputs-shaped dict
  (input_ids / pixel_values / image_grid_thw / attention_mask).

The TPU model consumes one resized image per <image> span; the slicing
helpers are exposed for callers that pre-slice into multiple spans.
"""

from __future__ import annotations

import math
import re
from typing import List, Optional, Tuple

import numpy as np


def ensure_divide(length: int, patch_size: int) -> int:
    return max(round(length / patch_size) * patch_size, patch_size)


def find_best_resize(original_size: Tuple[int, int], scale_resolution: int,
                     patch_size: int, allow_upscale: bool = False
                     ) -> Tuple[int, int]:
    """reference processing_minicpmv4_6.py:176 — keep aspect, bound area
    by scale_resolution^2, snap to patch-divisible dims."""
    width, height = original_size
    if width * height > scale_resolution * scale_resolution or allow_upscale:
        r = width / height
        width = int(scale_resolution * math.sqrt(r))
        height = int(width / r)
    w = ensure_divide(width, patch_size)
    h = ensure_divide(height, patch_size)
    return w, h


def get_refine_size(original_size: Tuple[int, int], grid: Tuple[int, int],
                    scale_resolution: int, patch_size: int,
                    allow_upscale: bool = False) -> Tuple[int, int]:
    """reference :194 — best per-crop size scaled back to the full grid."""
    width, height = original_size
    gx, gy = grid
    rw = ensure_divide(width, gx)
    rh = ensure_divide(height, gy)
    bw, bh = find_best_resize((rw // gx, rh // gy), scale_resolution,
                              patch_size, allow_upscale=allow_upscale)
    return bw * gx, bh * gy


def get_sliced_grid(original_size: Tuple[int, int], scale_resolution: int,
                    max_slice_nums: int, never_split: bool = False
                    ) -> Optional[Tuple[int, int]]:
    """reference :231 — choose the (gx, gy) crop grid whose per-crop
    aspect best matches the image, or None when no slicing is needed."""
    width, height = original_size
    log_ratio = math.log(width / height)
    ratio = width * height / (scale_resolution * scale_resolution)
    multiple = min(math.ceil(ratio), max_slice_nums)
    if multiple <= 1 or never_split:
        return None
    candidates = set()
    for m in (multiple - 1, multiple, multiple + 1):
        if m <= 1 or m > max_slice_nums:
            continue
        for gx in range(1, m + 1):
            if m % gx == 0:
                candidates.add((gx, m // gx))
    best, best_err = None, float("inf")
    for gx, gy in sorted(candidates):
        err = abs(log_ratio - math.log(gx / gy))
        if err < best_err:
            best, best_err = (gx, gy), err
    return best


def slice_image(image, scale_resolution: int = 448, patch_size: int = 14,
                max_slice_nums: int = 9, never_split: bool = False):
    """reference :274 — (source_image, [[patches…]], grid | None)."""
    from PIL import Image

    w, h = image.size
    grid = get_sliced_grid((w, h), scale_resolution, max_slice_nums,
                           never_split)
    if grid is None:
        bw, bh = find_best_resize((w, h), scale_resolution, patch_size,
                                  allow_upscale=True)
        return image.resize((bw, bh), Image.BICUBIC), [], None
    source = image.resize(
        find_best_resize((w, h), scale_resolution, patch_size),
        Image.BICUBIC)
    rw, rh = get_refine_size((w, h), grid, scale_resolution, patch_size,
                             allow_upscale=True)
    refined = image.resize((rw, rh), Image.BICUBIC)
    gx, gy = grid
    cw, ch = rw // gx, rh // gy
    patches = [[refined.crop((x * cw, y * ch, (x + 1) * cw, (y + 1) * ch))
                for x in range(gx)] for y in range(gy)]
    return source, patches, grid


class MiniCPMVImageProcessor:
    def __init__(self, patch_size: int = 14, scale_resolution: int = 448,
                 max_slice_nums: int = 9,
                 mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)):
        self.patch_size = patch_size
        self.scale_resolution = scale_resolution
        self.max_slice_nums = max_slice_nums
        self.mean = np.asarray(mean, np.float32).reshape(3, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(3, 1, 1)

    def _normalize(self, img) -> np.ndarray:
        x = np.asarray(img, np.float32) / 255.0      # [H, W, 3]
        x = x.transpose(2, 0, 1)                     # NCHW body
        return (x - self.mean) / self.std

    def preprocess(self, images: List) -> dict:
        """Each image -> best-resize (no slicing: one span per image);
        returns NCHW pixel_values list + grid_thw rows (1, h_p, w_p)."""
        from PIL import Image

        pixel_values, grids = [], []
        for img in images:
            if not isinstance(img, Image.Image):
                img = Image.fromarray(np.asarray(img))
            img = img.convert("RGB")
            bw, bh = find_best_resize(img.size, self.scale_resolution,
                                      self.patch_size, allow_upscale=True)
            img = img.resize((bw, bh), Image.BICUBIC)
            pixel_values.append(self._normalize(img))
            grids.append((1, bh // self.patch_size, bw // self.patch_size))
        return {"pixel_values": pixel_values,
                "image_grid_thw": np.asarray(grids, np.int64)}


_IMG_MARKER = re.compile(r"\(<image>\./</image>\)|<image>\./</image>")


class MiniCPMVProcessor:
    """Tokenizer + image processor + placeholder expansion."""

    def __init__(self, tokenizer, model=None, patch_size: int = 14,
                 scale_resolution: int = 448, merger_times: int = 1):
        self.tokenizer = tokenizer
        cfg = getattr(model, "config", None)
        vc = getattr(cfg, "vision_config", None)
        self.image_processor = MiniCPMVImageProcessor(
            patch_size=getattr(vc, "patch_size", patch_size),
            scale_resolution=getattr(vc, "image_size", scale_resolution),
        )
        self.merger_times = getattr(cfg, "merger_times", merger_times)
        self.image_token_id = getattr(cfg, "image_token_id", None)
        unk = tokenizer.unk_token_id if getattr(
            tokenizer, "unk_token_id", None) is not None else 0
        if self.image_token_id is None:
            self.image_token_id = unk
        self.unk_token = (tokenizer.convert_ids_to_tokens(
            self.image_token_id) if hasattr(tokenizer,
                                            "convert_ids_to_tokens")
            else "<unk>")

    def _n_tokens(self, grid) -> int:
        _, h, w = grid
        f = 2 * (2 ** self.merger_times)  # vit_merger 2x2 + halvings
        return max(1, (h // f) * (w // f))

    def __call__(self, text=None, images=None, return_tensors="np",
                 padding=None, **kwargs):
        texts = [text] if isinstance(text, str) else list(text or [""])
        out = {}
        grids = None
        if images:
            if not isinstance(images, (list, tuple)):
                images = [images]
            proc = self.image_processor.preprocess(list(images))
            grids = proc["image_grid_thw"]
            out["image_grid_thw"] = grids
            # pad image batch to a uniform spatial size for one array
            pv = proc["pixel_values"]
            H = max(p.shape[1] for p in pv)
            W = max(p.shape[2] for p in pv)
            out["pixel_values"] = np.stack([
                np.pad(p, ((0, 0), (0, H - p.shape[1]),
                           (0, W - p.shape[2]))) for p in pv])
        ids_rows = []
        for t in texts:
            if grids is not None:
                i = 0

                def sub(_m):
                    nonlocal i
                    n = self._n_tokens(grids[min(i, len(grids) - 1)])
                    i += 1
                    return "<image>" + self.unk_token * n + "</image>"

                t = _IMG_MARKER.sub(sub, t)
                if i == 0 and len(grids) > 0:
                    # no marker present: prepend one span per image
                    spans = "".join(
                        "<image>" + self.unk_token * self._n_tokens(g)
                        + "</image>" for g in grids)
                    t = spans + t
            ids_rows.append(self.tokenizer.encode(t))
        L = max(len(r) for r in ids_rows)
        pad_id = getattr(self.tokenizer, "pad_token_id", 0) or 0
        out["input_ids"] = np.asarray(
            [[pad_id] * (L - len(r)) + r for r in ids_rows], np.int64)
        out["attention_mask"] = np.asarray(
            [[0] * (L - len(r)) + [1] * len(r) for r in ids_rows], np.int64)
        return out

    def apply_chat_template(self, messages, **kwargs):
        return self.tokenizer.apply_chat_template(messages, **kwargs)

    def batch_decode(self, *a, **k):
        return self.tokenizer.batch_decode(*a, **k)

    def decode(self, *a, **k):
        return self.tokenizer.decode(*a, **k)


__all__ = ["MiniCPMVProcessor", "MiniCPMVImageProcessor", "slice_image",
           "find_best_resize", "get_refine_size", "get_sliced_grid",
           "ensure_divide"]
