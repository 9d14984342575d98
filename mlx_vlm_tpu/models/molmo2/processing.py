"""Molmo2 processor port.

Role parity: reference mlx_vlm/models/molmo2/processing.py (773 LoC) —
Molmo2 checkpoints need a trust_remote_code AutoProcessor; this port
covers the geometry and prompt construction in-framework:

- overlapping-crop tiling: a low-res global crop plus up to max_crops
  high-res crops with overlap margins; per-patch index maps mark which
  patch of which crop owns each (y, x) cell (margins defer to interior
  crops), then 2x2 pooling windows gather those indices with centered
  padding (arange_for_pooling) — exactly the pooled_patches_idx the
  tower's gather-pool adapter consumes (models/molmo2/__init__.py:130).
- prompt construction: per image,
  [low-res <im_start> rows of <im_patch> (+<im_col>) <im_end>] then the
  high-res block, inserted at <|image|> markers.

The layouts (crop order low-res first, index offsets, centered padding)
are wire-format constraints from the checkpoint's adapter; the
implementation is vectorized numpy rather than the reference's loops
where possible.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

import numpy as np

IM_PATCH = "<im_patch>"
IM_COL = "<im_col>"
IM_START = "<im_start>"
IM_END = "<im_end>"
LOW_RES_START = "<im_low_start>"
IMAGE_MARKER = re.compile(r"<\|image\|>")


def select_tiling(h: int, w: int, crop_size: int, max_crops: int
                  ) -> Tuple[int, int]:
    """Smallest (rows, cols) grid of crop_size crops covering (h, w)
    without downscaling when possible (reference :82)."""
    tilings = sorted(
        ((i, j) for i in range(1, max_crops + 1)
         for j in range(1, max_crops + 1) if i * j <= max_crops),
        key=lambda t: (t[0] * t[1], t[0]))
    cand = np.asarray(tilings, np.int32)
    res = cand.astype(np.float32) * crop_size
    scale = np.min(res / np.asarray([h, w], np.float32), axis=-1)
    if np.all(scale < 1):
        ix = int(np.argmax(scale))
    else:
        ix = int(np.argmin(np.where(scale < 1.0, 1e9, scale)))
    return tuple(cand[ix])


def _resize(image: np.ndarray, size_hw, resample=None) -> np.ndarray:
    from PIL import Image

    img = Image.fromarray(image.astype(np.uint8)) if image.dtype != \
        np.uint8 else Image.fromarray(image)
    img = img.resize((int(size_hw[1]), int(size_hw[0])),
                     resample or Image.BILINEAR)
    return np.asarray(img)


def _normalize(x: np.ndarray, mean, std) -> np.ndarray:
    x = x.astype(np.float32) / 255.0
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def pixels_to_patches(crops: np.ndarray, patch: int) -> np.ndarray:
    """[N, H, W, C] -> [N, (H/p)*(W/p), p*p*C] (reference :224)."""
    n, h, w, c = crops.shape
    ph, pw = h // patch, w // patch
    x = crops.reshape(n, ph, patch, pw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, ph * pw, patch * patch * c)


def arange_for_pooling(idx: np.ndarray, pool_h: int, pool_w: int
                       ) -> np.ndarray:
    """[H, W] index map -> [outH, outW, pool_h*pool_w] gather windows
    with CENTERED -1 padding (reference :239)."""
    h, w = idx.shape
    hp = pool_h * -(-h // pool_h) - h
    wp = pool_w * -(-w // pool_w) - w
    idx = np.pad(idx, [[hp // 2, (hp + 1) // 2], [wp // 2, (wp + 1) // 2]],
                 constant_values=-1)
    oh, ow = idx.shape[0] // pool_h, idx.shape[1] // pool_w
    idx = idx.reshape(oh, pool_h, ow, pool_w).transpose(0, 2, 1, 3)
    return idx.reshape(oh, ow, pool_h * pool_w)


def image_to_patches_and_grids(
    image: np.ndarray, *, max_crops: int = 12,
    overlap_margins=(4, 4), base_size=(336, 336), patch: int = 14,
    pool_h: int = 2, pool_w: int = 2,
    mean=(0.48145466, 0.4578275, 0.40821073),
    std=(0.26862954, 0.26130258, 0.27577711),
    return_owner: bool = False,
):
    """(image_grid [1,4], patches [N, n_patch, pdim], pooling_idx
    [n_pool, pool], (hi_h, hi_w)[, owner]) — reference :273.

    With return_owner=True also yields the full-res patch-ownership map
    [full_h, full_w] of ABSOLUTE vit-patch ids (low-res crop offsets
    applied) — molmo_point's subpatch back-mapping consumes it
    (reference molmo_point/image_processing.py patch_idx_arr:240)."""
    lm, rm = overlap_margins
    crop_size = base_size[0]
    cp = crop_size // patch                 # patches per crop side
    win_p = cp - (lm + rm)                  # interior window patches
    win_px = win_p * patch
    margin_px = (lm + rm) * patch
    H, W = image.shape[:2]
    tiling = select_tiling(H - margin_px, W - margin_px, win_px, max_crops)

    src = _normalize(_resize(
        image, (tiling[0] * win_px + margin_px,
                tiling[1] * win_px + margin_px)), mean, std)
    n_crops = tiling[0] * tiling[1]
    crops = np.zeros((n_crops, crop_size, crop_size, 3), np.float32)
    # ownership map over the full high-res patch grid
    full_h = tiling[0] * win_p + lm + rm
    full_w = tiling[1] * win_p + lm + rm
    owner = np.zeros((full_h, full_w), np.int32)
    base_idx = np.arange(cp * cp, dtype=np.int32).reshape(cp, cp)
    c = 0
    for i in range(tiling[0]):
        for j in range(tiling[1]):
            crops[c] = src[i * win_px: i * win_px + crop_size,
                           j * win_px: j * win_px + crop_size]
            pi = base_idx + c * cp * cp
            pi = pi.copy()
            if i != 0:
                pi[:lm, :] = -1
            if j != 0:
                pi[:, :lm] = -1
            if i != tiling[0] - 1:
                pi[-rm:, :] = -1
            if j != tiling[1] - 1:
                pi[:, -rm:] = -1
            y0, x0 = i * win_p, j * win_p
            region = owner[y0: y0 + cp, x0: x0 + cp]
            owner[y0: y0 + cp, x0: x0 + cp] = np.where(pi >= 0, pi, region)
            c += 1

    hi_pool = arange_for_pooling(owner, pool_h, pool_w)
    hi_h, hi_w = hi_pool.shape[:2]
    hi_pool = hi_pool.reshape(-1, pool_h * pool_w)
    # low-res global crop goes FIRST; its patch ids offset the high-res
    hi_pool = np.where(hi_pool >= 0, hi_pool + cp * cp, -1)

    lo = _normalize(_resize(image, base_size), mean, std)[None]
    lo_pool = arange_for_pooling(base_idx, pool_h, pool_w)
    lo_h, lo_w = lo_pool.shape[:2]
    lo_pool = lo_pool.reshape(-1, pool_h * pool_w)

    all_crops = np.concatenate([lo, crops], axis=0)
    pooling_idx = np.concatenate([lo_pool, hi_pool], axis=0)
    grid = np.asarray([[lo_h, lo_w, hi_h, hi_w]], np.int32)
    out = (grid, pixels_to_patches(all_crops, patch), pooling_idx,
           (hi_h, hi_w))
    if return_owner:
        out = out + (owner + cp * cp,)
    return out


def image_token_string(grid_row, use_col_tokens: bool = True,
                       low_res_start_token: bool = False) -> str:
    """reference get_image_tokens (:523): low-res block then high-res."""
    lo_h, lo_w, hi_h, hi_w = (int(v) for v in grid_row)
    row_hi = IM_PATCH * hi_w + (IM_COL if use_col_tokens else "")
    hi = IM_START + row_hi * hi_h + IM_END
    row_lo = IM_PATCH * lo_w + (IM_COL if use_col_tokens else "")
    start = LOW_RES_START if low_res_start_token else IM_START
    lo = start + row_lo * lo_h + IM_END
    return lo + hi


class Molmo2Processor:
    """Tokenizer + crop geometry + prompt construction."""

    def __init__(self, tokenizer, model=None, max_crops: int = 12,
                 base_size=(336, 336), patch: int = 14,
                 overlap_margins=(4, 4), pool_h: int = 2, pool_w: int = 2,
                 use_col_tokens: bool = True):
        self.tokenizer = tokenizer
        self.max_crops = max_crops
        self.base_size = tuple(base_size)
        self.patch = patch
        self.overlap_margins = tuple(overlap_margins)
        self.pool_h, self.pool_w = pool_h, pool_w
        self.use_col_tokens = use_col_tokens

    def __call__(self, text=None, images=None, return_tensors="np",
                 padding=None, **kwargs):
        texts = [text] if isinstance(text, str) else list(text or [""])
        out = {}
        token_blocks: List[str] = []
        if images:
            if not isinstance(images, (list, tuple)):
                images = [images]
            grids, patches, pools = [], [], []
            offset = 0
            for img in images:
                arr = np.asarray(img.convert("RGB")) if hasattr(
                    img, "convert") else np.asarray(img)
                g, p, pool, _ = image_to_patches_and_grids(
                    arr, max_crops=self.max_crops,
                    overlap_margins=self.overlap_margins,
                    base_size=self.base_size, patch=self.patch,
                    pool_h=self.pool_h, pool_w=self.pool_w)
                grids.append(g[0])
                patches.append(p)
                pools.append(np.where(pool >= 0,
                                      pool + offset * p.shape[1], -1))
                offset += p.shape[0]
                token_blocks.append(image_token_string(
                    g[0], self.use_col_tokens))
            out["pixel_values"] = np.concatenate(patches, axis=0)
            out["pooled_patches_idx"] = np.concatenate(pools, axis=0)
            out["image_grid_thw"] = np.stack(grids)
        ids_rows = []
        for t in texts:
            if token_blocks:
                i = 0

                def sub(_m):
                    nonlocal i
                    blk = token_blocks[min(i, len(token_blocks) - 1)]
                    i += 1
                    return blk

                t = IMAGE_MARKER.sub(sub, t)
                if i == 0:
                    t = "".join(token_blocks) + t
            ids_rows.append(self.tokenizer.encode(t))
        L = max(len(r) for r in ids_rows)
        pad_id = getattr(self.tokenizer, "pad_token_id", 0) or 0
        out["input_ids"] = np.asarray(
            [[pad_id] * (L - len(r)) + r for r in ids_rows], np.int64)
        out["attention_mask"] = np.asarray(
            [[0] * (L - len(r)) + [1] * len(r) for r in ids_rows],
            np.int64)
        return out

    def apply_chat_template(self, messages, **kwargs):
        return self.tokenizer.apply_chat_template(messages, **kwargs)

    def batch_decode(self, *a, **k):
        return self.tokenizer.batch_decode(*a, **k)

    def decode(self, *a, **k):
        return self.tokenizer.decode(*a, **k)


__all__ = ["Molmo2Processor", "image_to_patches_and_grids",
           "arange_for_pooling", "select_tiling", "pixels_to_patches",
           "image_token_string"]
