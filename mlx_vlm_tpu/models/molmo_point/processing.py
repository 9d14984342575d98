"""MolmoPoint processor: overlapping-crop tiler (378px, 24 crops) with
pointing metadata + low-res/high-res token block construction.

Role parity: reference mlx_vlm/models/molmo_point/
processing_molmo_point.py (MolmoPointProcessor:67, get_image_tokens:106)
and image_processing.py (preprocess_images:262).  The crop geometry
itself rides the shared molmo2 port
(models/molmo2/processing.py image_to_patches_and_grids).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..molmo2.processing import image_to_patches_and_grids

IMAGE_PATCH_TOKEN = "<im_patch>"
IMAGE_LOW_RES_TOKEN = "<im_low>"
IM_START_TOKEN = "<im_start>"
LOW_RES_IMAGE_START_TOKEN = "<low_res_im_start>"
IM_END_TOKEN = "<im_end>"
IM_COL_TOKEN = "<im_col>"
IMAGE_PROMPT = "<|image|>"

SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)


class MolmoPointProcessor:
    def __init__(self, tokenizer, *, max_crops: int = 24,
                 overlap_margins=(4, 4), base_size=(378, 378),
                 patch: int = 14, pooling_size=(2, 2),
                 image_use_col_tokens: bool = True,
                 use_single_crop_col_tokens: bool = False,
                 use_single_crop_start_token: bool = True,
                 use_low_res_token_for_global_crops: bool = True):
        self.tokenizer = tokenizer
        self.max_crops = max_crops
        self.overlap_margins = tuple(overlap_margins)
        self.base_size = tuple(base_size)
        self.patch = patch
        self.pool_h, self.pool_w = pooling_size
        self.image_use_col_tokens = image_use_col_tokens
        self.use_single_crop_col_tokens = use_single_crop_col_tokens
        self.use_single_crop_start_token = use_single_crop_start_token
        self.use_low_res_token_for_global_crops = (
            use_low_res_token_for_global_crops)
        self._pointing_metadata: Optional[dict] = None

    # ------------------------------------------------------------- prompt
    def get_image_tokens(self, grid_row) -> str:
        """Low-res block (LOW_RES start, <im_low> rows, no col tokens)
        then high-res block (reference get_image_tokens:106)."""
        lo_h, lo_w, hi_h, hi_w = (int(v) for v in grid_row)
        row_hi = IMAGE_PATCH_TOKEN * hi_w + (
            IM_COL_TOKEN if self.image_use_col_tokens else "")
        hi = IM_START_TOKEN + row_hi * hi_h + IM_END_TOKEN
        lo_tok = (IMAGE_LOW_RES_TOKEN
                  if self.use_low_res_token_for_global_crops
                  else IMAGE_PATCH_TOKEN)
        row_lo = lo_tok * lo_w + (
            IM_COL_TOKEN if self.use_single_crop_col_tokens else "")
        start = (LOW_RES_IMAGE_START_TOKEN
                 if self.use_single_crop_start_token else IM_START_TOKEN)
        return start + row_lo * lo_h + IM_END_TOKEN + hi

    def __call__(self, text=None, images=None, padding=True, **kwargs):
        kwargs.pop("return_tensors", None)
        texts = [text] if isinstance(text, str) else list(text or [""])
        out = {}
        if images is not None:
            if not isinstance(images, (list, tuple)):
                images = [images]
            grids, patches, pools = [], [], []
            abs_pools, mappings, sizes = [], [], []
            offset = 0
            blocks: List[str] = []
            for img in images:
                arr = np.asarray(img.convert("RGB")) if hasattr(
                    img, "convert") else np.asarray(img)
                g, p, pool, _, owner = image_to_patches_and_grids(
                    arr, max_crops=self.max_crops,
                    overlap_margins=self.overlap_margins,
                    base_size=self.base_size, patch=self.patch,
                    pool_h=self.pool_h, pool_w=self.pool_w,
                    mean=SIGLIP_MEAN, std=SIGLIP_STD, return_owner=True)
                grids.append(g[0])
                patches.append(p)
                n_patches = p.shape[0] * p.shape[1]
                pools.append(np.where(pool >= 0, pool + offset, -1))
                abs_pools.append(np.where(pool >= 0, pool + offset, -1))
                mappings.append(owner + offset)
                sizes.append((arr.shape[1], arr.shape[0]))
                offset += n_patches
                blocks.append(self.get_image_tokens(g[0]))
            out["pixel_values"] = np.concatenate(patches, axis=0)
            out["pooled_patches_idx"] = np.concatenate(pools, axis=0)
            out["image_grid_thw"] = np.stack(grids)
            self._pointing_metadata = {
                "token_pooling": np.concatenate(abs_pools, axis=0),
                "subpatch_mapping": mappings,
                "image_sizes": sizes,
            }
            idx = 0
            new_texts = []
            for t in texts:
                n = t.count(IMAGE_PROMPT)
                for b in blocks[idx: idx + n]:
                    t = t.replace(IMAGE_PROMPT, b, 1)
                if n == 0 and idx == 0 and blocks:
                    t = "".join(blocks) + t
                    n = len(blocks)
                idx += n
                new_texts.append(t)
            texts = new_texts
        enc = self.tokenizer(texts, padding=padding)
        out["input_ids"] = np.asarray(enc["input_ids"])
        out["attention_mask"] = np.asarray(enc["attention_mask"])
        return out

    def apply_chat_template(self, messages, **kwargs):
        return self.tokenizer.apply_chat_template(messages, **kwargs)

    def batch_decode(self, *a, **k):
        return self.tokenizer.batch_decode(*a, **k)

    def decode(self, *a, **k):
        return self.tokenizer.decode(*a, **k)


__all__ = ["MolmoPointProcessor"]
