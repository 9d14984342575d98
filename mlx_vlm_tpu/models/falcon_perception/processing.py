"""Falcon-Perception processor: shortest/longest-edge clamp + smart
resize to patch multiples, +-0.5 normalization, image token expansion
with the cls/reg prefix.

Role parity: reference mlx_vlm/models/falcon_perception/
processing_falcon_perception.py — _resize_if_necessary:18,
_smart_resize:48, preprocess_image:74, FalconPerceptionProcessor:97,
_expand_image_tokens:308.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np
from PIL import Image

_IMAGE_MEAN = (0.5, 0.5, 0.5)
_IMAGE_STD = (0.5, 0.5, 0.5)


def _resize_if_necessary(image: Image.Image, shortest: int = 256,
                         longest: int = 1024) -> Image.Image:
    w, h = image.size
    ar = w / h
    if shortest <= w <= longest and shortest <= h <= longest:
        return image
    is_vert = w < h
    if w < shortest or h < shortest:
        if is_vert:
            new_w, new_h = shortest, int(shortest / ar)
        else:
            new_h, new_w = shortest, int(shortest * ar)
    else:
        if is_vert:
            new_w = longest
            new_h = int(new_w / ar)
        else:
            new_h = longest
            new_w = int(new_h * ar)
    if new_w > longest:
        new_w = longest
        new_h = int(new_w / ar)
    if new_h > longest:
        new_h = longest
        new_w = int(new_h * ar)
    return image.resize((new_w, new_h), Image.BICUBIC)


def _smart_resize(image: Image.Image, factor: int,
                  min_pixels: int = 56 * 56,
                  max_pixels: int = 28 * 28 * 1280) -> Image.Image:
    w, h = image.size
    h_bar = round(h / factor) * factor
    w_bar = round(w / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((h * w) / max_pixels)
        h_bar = max(factor, math.floor(h / beta / factor) * factor)
        w_bar = max(factor, math.floor(w / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (h * w))
        h_bar = math.ceil(h * beta / factor) * factor
        w_bar = math.ceil(w * beta / factor) * factor
    if (w_bar, h_bar) != (w, h):
        image = image.resize((w_bar, h_bar), Image.BICUBIC)
    return image


def preprocess_image(pil_image: Image.Image, spatial_patch_size: int = 16,
                     min_image_size: int = 256, max_image_size: int = 1024):
    pil_image = _resize_if_necessary(pil_image, min_image_size,
                                     max_image_size)
    pil_image = pil_image.convert("RGB")
    pil_image = _smart_resize(pil_image, factor=spatial_patch_size)
    img = np.asarray(pil_image).astype(np.float32) / 255.0
    img = (img - np.asarray(_IMAGE_MEAN, np.float32)) \
        / np.asarray(_IMAGE_STD, np.float32)
    h, w, _ = img.shape
    return img, h // spatial_patch_size, w // spatial_patch_size


class FalconPerceptionProcessor:
    def __init__(self, tokenizer, config: Optional[dict] = None):
        config = config or {}
        self.tokenizer = tokenizer
        self.spatial_patch_size = config.get("spatial_patch_size", 16)
        self.img_id = config.get("img_id", 227)
        self.img_end_id = config.get("img_end_id", 230)
        self.image_cls_token_id = config.get("image_cls_token_id", 244)
        self._image_prefix_ids = [
            self.image_cls_token_id,
            config.get("image_reg_1_token_id", 245),
            config.get("image_reg_2_token_id", 246),
            config.get("image_reg_3_token_id", 247),
            config.get("image_reg_4_token_id", 248),
        ]

    def _make_prompt(self, query: str) -> str:
        return (f"<|image|>Segment these expressions in the image:"
                f"<|start_of_query|>{query}<|REF_SEG|>")

    def apply_chat_template(self, messages=None, *args, **kwargs):
        if messages is not None:
            wrapped = []
            for m in messages:
                if isinstance(m, str):
                    wrapped.append({"role": "user",
                                    "content": self._make_prompt(m)})
                elif isinstance(m, dict) and m.get("role") == "user":
                    wrapped.append({**m, "content": self._make_prompt(
                        str(m.get("content", "")))})
                else:
                    wrapped.append(m)
            messages = wrapped
        return self.tokenizer.apply_chat_template(messages, *args, **kwargs)

    def batch_decode(self, *args, **kwargs):
        return self.tokenizer.batch_decode(*args, **kwargs)

    def decode(self, *args, **kwargs):
        return self.tokenizer.decode(*args, **kwargs)

    def _expand_image_tokens(self, token_ids: List[int],
                             grid_hws: List[List[int]]) -> List[int]:
        expanded: List[int] = []
        img_idx = 0
        for tid in token_ids:
            if tid == self.img_id and img_idx < len(grid_hws):
                gh, gw = grid_hws[img_idx]
                expanded.extend(self._image_prefix_ids)
                expanded.extend([self.img_id] * (gh * gw))
                expanded.append(self.img_end_id)
                img_idx += 1
            else:
                expanded.append(tid)
        return expanded

    def __call__(self, text=None, images=None, padding=False, **kwargs):
        kwargs.pop("return_tensors", None)
        kwargs.pop("videos", None)
        if text is None:
            text = [""]
        elif not isinstance(text, list):
            text = [text]
        if images is None or (isinstance(images, list) and not images):
            enc = self.tokenizer(text, padding=padding)
            return {"input_ids": np.asarray(enc["input_ids"]),
                    "attention_mask": np.asarray(enc["attention_mask"])}
        if not isinstance(images, list):
            images = [images]
        if "<|image|>" not in (text[0] or ""):
            text = [self._make_prompt(t) for t in text]
        pixel_list, grid_hws = [], []
        for img in images:
            if not isinstance(img, Image.Image):
                img = Image.open(img)
            pv, gh, gw = preprocess_image(img.convert("RGB"),
                                          self.spatial_patch_size)
            pixel_list.append(pv)
            grid_hws.append([gh, gw])
        all_ids = []
        off = 0
        for t in text:
            ids = self.tokenizer.encode(t, add_special_tokens=False)
            n_img = sum(1 for tid in ids if tid == self.img_id)
            all_ids.append(self._expand_image_tokens(
                ids, grid_hws[off:off + n_img]))
            off += n_img
        pad_id = getattr(self.tokenizer, "pad_token_id", None) or 0
        max_len = max(len(ids) for ids in all_ids)
        padded, masks = [], []
        for ids in all_ids:
            n = max_len - len(ids) if padding else 0
            padded.append([pad_id] * n + ids)
            masks.append([0] * n + [1] * len(ids))
        grids = np.asarray(grid_hws, np.int32)
        return {
            "input_ids": np.asarray(padded, np.int64),
            "attention_mask": np.asarray(masks, np.int64),
            "pixel_values": np.stack(pixel_list),
            "image_grid_hw": grids,
            # (t=1, h, w) for the framework's generic grid plumbing
            "image_grid_thw": np.concatenate(
                [np.ones((len(grids), 1), np.int32), grids], axis=1),
        }
