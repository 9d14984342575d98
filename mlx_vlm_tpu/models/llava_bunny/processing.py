"""Builtin Bunny processor (no remote code).

Role parity: reference mlx_vlm/models/llava_bunny/llava_bunny.py
ImageProcessor:24 (resize 384 + rescale + 0.5-normalize) and the
chat-side single `<image>` placeholder.  TPU design: the placeholder is
expanded HERE to 729 copies of image_token_index so downstream embedding
merge is a static-shape scatter (see llava_bunny.py docstring).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

IMAGE_PLACEHOLDER = "<image>"


class BunnyImageProcessor:
    def __init__(self, size=384, mean=0.5, std=0.5):
        self.size = size
        self.mean = mean
        self.std = std

    def __call__(self, images) -> np.ndarray:
        from PIL import Image

        out = []
        for im in images:
            if not isinstance(im, Image.Image):
                im = Image.fromarray(np.asarray(im))
            im = im.convert("RGB").resize(
                (self.size, self.size), Image.BICUBIC)
            a = np.asarray(im, np.float32) / 255.0
            a = (a - self.mean) / self.std
            out.append(a.transpose(2, 0, 1))  # CHW
        return np.stack(out)


class BunnyProcessor:
    def __init__(self, tokenizer, image_token_index: int = -200,
                 image_size: int = 384, patch_size: int = 14):
        self.tokenizer = tokenizer
        self.image_processor = BunnyImageProcessor(size=image_size)
        self.image_token_index = image_token_index
        self.num_patches = (image_size // patch_size) ** 2

    def apply_chat_template(self, messages, **kwargs):
        return self.tokenizer.apply_chat_template(messages, **kwargs)

    def __call__(self, text=None, images=None, videos=None, padding=True,
                 **kwargs):
        if isinstance(text, str):
            text = [text]
        batches: List[List[int]] = []
        for t in text or []:
            parts = t.split(IMAGE_PLACEHOLDER)
            ids: List[int] = []
            for i, part in enumerate(parts):
                if i:
                    ids.extend([self.image_token_index] * self.num_patches)
                if part:
                    ids.extend(
                        self.tokenizer(part, add_special_tokens=False)[
                            "input_ids"])
            batches.append(ids)
        width = max((len(b) for b in batches), default=0)
        pad = getattr(self.tokenizer, "pad_token_id", None) or 0
        input_ids = np.full((len(batches), width), pad, np.int64)
        attention_mask = np.zeros((len(batches), width), np.int64)
        for i, b in enumerate(batches):
            input_ids[i, width - len(b):] = b  # left-pad
            attention_mask[i, width - len(b):] = 1
        out = {"input_ids": input_ids, "attention_mask": attention_mask}
        if images:
            out["pixel_values"] = self.image_processor(images)
        return out
