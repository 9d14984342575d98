"""Builtin Moondream2 processor (offline fallback).

Role parity: reference moondream2 checkpoints ship remote-code processors;
this builtin covers the single-crop path: 378x378 resize + [-1, 1]
normalization, and id layout [BOS | vision-token room | prompt] matching
Model.get_input_embeddings (moondream2.py:58 — image features land after
BOS; the text tail starts at 1 + n_vision_tokens).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


class MoondreamImageProcessor:
    def __init__(self, crop_size: int = 378):
        self.crop_size = crop_size

    def __call__(self, images) -> np.ndarray:
        from PIL import Image

        out = []
        for im in images:
            if not isinstance(im, Image.Image):
                im = Image.fromarray(np.asarray(im))
            im = im.convert("RGB").resize((self.crop_size, self.crop_size),
                                          Image.BICUBIC)
            arr = np.asarray(im, np.float32) / 255.0
            arr = (arr - 0.5) / 0.5
            out.append(arr)  # HWC — the tower patchifies channels-last
        return np.stack(out)


class MoondreamProcessor:
    def __init__(self, tokenizer, crop_size: int = 378,
                 patch_size: int = 14, bos_token_id: Optional[int] = None):
        self.tokenizer = tokenizer
        self.image_processor = MoondreamImageProcessor(crop_size)
        self.n_vision = (crop_size // patch_size) ** 2
        self.bos_token_id = (bos_token_id
                             if bos_token_id is not None
                             else getattr(tokenizer, "bos_token_id", None)
                             or 0)

    def apply_chat_template(self, messages, **kwargs):
        if isinstance(messages, str):
            return messages
        last = messages[-1] if messages else ""
        if isinstance(last, dict):
            content = last.get("content", "")
            if isinstance(content, list):
                content = "".join(p.get("text", "") for p in content
                                  if isinstance(p, dict))
            return content
        return str(last)

    def __call__(self, text=None, images=None, videos=None, **kwargs):
        if isinstance(text, (list, tuple)):
            text = text[0]
        enc = self.tokenizer(str(text), return_tensors="np")
        ids = np.asarray(enc["input_ids"], np.int64).reshape(-1)
        if images:
            ids = np.concatenate([
                np.asarray([self.bos_token_id], np.int64),
                np.zeros(self.n_vision, np.int64),  # room for image tokens
                ids,
            ])
            out = {"input_ids": ids[None],
                   "pixel_values": self.image_processor(images)}
        else:
            out = {"input_ids": ids[None]}
        out["attention_mask"] = np.ones_like(out["input_ids"])
        return out
