"""Builtin Florence-2 processor (offline fallback).

Role parity: reference models/florence2/processing_florence2.py — that file
patches HF's remote-code Florence2Processor; this builtin covers the same
contract without network access: 768x768 resize + ImageNet normalization,
bare task-prompt tokenization (no image placeholder ids — the model routes
image features separately, florence2.py get_input_embeddings).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class Florence2ImageProcessor:
    def __init__(self, size: int = 768):
        self.size = size

    def __call__(self, images) -> np.ndarray:
        from PIL import Image

        out = []
        for im in images:
            if not isinstance(im, Image.Image):
                im = Image.fromarray(np.asarray(im))
            im = im.convert("RGB").resize((self.size, self.size),
                                          Image.BICUBIC)
            arr = np.asarray(im, np.float32) / 255.0
            arr = (arr - _IMAGENET_MEAN) / _IMAGENET_STD
            out.append(arr.transpose(2, 0, 1))  # NCHW like HF
        return np.stack(out)


class Florence2Processor:
    """tokenizer + image processor with the HF processor call surface."""

    def __init__(self, tokenizer, image_size: int = 768):
        self.tokenizer = tokenizer
        self.image_processor = Florence2ImageProcessor(image_size)

    def apply_chat_template(self, messages, **kwargs):
        # florence prompts are bare task strings; pass the last through
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
        out = {"input_ids": np.asarray(enc["input_ids"], np.int64)}
        if "attention_mask" in enc:
            out["attention_mask"] = np.asarray(enc["attention_mask"])
        if images:
            out["pixel_values"] = self.image_processor(images)
        return out
