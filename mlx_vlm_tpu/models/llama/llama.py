"""Llama top-level (text-only) model with the framework's uniform interface.

Role parity: reference mlx_vlm/models/llama/.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax

from .config import ModelConfig
from .language import LanguageModel

STACK_PATTERNS = ("language_model.model.layers",)


def text_position_ids(input_ids: np.ndarray, attention_mask=None):
    """[3,B,S] positions + deltas for plain sequential rope (left-pad aware)."""
    B, S = np.asarray(input_ids).shape
    if attention_mask is not None:
        am = np.asarray(attention_mask)
        pos = np.cumsum(am, axis=-1) - 1
        pos = np.where(am == 0, 0, pos)
        deltas = pos.max(axis=-1, keepdims=True) + 1 - S
    else:
        pos = np.broadcast_to(np.arange(S), (B, S))
        deltas = np.zeros((B, 1), np.int64)
    return (
        np.broadcast_to(pos[None], (3, B, S)).astype(np.int32).copy(),
        deltas.astype(np.int32),
    )


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config)

    def get_input_embeddings(self, params, input_ids, pixel_values=None, **aux):
        return self.language_model.embed(params["language_model"], input_ids)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache, position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return text_position_ids(input_ids, attention_mask)

    def vision_aux_inputs(self, grid_thw):
        return {}

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
