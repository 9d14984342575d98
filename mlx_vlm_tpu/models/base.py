"""Shared model substrate.

Role parity: reference `mlx_vlm/models/base.py` — LanguageModelOutput:55,
InputEmbeddingsFeatures:65, scaled_dot_product_attention:292,
BaseModelConfig:99 (ours lives in core/config.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax

from ..core.config import BaseModelConfig  # re-export  # noqa: F401

__all__ = ["LanguageModelOutput", "InputEmbeddingsFeatures", "BaseModelConfig"]


@dataclasses.dataclass
class LanguageModelOutput:
    logits: jax.Array
    cross_attention_states: Optional[Any] = None
    hidden_states: Optional[Any] = None


@dataclasses.dataclass
class InputEmbeddingsFeatures:
    """Bundle returned by Model.get_input_embeddings (reference base.py:65)."""

    inputs_embeds: jax.Array
    position_ids: Optional[Any] = None
    rope_deltas: Optional[Any] = None
    per_layer_inputs: Optional[Any] = None
    extras: Optional[dict] = None
