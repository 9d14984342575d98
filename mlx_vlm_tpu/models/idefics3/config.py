"""Idefics3 / SmolVLM configs — reference mlx_vlm/models/idefics3/config.py."""

from __future__ import annotations

import inspect
from dataclasses import dataclass
from typing import List, Optional, Union

from ...core.config import BaseModelConfig
from ..clip_vision import VisionConfig as _ClipVisionConfig
from ..llama.config import TextConfig


@dataclass
class VisionConfig(_ClipVisionConfig):
    model_type: str = "idefics3_vision"
    hidden_size: int = 1152
    num_hidden_layers: int = 27
    intermediate_size: int = 4304
    num_attention_heads: int = 16
    image_size: int = 384
    patch_size: int = 14


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "idefics3"
    image_token_id: int = 128257
    image_token_index: Optional[int] = None
    scale_factor: int = 2
    vocab_size: int = 128259
    eos_token_id: Optional[Union[int, List[int]]] = None

    def __post_init__(self):
        if self.image_token_index is not None:
            self.image_token_id = self.image_token_index

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {}
        )
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {}
        )
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})
