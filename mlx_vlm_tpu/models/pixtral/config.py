"""Pixtral configs — reference mlx_vlm/models/pixtral/config.py."""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import List, Optional

from ...core.config import BaseModelConfig
from ..llama.config import TextConfig as _LlamaText


@dataclass
class TextConfig(_LlamaText):
    model_type: str = "mistral"
    rope_theta: float = 1000000000.0


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "pixtral"
    num_hidden_layers: int = 24
    hidden_size: int = 1024
    head_dim: int = 64
    intermediate_size: int = 4096
    num_attention_heads: int = 16
    image_size: int = 1024
    patch_size: int = 16
    projection_dim: int = 768
    num_channels: int = 3
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig = field(default_factory=TextConfig)
    vision_config: VisionConfig = field(default_factory=VisionConfig)
    model_type: str = "pixtral"
    ignore_index: int = -100
    image_token_index: Optional[int] = None
    image_token_id: Optional[int] = 10
    vision_feature_select_strategy: str = "full"
    vision_feature_layer: int = -1
    projector_hidden_act: str = "gelu"
    vocab_size: int = 131072
    eos_token_id: Optional[List[int]] = None

    def __post_init__(self):
        if self.image_token_index is None:
            self.image_token_index = self.image_token_id

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
