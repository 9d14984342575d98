"""GLM-4V configs — reference mlx_vlm/models/glm4v/config.py."""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from ...core.config import BaseModelConfig


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "glm4v_text"
    vocab_size: int = 151552
    hidden_size: int = 4096
    intermediate_size: int = 13696
    max_position_embeddings: int = 65536
    num_attention_heads: int = 32
    num_hidden_layers: int = 40
    num_key_value_heads: int = 2
    head_dim: Optional[int] = None
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    attention_bias: bool = True
    partial_rotary_factor: float = 0.5
    rope_scaling: Dict = field(
        default_factory=lambda: {"rope_type": "default",
                                 "mrope_section": [8, 12, 12]}
    )
    tie_word_embeddings: bool = False

    def __post_init__(self):
        if self.head_dim is None:
            self.head_dim = self.hidden_size // self.num_attention_heads


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "glm4v"
    depth: int = 24
    hidden_size: int = 1536
    intermediate_size: int = 13696
    num_heads: int = 12
    patch_size: int = 14
    image_size: int = 336
    in_channels: int = 3
    rms_norm_eps: float = 1e-5
    out_hidden_size: int = 4096
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "glm4v"
    image_token_id: int = 151363
    video_token_id: int = 151364
    vision_start_token_id: int = 151339
    vision_end_token_id: int = 151340
    eos_token_id: Optional[List[int]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {}
        )
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {}
        )
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})
