"""Llama-4 configs — reference mlx_vlm/models/llama4/config.py."""

from __future__ import annotations

import inspect
from dataclasses import dataclass
from typing import List, Optional

from ...core.config import BaseModelConfig


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "llama4_text"
    hidden_size: int = 5120
    intermediate_size: int = 8192
    intermediate_size_mlp: int = 16384
    num_attention_heads: int = 40
    num_key_value_heads: int = 8
    num_hidden_layers: int = 48
    head_dim: int = 128
    rms_norm_eps: float = 1e-5
    vocab_size: int = 202048
    rope_theta: float = 500000.0
    rope_scaling: Optional[dict] = None
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 10485760
    num_experts_per_tok: int = 1
    num_local_experts: int = 16
    use_qk_norm: bool = True
    attention_chunk_size: int = 8192
    attention_bias: bool = False
    interleave_moe_layer_step: int = 1
    attn_temperature_tuning: int = 4
    floor_scale: float = 8192
    attn_scale: float = 0.1

    def __post_init__(self):
        if self.num_key_value_heads is None:
            self.num_key_value_heads = self.num_attention_heads
        if self.num_hidden_layers % 4 != 0:
            raise ValueError("llama4 requires num_hidden_layers % 4 == 0")
        if 4 % self.interleave_moe_layer_step != 0:
            raise ValueError("interleave_moe_layer_step must divide 4")


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "llama4_vision_model"
    hidden_size: int = 1408
    image_size: int = 336
    intermediate_size: int = 5632
    norm_eps: float = 1e-5
    num_attention_heads: int = 16
    num_channels: int = 3
    num_hidden_layers: int = 34
    patch_size: int = 14
    pixel_shuffle_ratio: float = 0.5
    projector_input_dim: int = 4096
    projector_output_dim: int = 4096
    rope_theta: float = 10000.0
    vision_feature_layer: int = -1
    vision_feature_select_strategy: str = "default"
    vision_output_dim: int = 4096


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "llama4"
    ignore_index: int = -100
    image_token_id: int = 200092
    image_token_index: Optional[int] = None
    eos_token_id: Optional[List[int]] = None

    def __post_init__(self):
        if self.image_token_index is None:
            self.image_token_index = self.image_token_id

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
