"""Gemma 3 configs — reference mlx_vlm/models/gemma3/config.py."""

from __future__ import annotations

import inspect
from dataclasses import dataclass
from typing import Dict, List, Optional, Union

from ...core.config import BaseModelConfig
from ..clip_vision import VisionConfig as _ClipVisionConfig


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "gemma3_text"
    hidden_size: int = 2560
    num_hidden_layers: int = 34
    intermediate_size: int = 10240
    num_attention_heads: int = 8
    head_dim: int = 256
    rms_norm_eps: float = 1e-6
    vocab_size: int = 262208
    num_key_value_heads: int = 4
    rope_global_base_freq: float = 1_000_000.0
    rope_local_base_freq: float = 10_000.0
    rope_traditional: bool = False
    query_pre_attn_scalar: float = 256
    sliding_window: int = 1024
    rope_scaling: Optional[Dict[str, Union[float, List[float]]]] = None
    mm_tokens_per_image: int = 256
    sliding_window_pattern: int = 6
    max_position_embeddings: int = 131072
    layer_types: Optional[List[str]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        # HF config.json names the global-layer base "rope_theta"
        # (reference reads rope_global_base_freq; both spellings exist)
        if "rope_theta" in params and "rope_global_base_freq" not in params:
            params["rope_global_base_freq"] = params["rope_theta"]
        return super().from_dict(params)


@dataclass
class VisionConfig(_ClipVisionConfig):
    model_type: str = "siglip_vision_model"
    num_hidden_layers: int = 27
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_attention_heads: int = 16
    image_size: int = 896
    patch_size: int = 14
    layer_norm_eps: float = 1e-6


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "gemma3"
    vocab_size: int = 257152
    ignore_index: int = -100
    image_token_index: int = 262144
    hidden_size: int = 2048
    pad_token_id: int = 0
    eos_token_id: Optional[List[int]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {}
        )
        text = dict(params.get("text_config", {}) or {})
        # HF stores mm_tokens_per_image at the config root; the projector
        # reads it from text_config (reference config.py keeps it there)
        if "mm_tokens_per_image" in params and "mm_tokens_per_image" not in text:
            text["mm_tokens_per_image"] = params["mm_tokens_per_image"]
        params["text_config"] = TextConfig.from_dict(text)
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})
