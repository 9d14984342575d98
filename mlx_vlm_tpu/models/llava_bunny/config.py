"""Bunny (llava-qwen2 / bunny-llama) configs.

Role parity: reference mlx_vlm/models/llava_bunny/config.py — text config
lives at the ROOT of config.json (no nested text_config), qwen2-flavored
defaults (attention bias on, rope_theta 1e6, tied embeddings), SigLIP
tower defaults.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass
from typing import List, Optional

from ...core.config import BaseModelConfig
from ..clip_vision import VisionConfig
from ..llama.config import TextConfig

_TEXT_DEFAULTS = dict(
    attention_bias=True,
    rope_theta=1_000_000.0,
    tie_word_embeddings=True,
    max_position_embeddings=4096,
)

_VISION_DEFAULTS = dict(
    model_type="siglip_vision_model",
    num_hidden_layers=27,
    hidden_size=1152,
    intermediate_size=4304,
    num_attention_heads=16,
    image_size=384,
    patch_size=14,
    layer_norm_eps=1e-6,
)


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "llava-qwen2"
    hidden_size: int = 0
    mm_hidden_size: int = 1152
    mm_projector_type: str = "mlp2x_gelu"
    ignore_index: int = -100
    image_token_index: int = -200
    vocab_size: int = 151936
    eos_token_id: Optional[List[int]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        if not params.get("text_config"):
            text = {
                k: v for k, v in params.items() if k != "vision_config"
            }
            params["text_config"] = text
        tc = dict(_TEXT_DEFAULTS)
        tc.update(params["text_config"])
        # bunny checkpoints use linear rope_scaling or none; llama config
        # accepts both
        params["text_config"] = TextConfig.from_dict(tc)
        vc = dict(_VISION_DEFAULTS)
        vc.update(params.get("vision_config", {}) or {})
        params["vision_config"] = VisionConfig.from_dict(vc)
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})
