"""Qwen3.5 configs — reference mlx_vlm/models/qwen3_5/config.py.

The text decoder is the qwen3_next hybrid (3 GatedDeltaNet + 1 gated
full-attention layer per interval) with M-RoPE over the rotary slice
(`rope_parameters`: mrope_section + partial_rotary_factor); the vision
tower is qwen3_vl's with deepstack disabled (:45-58).
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import List, Optional, Union

from ...core.config import BaseModelConfig
from ..qwen3_next.config import ModelConfig as _NextConfig
from ..qwen3_vl.config import VisionConfig as _Qwen3VLVisionConfig

QWEN_CHAT_EOS_TOKEN_ID = 248046


@dataclass
class VisionConfig(_Qwen3VLVisionConfig):
    model_type: str = "qwen3_5"

    def __post_init__(self):
        # deepstack is disabled for qwen3.5 (reference config.py:50-58)
        self.deepstack_visual_indexes = []


@dataclass
class TextConfig(_NextConfig):
    model_type: str = "qwen3_5_text"

    @classmethod
    def from_dict(cls, d: dict) -> "TextConfig":
        d = dict(d)
        rp = d.pop("rope_parameters", None) or {}
        if rp:
            if "type" not in rp and "rope_type" in rp:
                rp["type"] = rp.pop("rope_type")
            d.setdefault("rope_theta", rp.get("rope_theta", 100000))
            d.setdefault("partial_rotary_factor",
                         rp.get("partial_rotary_factor", 0.25))
            d.setdefault("rope_scaling", {
                "type": rp.get("type", "default"),
                "mrope_section": rp.get("mrope_section", [11, 11, 10]),
            })
        else:
            d.setdefault("rope_scaling", {
                "type": "default", "mrope_section": [11, 11, 10]})
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in d.items() if k in allowed})


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "qwen3_5"
    ignore_index: int = -100
    image_token_id: int = 248056
    video_token_id: int = 248057
    vision_start_token_id: int = 248045
    eos_token_id: Optional[Union[int, List[int]]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {})
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {})
        params.setdefault("image_token_id",
                          params.pop("image_token_index", 248056) or 248056)
        params.setdefault("video_token_id",
                          params.pop("video_token_index", 248057) or 248057)
        allowed = inspect.signature(cls).parameters
        cfg = cls(**{k: v for k, v in params.items() if k in allowed})
        # the chat EOS rides along even when config names another id
        # (reference resolve_qwen_eos_token_id:23)
        eos = cfg.eos_token_id
        if eos is None:
            eos = cfg.text_config.eos_token_id
        vals = [int(e) for e in (eos if isinstance(eos, list) else
                                 [eos] if eos is not None else [])]
        if vals and QWEN_CHAT_EOS_TOKEN_ID not in vals:
            vals.append(QWEN_CHAT_EOS_TOKEN_ID)
        cfg.eos_token_id = vals or None
        return cfg
