"""GLM-4.5V (MoE VLM) configs.

Role parity: reference mlx_vlm/models/glm4v_moe/config.py — TextConfig
carries the glm4_moe expert fields plus an mrope section table
(rope_parameters/rope_scaling), VisionConfig matches glm4v.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from ...core.config import BaseModelConfig
from ..glm4_moe.config import TextConfig as _MoEText
from ..glm4v.config import VisionConfig


@dataclass
class TextConfig(_MoEText):
    model_type: str = "glm4v_moe_text"
    rope_parameters: Optional[Dict] = None
    rope_scaling: Optional[Dict] = field(
        default_factory=lambda: {"rope_type": "default",
                                 "mrope_section": [8, 12, 12]}
    )

    def __post_init__(self):
        super().__post_init__()
        if self.rope_parameters and not (
                self.rope_scaling and "mrope_section" in self.rope_scaling):
            self.rope_scaling = self.rope_parameters

    @property
    def mrope_section(self):
        sections = list((self.rope_scaling or {}).get(
            "mrope_section", [8, 12, 12]))
        slots = int(self.head_dim * self.partial_rotary_factor) // 2
        total = sum(sections)
        # some configs write sections in rotary-dim (or head-dim) units;
        # normalise to angle-slot units preserving the t/h/w ratios
        if total != slots and total % slots == 0:
            scale = total // slots
            if all(s % scale == 0 for s in sections):
                sections = [s // scale for s in sections]
        return sections


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "glm4v_moe"
    image_token_id: int = 151363
    video_token_id: int = 151364
    vision_start_token_id: int = 151339
    vision_end_token_id: int = 151340
    eos_token_id: Optional[List[int]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {})
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {})
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})
