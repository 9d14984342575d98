"""ERNIE-4.5-MoE (text-only) — the ernie4_5_moe_vl decoder without the
tower (single text expert group; reference mlx_vlm/models/ernie4_5_moe/).
"""

from __future__ import annotations

from ..ernie4_5_moe_vl.config import ModelConfig as _VLConfig
from ..ernie4_5_moe_vl.ernie4_5_moe_vl import Model as _VLModel
from ..ernie4_5_moe_vl.language import LanguageModel


class ModelConfig(_VLConfig):
    @classmethod
    def from_dict(cls, params: dict):
        cfg = _VLConfig.from_dict(dict(params))
        cfg.model_type = "ernie4_5_moe"
        return cfg


class Model(_VLModel):
    pass
