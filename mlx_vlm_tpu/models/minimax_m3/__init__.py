"""MiniMax-M3 (text-only) — the minimax_m3_vl decoder without the tower.

Role parity: reference mlx_vlm/models/minimax_m3/ (re-exports the VL
LanguageModel and MoE sanitizers for flat text checkpoints).
"""

from __future__ import annotations

from ..minimax_m3_vl.config import ModelConfig as _VLConfig
from ..minimax_m3_vl.language import LanguageModel
from ..minimax_m3_vl.minimax_m3_vl import Model as _VLModel


class ModelConfig(_VLConfig):
    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params.setdefault("model_type", "minimax_m3")
        cfg = _VLConfig.from_dict(params)
        cfg.model_type = "minimax_m3"
        return cfg


class Model(_VLModel):
    pass
