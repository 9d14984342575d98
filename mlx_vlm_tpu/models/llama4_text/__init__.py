"""Llama-4 text-only — the llama4 iRoPE/MoE decoder without the tower.

Role parity: reference mlx_vlm/models/llama4_text/ (standalone
Llama4TextDecoder; flat text checkpoints with model.layers.* keys).
"""

from __future__ import annotations

from ..llama4.config import ModelConfig as _VLConfig
from ..llama4.language import LanguageModel
from ..llama4.llama4 import Model as _VLModel


class ModelConfig(_VLConfig):
    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        if "text_config" not in params:
            params = {"text_config": params,
                      "model_type": "llama4_text",
                      "eos_token_id": params.get("eos_token_id")}
        cfg = _VLConfig.from_dict(params)
        cfg.model_type = "llama4_text"
        return cfg


class Model(_VLModel):
    pass
