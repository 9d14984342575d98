"""Xiaomi MiMo — qwen2-style decoder whose checkpoints carry MTP layers.

Role parity: reference mlx_vlm/models/mimo/language.py — standard llama
attention/MLP; sanitize drops model.mtp_layers.* (multi-token-prediction
heads used only at training, :145).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..llama.config import TextConfig as _LlamaText
from ..llama.language import LanguageModel
from ..llama.llama import Model as _LlamaModel


@dataclass
class ModelConfig(_LlamaText):
    model_type: str = "mimo"


TextConfig = ModelConfig


class Model(_LlamaModel):
    @staticmethod
    def sanitize(weights: dict) -> dict:
        weights = {k: v for k, v in weights.items()
                   if not k.startswith(("model.mtp_layers.",
                                        "mtp_layers."))}
        return _LlamaModel.sanitize(weights)
