from ..kimi_vl.kimi_vl import LanguageModel
from .kimi_k25 import Model, ModelConfig, MoonViTK25

__all__ = ["Model", "ModelConfig", "MoonViTK25", "LanguageModel"]
