from .config import ModelConfig, TextConfig, VisionConfig
from .language import LanguageModel
from .minimax_m3_vl import Model, STACK_PATTERNS
from .vision import VisionModel

__all__ = [
    "Model",
    "ModelConfig",
    "TextConfig",
    "VisionConfig",
    "LanguageModel",
    "VisionModel",
    "STACK_PATTERNS",
]
