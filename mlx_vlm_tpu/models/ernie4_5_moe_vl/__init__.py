from .config import ModelConfig, TextConfig, VisionConfig
from .ernie4_5_moe_vl import Model, STACK_PATTERNS
from .language import LanguageModel
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
