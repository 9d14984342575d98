from .moondream2 import Model, ModelConfig, STACK_PATTERNS
from .language import LanguageModel, TextConfig
from .vision import MoondreamVisionTower, VisionConfig

__all__ = ["Model", "ModelConfig", "STACK_PATTERNS", "LanguageModel",
           "TextConfig", "MoondreamVisionTower", "VisionConfig"]
