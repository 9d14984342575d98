from .config import ModelConfig, TextConfig, VisionConfig
from .language import LanguageModel
from .llama4 import Model
from .vision import VisionModel

__all__ = [
    "Model", "ModelConfig", "TextConfig", "VisionConfig",
    "LanguageModel", "VisionModel",
]
