from .florence2 import Model, ModelConfig
from .language import LanguageModel, TextConfig
from .vision import DaViTTower, VisionConfig

__all__ = ["Model", "ModelConfig", "LanguageModel", "TextConfig",
           "DaViTTower", "VisionConfig"]
