from .language import LanguageModel, TextConfig
from .moondream3 import Model, ModelConfig, VisionConfig

__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig",
           "LanguageModel"]
