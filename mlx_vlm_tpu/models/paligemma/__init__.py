from .config import ModelConfig, TextConfig, VisionConfig
from .language import LanguageModel
from .paligemma import Model

__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig", "LanguageModel"]
