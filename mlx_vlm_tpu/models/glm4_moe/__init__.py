from .config import ModelConfig, TextConfig
from .glm4_moe import Model
from .language import LanguageModel

__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel"]
