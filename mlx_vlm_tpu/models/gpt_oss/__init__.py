from .gpt_oss import Model, ModelConfig, TextConfig
from .language import LanguageModel

__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel"]
