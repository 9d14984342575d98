from .config import ModelConfig, TextConfig
from .language import LanguageModel, Qwen3NextCache
from .qwen3_next import Model

__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel", "Qwen3NextCache"]
