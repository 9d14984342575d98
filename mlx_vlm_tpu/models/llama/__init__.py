from .config import ModelConfig, TextConfig
from .llama import Model, STACK_PATTERNS
from .language import LanguageModel

__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel", "STACK_PATTERNS"]
