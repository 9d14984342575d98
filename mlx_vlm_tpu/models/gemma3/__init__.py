from .config import ModelConfig, TextConfig, VisionConfig
from .gemma3 import Model, STACK_PATTERNS
from .language import LanguageModel

__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig", "LanguageModel", "STACK_PATTERNS"]
