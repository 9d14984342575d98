from .config import ModelConfig, TextConfig
from .qwen2_moe import Model, STACK_PATTERNS
from .language import MoELanguageModel

__all__ = ["Model", "ModelConfig", "TextConfig", "MoELanguageModel", "STACK_PATTERNS"]
