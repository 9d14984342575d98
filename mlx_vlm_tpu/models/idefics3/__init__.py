from .config import ModelConfig, TextConfig, VisionConfig
from .idefics3 import Model, STACK_PATTERNS

__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig", "STACK_PATTERNS"]
