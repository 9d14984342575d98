from .config import ModelConfig, TextConfig, VisionConfig
from .pixtral import Model, STACK_PATTERNS
from .vision import VisionModel

__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig", "VisionModel", "STACK_PATTERNS"]
