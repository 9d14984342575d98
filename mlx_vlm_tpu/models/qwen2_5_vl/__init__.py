from .config import ModelConfig, TextConfig, VisionConfig
from .qwen2_5_vl import Model, STACK_PATTERNS
from .vision import VisionModel

__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig", "VisionModel", "STACK_PATTERNS"]
