from .config import ModelConfig, TextConfig, VisionConfig
from .qwen3_5 import Model

__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig"]
