from .deepseekocr import Model, ModelConfig
from .sam import SAMConfig, SAMEncoder

__all__ = ["Model", "ModelConfig", "SAMEncoder", "SAMConfig"]
