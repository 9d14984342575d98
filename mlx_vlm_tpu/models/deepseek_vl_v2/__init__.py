from .deepseek_vl_v2 import Model, ModelConfig, TextConfig, VisionConfig

__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig"]
