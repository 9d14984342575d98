from .youtu_vl import Model, ModelConfig, TextConfig, VisionConfig

__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig"]
