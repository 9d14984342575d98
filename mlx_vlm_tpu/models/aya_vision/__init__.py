from .aya_vision import Model, ModelConfig, TextConfig, VisionConfig

__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig"]
