from .internvl_chat import Model, ModelConfig, TextConfig, VisionConfig

__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig"]
