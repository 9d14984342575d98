from .glm4 import Model, ModelConfig, TextConfig

__all__ = ["Model", "ModelConfig", "TextConfig"]
