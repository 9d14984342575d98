from .exaone import Model, ModelConfig, TextConfig

__all__ = ["Model", "ModelConfig", "TextConfig"]
