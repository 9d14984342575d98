from .granite_vision import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
