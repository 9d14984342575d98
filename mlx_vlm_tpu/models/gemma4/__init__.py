from .gemma4 import Model, ModelConfig, VisionConfig

__all__ = ["Model", "ModelConfig", "VisionConfig"]
