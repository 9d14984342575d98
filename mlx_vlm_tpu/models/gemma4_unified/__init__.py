from .gemma4_unified import Model, ModelConfig, VisionConfig

__all__ = ["Model", "ModelConfig", "VisionConfig"]
