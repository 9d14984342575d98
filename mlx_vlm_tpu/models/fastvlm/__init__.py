from .fastvlm import Model, ModelConfig, TextConfig
from .vision import VisionConfig, VisionModel

__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig",
           "VisionModel"]
