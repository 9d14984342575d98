from .config import ModelConfig, TextConfig, VisionConfig
from .glm4v import LanguageModel, Model, VisionModel

__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig",
           "LanguageModel", "VisionModel"]
