from .config import ModelConfig, TextConfig, VisionConfig
from .glm4v_moe import LanguageModel, Model

__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig",
           "LanguageModel"]
