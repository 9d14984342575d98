from .ministral3 import LanguageModel, Model, ModelConfig, TextConfig

__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel"]
