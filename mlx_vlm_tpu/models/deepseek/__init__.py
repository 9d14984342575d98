from .deepseek import LanguageModel, Model, ModelConfig, TextConfig

__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel"]
