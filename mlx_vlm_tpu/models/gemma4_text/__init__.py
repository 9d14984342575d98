from .gemma4_text import LanguageModel, Model, ModelConfig, TextConfig

__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel"]
