from .lfm2 import LanguageModel, Lfm2Cache, Model, ModelConfig, TextConfig

__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel", "Lfm2Cache"]
