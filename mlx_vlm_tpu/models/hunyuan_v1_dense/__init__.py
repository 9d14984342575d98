from .hunyuan_v1_dense import LanguageModel, Model, ModelConfig, TextConfig

__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel"]
