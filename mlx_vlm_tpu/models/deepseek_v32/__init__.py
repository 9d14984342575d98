from .deepseek_v32 import LanguageModel, Model, ModelConfig

__all__ = ["Model", "ModelConfig", "LanguageModel"]
