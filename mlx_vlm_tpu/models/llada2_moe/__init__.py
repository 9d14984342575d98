from .llada2_moe import Model, ModelConfig, TextConfig

__all__ = ["Model", "ModelConfig", "TextConfig"]
