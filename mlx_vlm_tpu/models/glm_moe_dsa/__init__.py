from .glm_moe_dsa import LanguageModel, Model, ModelConfig

__all__ = ["Model", "ModelConfig", "LanguageModel"]
