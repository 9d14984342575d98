from .qwen3_vl_moe import Model, ModelConfig, TextConfig, VisionConfig

__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig"]
