from .mllama import Model, ModelConfig, TextConfig, VisionConfig, STACK_PATTERNS

__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig", "STACK_PATTERNS"]
