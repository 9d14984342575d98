from .deepseek_v2 import Model, ModelConfig, STACK_PATTERNS

__all__ = ["Model", "ModelConfig", "STACK_PATTERNS"]
