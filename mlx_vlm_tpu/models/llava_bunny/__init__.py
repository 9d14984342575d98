from ..clip_vision import VisionConfig
from ..llama.config import TextConfig
from .config import ModelConfig
from .llava_bunny import Model, STACK_PATTERNS

__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig", "STACK_PATTERNS"]
