from .config import ModelConfig, TextConfig, VisionConfig  # noqa: F401
from .zaya1_vl import Model  # noqa: F401
