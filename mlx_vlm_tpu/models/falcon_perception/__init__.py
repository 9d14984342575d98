from .config import ModelConfig, TextConfig, VisionConfig  # noqa: F401
from .falcon_perception import Model  # noqa: F401
