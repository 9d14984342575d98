from .audio import AudioModel
from .config import AudioConfig, ModelConfig, TextConfig, VisionConfig
from .qwen3_omni_moe import Model

__all__ = [
    "Model", "ModelConfig", "TextConfig", "VisionConfig", "AudioConfig",
    "AudioModel",
]
