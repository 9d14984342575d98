from .audio import AudioConfig, AudioModel
from .gemma3n import Model, ModelConfig
from .vision import VisionConfig, VisionTower

__all__ = ["Model", "ModelConfig", "AudioModel", "AudioConfig",
           "VisionTower", "VisionConfig"]
