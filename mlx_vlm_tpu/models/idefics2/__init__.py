from .idefics2 import Model, ModelConfig, PerceiverConfig, TextConfig, \
    VisionConfig

__all__ = ["Model", "ModelConfig", "PerceiverConfig", "TextConfig",
           "VisionConfig"]
