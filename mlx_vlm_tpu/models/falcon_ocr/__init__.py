from .falcon_ocr import (LanguageModel, Model, ModelConfig, TextConfig,
                         VisionConfig)

__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig",
           "LanguageModel"]
