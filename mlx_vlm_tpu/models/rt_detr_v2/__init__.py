from .config import ModelConfig, RTDetrResNetConfig
from .processing import (
    DetectionResult,
    RTDetrV2Predictor,
    RTDetrV2Processor,
)
from .rt_detr_v2 import Model

__all__ = [
    "Model", "ModelConfig", "RTDetrResNetConfig",
    "RTDetrV2Processor", "RTDetrV2Predictor", "DetectionResult",
]
