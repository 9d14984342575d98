from .config import DetectorConfig, ModelConfig, TrackerConfig
from .processing import (
    DetectionResult,
    Sam3Predictor,
    Sam3Processor,
    SimpleTracker,
    nms,
    track_video,
)
from .sam3 import Model

__all__ = [
    "Model", "ModelConfig", "DetectorConfig", "TrackerConfig",
    "Sam3Processor", "Sam3Predictor", "DetectionResult", "SimpleTracker",
    "nms", "track_video",
]
