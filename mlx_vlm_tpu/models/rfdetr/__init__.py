from .config import ModelConfig, DINOv2Config, TransformerConfig
from .processing import (
    COCO_CLASSES,
    DetectionResult,
    RFDETRPredictor,
    RFDETRProcessor,
    postprocess,
)
from .rfdetr import Model

__all__ = [
    "Model", "ModelConfig", "DINOv2Config", "TransformerConfig",
    "RFDETRProcessor", "RFDETRPredictor", "DetectionResult",
    "postprocess", "COCO_CLASSES",
]
