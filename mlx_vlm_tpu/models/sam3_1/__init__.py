"""SAM 3.1 (promptable concept segmentation, Object Multiplex lineage).

Role parity: reference mlx_vlm/models/sam3_1 — the SAM 3 DETR detection
pipeline with a TriViTDetNeck (three parallel FPN heads over one ViT
backbone at scales [4x, 2x, 1x]; detection uses `neck.convs.*`,
interactive/propagation heads serve the multiplex tracker,
vision.py:18), a geometry encoder extended with point-prompt
projections, and no 0.5x level to trim (sam3_1.py DetectorModel:35).

TPU design: rides the repo sam3 detector (text encoder, DETR encoder/
decoder, geometry, mask decoder, dot-product scoring) — the SAM 3.1
checkpoint's `neck.convs.*` detection head remaps onto the shared FPN
at sanitize, the extra heads load under their own names (consumed by
the tracker path as it lands), and detect() keeps all three scales.
The Sam3Predictor / detect() user pipeline works unchanged
(generate/detection.py routes model_type sam3_1 -> this module).
"""

from __future__ import annotations

import numpy as np

from ..sam3.config import ModelConfig as _Sam3Config
from ..sam3.processing import Sam3Predictor, Sam3Processor  # noqa: F401
from ..sam3.sam3 import Model as _Sam3Model


class ModelConfig(_Sam3Config):
    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params.setdefault("model_type", "sam3_1")
        det = dict(params.get("detector_config") or {})
        vc = dict(det.get("vision_config") or {})
        # SAM 3.1 necks run 3 scales (no 0.5x) — reference vision.py:18
        vc.setdefault("scale_factors", [4.0, 2.0, 1.0])
        det["vision_config"] = vc
        params["detector_config"] = det
        return super().from_dict(params)


class Model(_Sam3Model):
    CONFIG_CLS = ModelConfig
    trim_coarsest = False  # 3 scales, keep them all

    def sanitize(self, weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            # detection FPN head onto the shared neck layout; the
            # interactive/propagation heads keep their own namespaces
            k = k.replace(".vision_encoder.neck.convs.",
                          ".vision_encoder.neck.fpn_layers.")
            k = k.replace(".neck.interactive_convs.",
                          ".neck.interactive_layers.")
            k = k.replace(".neck.propagation_convs.",
                          ".neck.propagation_layers.")
            out[k] = v
        return super().sanitize(out)


__all__ = ["Model", "ModelConfig", "Sam3Predictor", "Sam3Processor"]
