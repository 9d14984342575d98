"""/v1/detection server route.

Role parity: the reference ships detection as user pipelines
(mlx_vlm/models/sam3/generate.py predictors + annotators); here the same
predictors are additionally exposed over HTTP: POST /v1/detection with a
base64 image (+ optional concept prompt / boxes / threshold) returns
boxes, scores, labels, class names and, for mask families, RLE-free
binary masks (optionally omitted).
"""

from __future__ import annotations

import base64
import io
import threading
from typing import Optional

from ..generate.detection import detect, load_detector, result_to_dict


class DetectionService:
    """Lazy-loaded detector + lock (the predictor jits are not re-entrant
    with respect to HBM residency on small chips)."""

    def __init__(self, model_path: str, threshold: Optional[float] = None):
        self.model_path = model_path
        self.threshold = threshold
        self._predictor = None
        self._lock = threading.Lock()

    def predictor(self):
        with self._lock:
            if self._predictor is None:
                self._predictor = load_detector(self.model_path,
                                                threshold=self.threshold)
            return self._predictor

    def run(self, image, prompt=None, boxes=None, threshold=None):
        with self._lock:
            return detect(self._predictor, image, text_prompt=prompt,
                          boxes=boxes, threshold=threshold)


def _decode_image(body: dict):
    from PIL import Image

    b64 = body.get("image") or body.get("image_b64")
    if not b64:
        raise ValueError("missing 'image' (base64-encoded)")
    if isinstance(b64, str) and b64.startswith("data:"):
        b64 = b64.split(",", 1)[1]
    return Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")


def detection_endpoint(handler, body: dict, service: DetectionService):
    img = _decode_image(body)
    service.predictor()
    import numpy as np

    boxes = body.get("boxes")
    res = service.run(
        img,
        prompt=body.get("prompt") or body.get("text_prompt"),
        boxes=np.asarray(boxes, np.float32)[None] if boxes else None,
        threshold=body.get("threshold"),
    )
    out = result_to_dict(res)
    if not body.get("include_masks", False):
        out.pop("masks", None)
    handler.send_json({"object": "detection.result", **out})
