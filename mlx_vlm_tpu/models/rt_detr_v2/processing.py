"""RT-DETRv2 preprocessing + detection predictor.

Role parity: reference mlx_vlm/models/rt_detr_v2/
{processing_rt_detr_v2,generate}.py — bilinear resize to image_size,
rescale 1/255, NO mean/std normalization by default (silently adding it
is the classic way to get subtly-wrong boxes), and a vectorized top-K
focal-loss decode producing DetectionResult (shared with rfdetr).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

ImageInput = "Union[PIL.Image.Image, np.ndarray]"


@dataclass
class DetectionResult:
    """Per-image detection output (shared schema across detection models)."""

    boxes: np.ndarray                 # (N, 4) xyxy pixels in original image
    scores: np.ndarray                # (N,)
    labels: np.ndarray                # (N,) integer class ids
    class_names: List[str] = field(default_factory=list)


@dataclass
class RTDetrV2ProcessorConfig:
    image_size: int = 640
    rescale_factor: float = 1.0 / 255.0
    do_normalize: bool = False
    image_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    image_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)


class RTDetrV2Processor:
    """Batched image preprocessor -> NHWC float batch + original sizes."""

    def __init__(self, config: Optional[RTDetrV2ProcessorConfig] = None):
        self.config = config or RTDetrV2ProcessorConfig()

    @classmethod
    def from_pretrained(cls, path, **kwargs) -> "RTDetrV2Processor":
        d = Path(path)
        cfg = RTDetrV2ProcessorConfig()
        pp_file = d / "preprocessor_config.json"
        if pp_file.is_file():
            pp = json.loads(pp_file.read_text())
            size = pp.get("size")
            if isinstance(size, dict):
                cfg.image_size = int(size.get(
                    "height", size.get("shortest_edge", cfg.image_size)))
            elif isinstance(size, int):
                cfg.image_size = size
            cfg.rescale_factor = float(
                pp.get("rescale_factor", cfg.rescale_factor))
            cfg.do_normalize = bool(pp.get("do_normalize", cfg.do_normalize))
            if pp.get("image_mean") is not None:
                cfg.image_mean = tuple(float(x) for x in pp["image_mean"])
            if pp.get("image_std") is not None:
                cfg.image_std = tuple(float(x) for x in pp["image_std"])
        else:
            cfg_file = d / "config.json"
            if cfg_file.is_file():
                cfg.image_size = int(json.loads(cfg_file.read_text()).get(
                    "image_size", cfg.image_size))
        return cls(cfg)

    def __call__(self, images) -> Tuple[np.ndarray, List[Tuple[int, int]]]:
        """-> (pixel_values [B,S,S,3] float32, original (w,h) sizes)."""
        from PIL import Image

        batch = ([images] if isinstance(images, (Image.Image, np.ndarray))
                 else list(images))
        if not batch:
            raise ValueError("Empty image batch")
        size = self.config.image_size
        sizes: List[Tuple[int, int]] = []
        arrays = []
        for img in batch:
            pil = (img if isinstance(img, Image.Image)
                   else Image.fromarray(np.asarray(img))).convert("RGB")
            sizes.append(pil.size)
            arrays.append(np.asarray(
                pil.resize((size, size), Image.Resampling.BILINEAR),
                dtype=np.float32))
        px = np.stack(arrays) * self.config.rescale_factor
        if self.config.do_normalize:
            px = (px - np.asarray(self.config.image_mean, np.float32)) \
                / np.asarray(self.config.image_std, np.float32)
        return px, sizes


LabelMap = Union[Sequence[str], Dict]


class RTDetrV2Predictor:
    """Detection inference wrapper: preprocess -> jitted forward -> decode."""

    DEFAULT_THRESHOLD = 0.3

    def __init__(self, model, processor: Optional[RTDetrV2Processor] = None,
                 threshold: float = DEFAULT_THRESHOLD,
                 labels: Optional[LabelMap] = None):
        self.model = model
        self.processor = processor or RTDetrV2Processor()
        self.threshold = threshold
        self.labels = _resolve_labels(labels, getattr(model, "config", None))
        self._fwd = jax.jit(lambda p, px: model(p, px))

    def predict(self, image) -> DetectionResult:
        return self.predict_batch([image])[0]

    def predict_batch(self, images: Iterable) -> List[DetectionResult]:
        px, sizes = self.processor(images)
        out = self._fwd(self.model.params, jnp.asarray(px))
        logits = np.asarray(out["pred_logits"], np.float32)
        boxes = np.asarray(out["pred_boxes"], np.float32)
        return [self._decode_one(logits[i], boxes[i], w, h)
                for i, (w, h) in enumerate(sizes)]

    def _decode_one(self, logits, boxes, img_w, img_h) -> DetectionResult:
        """Focal-loss decode: top-K over the flat (query x label) score
        space — one query may yield several detections."""
        Q, n_labels = logits.shape
        scores = 1.0 / (1.0 + np.exp(-logits))
        flat = scores.reshape(-1)
        k = min(Q, flat.size)
        idx = np.argpartition(-flat, k - 1)[:k]
        order = np.argsort(-flat[idx])
        idx = idx[order]
        sc = flat[idx]
        keep = sc >= self.threshold
        idx, sc = idx[keep], sc[keep].astype(np.float32)
        if idx.size == 0:
            return DetectionResult(
                boxes=np.zeros((0, 4), np.float32),
                scores=np.zeros((0,), np.float32),
                labels=np.zeros((0,), np.int64), class_names=[])
        q, lab = idx // n_labels, (idx % n_labels).astype(np.int64)
        sel = boxes[q]
        cx, cy = sel[:, 0] * img_w, sel[:, 1] * img_h
        bw, bh = sel[:, 2] * img_w, sel[:, 3] * img_h
        xyxy = np.stack([
            np.clip(cx - bw / 2, 0, img_w), np.clip(cy - bh / 2, 0, img_h),
            np.clip(cx + bw / 2, 0, img_w), np.clip(cy + bh / 2, 0, img_h),
        ], -1).astype(np.float32)
        names = ([self.labels[int(i)] for i in lab] if self.labels
                 else [str(int(i)) for i in lab])
        return DetectionResult(boxes=xyxy, scores=sc, labels=lab,
                               class_names=names)


def _resolve_labels(labels, config) -> Optional[List[str]]:
    if labels is not None:
        if isinstance(labels, dict):
            return [labels[k] for k in sorted(labels, key=lambda x: int(x))]
        return list(labels)
    id2label = getattr(config, "id2label", None) if config else None
    if id2label:
        return [id2label[k] for k in sorted(id2label, key=lambda x: int(x))]
    return None
