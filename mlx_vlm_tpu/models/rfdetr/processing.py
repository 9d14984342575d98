"""RF-DETR preprocessing + predictor.

Role parity: reference mlx_vlm/models/rfdetr/{processing_rfdetr,
generate}.py — square bilinear resize + ImageNet mean/std normalization,
sigmoid scores with per-query argmax, top-K + threshold + per-class NMS,
optional mask resize.  COCO 91-class names are the default vocabulary
(index layout is a dataset fact).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

COCO_CLASSES = [
    "N/A", "person", "bicycle", "car", "motorcycle", "airplane", "bus",
    "train", "truck", "boat", "traffic light", "fire hydrant", "N/A",
    "stop sign", "parking meter", "bench", "bird", "cat", "dog", "horse",
    "sheep", "cow", "elephant", "bear", "zebra", "giraffe", "N/A",
    "backpack", "umbrella", "N/A", "N/A", "handbag", "tie", "suitcase",
    "frisbee", "skis", "snowboard", "sports ball", "kite", "baseball bat",
    "baseball glove", "skateboard", "surfboard", "tennis racket", "bottle",
    "N/A", "wine glass", "cup", "fork", "knife", "spoon", "bowl", "banana",
    "apple", "sandwich", "orange", "broccoli", "carrot", "hot dog", "pizza",
    "donut", "cake", "chair", "couch", "potted plant", "bed", "N/A",
    "dining table", "N/A", "N/A", "toilet", "N/A", "tv", "laptop", "mouse",
    "remote", "keyboard", "cell phone", "microwave", "oven", "toaster",
    "sink", "refrigerator", "N/A", "book", "clock", "vase", "scissors",
    "teddy bear", "hair drier", "toothbrush",
]


@dataclass
class DetectionResult:
    boxes: np.ndarray                       # (N, 4) xyxy pixels
    scores: np.ndarray                      # (N,)
    labels: np.ndarray                      # (N,) class ids
    class_names: List[str] = field(default_factory=list)
    masks: Optional[np.ndarray] = None      # (N, H, W) bool


class RFDETRProcessor:
    """Square resize + ImageNet normalization."""

    def __init__(self, resolution: int = 560,
                 image_mean=(0.485, 0.456, 0.406),
                 image_std=(0.229, 0.224, 0.225), num_select: int = 300):
        self.resolution = resolution
        self.image_mean = np.asarray(image_mean, np.float32)
        self.image_std = np.asarray(image_std, np.float32)
        self.num_select = num_select

    @classmethod
    def from_pretrained(cls, path, **kwargs) -> "RFDETRProcessor":
        d = Path(path)
        res = 560
        cfgf = d / "config.json"
        if cfgf.is_file():
            res = json.loads(cfgf.read_text()).get("resolution", 560)
        ppf = d / "preprocessor_config.json"
        if ppf.is_file():
            pp = json.loads(ppf.read_text())
            img = pp.get("config", {})
            return cls(
                resolution=res,
                image_mean=tuple(img.get("image_mean", (0.485, 0.456, 0.406))),
                image_std=tuple(img.get("image_std", (0.229, 0.224, 0.225))),
                num_select=pp.get("post_process_config", {}).get(
                    "num_select", 300),
            )
        return cls(resolution=res)

    def __call__(self, image) -> Dict[str, np.ndarray]:
        from PIL import Image

        if isinstance(image, np.ndarray):
            image = Image.fromarray(image)
        orig_w, orig_h = image.size
        img = image.convert("RGB").resize(
            (self.resolution, self.resolution), Image.Resampling.BILINEAR)
        px = np.asarray(img, np.float32) / 255.0
        px = (px - self.image_mean) / self.image_std
        return {"pixel_values": px[None], "original_size": (orig_h, orig_w)}


def box_cxcywh_to_xyxy(b: np.ndarray) -> np.ndarray:
    cx, cy, w, h = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def _box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), -1)
    area_a = np.prod(a[:, 2:] - a[:, :2], -1)
    area_b = np.prod(b[:, 2:] - b[:, :2], -1)
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-9)


def _nms_per_class(boxes, scores, classes, iou_thr=0.5) -> np.ndarray:
    keep = []
    for c in np.unique(classes):
        idx = np.where(classes == c)[0]
        order = idx[np.argsort(-scores[idx])]
        while order.size:
            i = order[0]
            keep.append(i)
            if order.size == 1:
                break
            ious = _box_iou(boxes[i:i + 1], boxes[order[1:]])[0]
            order = order[1:][ious < iou_thr]
    return np.sort(np.asarray(keep, np.int64))


def postprocess(pred_logits, pred_boxes, original_size,
                score_threshold=0.5, num_select=300, class_names=None,
                pred_masks=None, nms_threshold=0.5) -> DetectionResult:
    """Decode one image's outputs (reference generate.py postprocess)."""
    if class_names is None:
        class_names = COCO_CLASSES
    scores = 1.0 / (1.0 + np.exp(-pred_logits[0]))
    max_s = scores.max(-1)
    max_c = scores.argmax(-1)
    if num_select < max_s.size:
        top = np.argpartition(-max_s, num_select)[:num_select]
    else:
        top = np.arange(max_s.size)
    max_s, max_c = max_s[top], max_c[top]
    boxes = pred_boxes[0][top]
    keep = max_s > score_threshold
    max_s, max_c, boxes, qidx = max_s[keep], max_c[keep], boxes[keep], \
        top[keep]
    boxes = box_cxcywh_to_xyxy(boxes)
    oh, ow = original_size
    boxes[:, [0, 2]] = np.clip(boxes[:, [0, 2]] * ow, 0, ow)
    boxes[:, [1, 3]] = np.clip(boxes[:, [1, 3]] * oh, 0, oh)
    if nms_threshold < 1.0 and len(boxes):
        nk = _nms_per_class(boxes, max_s, max_c, nms_threshold)
        boxes, max_s, max_c, qidx = boxes[nk], max_s[nk], max_c[nk], qidx[nk]
    names = [class_names[c] if c < len(class_names) else f"class_{c}"
             for c in max_c]
    masks = None
    if pred_masks is not None and len(qidx):
        m = pred_masks[0][qidx].astype(np.float32)
        m = np.asarray(jax.image.resize(
            jnp.asarray(m), (m.shape[0], oh, ow), "bilinear"))
        masks = m > 0
    return DetectionResult(boxes=boxes.astype(np.float32),
                           scores=max_s.astype(np.float32),
                           labels=max_c.astype(np.int64),
                           class_names=names, masks=masks)


class RFDETRPredictor:
    """Detection/segmentation inference wrapper."""

    def __init__(self, model, processor: Optional[RFDETRProcessor] = None,
                 score_threshold: float = 0.5, nms_threshold: float = 0.5,
                 class_names: Optional[List[str]] = None):
        self.model = model
        self.processor = processor or RFDETRProcessor(
            resolution=getattr(model.config, "resolution", 560))
        self.score_threshold = score_threshold
        self.nms_threshold = nms_threshold
        self.class_names = class_names
        self._fwd = jax.jit(lambda p, px: model(p, px))

    def predict(self, image, score_threshold: Optional[float] = None
                ) -> DetectionResult:
        thr = (self.score_threshold if score_threshold is None
               else score_threshold)
        inp = self.processor(image)
        out = self._fwd(self.model.params, jnp.asarray(inp["pixel_values"]))
        masks = out.get("pred_masks")
        return postprocess(
            np.asarray(out["pred_logits"], np.float32),
            np.asarray(out["pred_boxes"], np.float32),
            inp["original_size"], score_threshold=thr,
            num_select=self.processor.num_select,
            class_names=self.class_names,
            pred_masks=None if masks is None else np.asarray(masks),
            nms_threshold=self.nms_threshold)
