"""SAM3 processor + predictors.

Role parity: reference mlx_vlm/models/sam3/{processing_sam3,generate}.py
— square resize + 0.5/0.5 normalization, CLIP tokenization, the
Sam3Predictor image pipeline (cached text features, thresholded
presence-weighted scores, mask resize), per-class NMS, and a simple
IoU video tracker.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp


@dataclass
class DetectionResult:
    boxes: np.ndarray                  # (N, 4) xyxy pixels
    masks: np.ndarray                  # (N, H, W) uint8
    scores: np.ndarray                 # (N,)
    track_ids: Optional[np.ndarray] = None


class Sam3Processor:
    """Image + text preprocessing for SAM3."""

    def __init__(self, image_size: int = 1008,
                 image_mean=(0.5, 0.5, 0.5), image_std=(0.5, 0.5, 0.5),
                 max_text_length: int = 32, tokenizer=None):
        self.image_size = image_size
        self.image_mean = np.asarray(image_mean, np.float32)
        self.image_std = np.asarray(image_std, np.float32)
        self.max_text_length = max_text_length
        self._tokenizer = tokenizer

    @classmethod
    def from_pretrained(cls, path, **kwargs):
        d = Path(path)
        cfg = {}
        f = d / "processor_config.json"
        if f.is_file():
            cfg = json.loads(f.read_text())
        img = cfg.get("image_processor", {})
        size = img.get("size", {})
        tokenizer = None
        try:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(str(d))
        except Exception:
            tokenizer = None
        return cls(
            image_size=size.get("height", 1008),
            image_mean=tuple(img.get("image_mean", (0.5, 0.5, 0.5))),
            image_std=tuple(img.get("image_std", (0.5, 0.5, 0.5))),
            tokenizer=tokenizer,
        )

    @property
    def tokenizer(self):
        if self._tokenizer is None:
            from transformers import CLIPTokenizer

            self._tokenizer = CLIPTokenizer.from_pretrained(
                "openai/clip-vit-base-patch32")
        return self._tokenizer

    def _one(self, image) -> np.ndarray:
        from PIL import Image

        if isinstance(image, np.ndarray):
            image = Image.fromarray(image.astype(np.uint8))
        img = image.convert("RGB").resize(
            (self.image_size, self.image_size), Image.Resampling.BILINEAR)
        px = np.asarray(img, np.float32) / 255.0
        return (px - self.image_mean) / self.image_std

    def preprocess_image(self, image) -> Dict[str, np.ndarray]:
        if isinstance(image, list):
            return {"pixel_values": np.stack([self._one(i) for i in image])}
        return {"pixel_values": self._one(image)[None]}

    def preprocess_text(self, text: Union[str, List[str]]) -> Dict:
        if isinstance(text, str):
            text = [text]
        enc = self.tokenizer(
            text, padding="max_length", max_length=self.max_text_length,
            truncation=True, return_tensors="np")
        return {"input_ids": enc["input_ids"],
                "attention_mask": enc["attention_mask"]}

    def preprocess_video(self, frames) -> Dict[str, np.ndarray]:
        return {"pixel_values": np.stack([self._one(f) for f in frames])}


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _resize_masks(masks: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    m = jnp.asarray(masks, jnp.float32)
    out = jax.image.resize(m, (m.shape[0], hw[0], hw[1]), "bilinear")
    return np.asarray(out)


def _box_iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), -1)
    aa = np.prod(a[:, 2:] - a[:, :2], -1)
    ab = np.prod(b[:, 2:] - b[:, :2], -1)
    return inter / np.maximum(aa[:, None] + ab[None] - inter, 1e-9)


def nms(result: DetectionResult, iou_thresh: float = 0.5) -> DetectionResult:
    """Greedy NMS over a DetectionResult (reference generate.py nms)."""
    if len(result.scores) == 0:
        return result
    order = np.argsort(-result.scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        ious = _box_iou_matrix(result.boxes[i:i + 1],
                               result.boxes[order[1:]])[0]
        order = order[1:][ious < iou_thresh]
    keep = np.asarray(keep, np.int64)
    return DetectionResult(boxes=result.boxes[keep],
                           masks=result.masks[keep],
                           scores=result.scores[keep])


class Sam3Predictor:
    """Image-level promptable segmentation (reference generate.py:114)."""

    def __init__(self, model, processor: Sam3Processor,
                 score_threshold: float = 0.5):
        self.model = model
        self.processor = processor
        self.score_threshold = score_threshold
        self._text_cache: Dict[str, Tuple] = {}
        self._detect = jax.jit(
            lambda p, px, emb, am: model.detect(
                p, px, attention_mask=am, inputs_embeds=emb))
        self._detect_boxes = jax.jit(
            lambda p, px, emb, am, bx: model.detect(
                p, px, attention_mask=am, boxes=bx, inputs_embeds=emb))

    def _text(self, prompt: str):
        from ...generate.ar import embed_fn

        if prompt not in self._text_cache:
            t = self.processor.preprocess_text(prompt)
            ids = jnp.asarray(t["input_ids"])
            am = jnp.asarray(t["attention_mask"])
            emb = embed_fn(self.model)(
                self.model.params, ids, am)
            self._text_cache[prompt] = (emb, am)
        return self._text_cache[prompt]

    def predict(self, image, text_prompt: str,
                boxes: Optional[np.ndarray] = None,
                score_threshold: Optional[float] = None) -> DetectionResult:
        from PIL import Image

        thr = (self.score_threshold if score_threshold is None
               else score_threshold)
        px = jnp.asarray(self.processor.preprocess_image(image)
                         ["pixel_values"])
        emb, am = self._text(text_prompt)
        if isinstance(image, Image.Image):
            img_w, img_h = image.size
        else:
            img_h, img_w = np.asarray(image).shape[:2]

        if boxes is not None:
            b = np.asarray(boxes, np.float32).reshape(-1, 4)
            x1, y1, x2, y2 = (b[:, i] for i in range(4))
            cxcywh = np.stack(
                [(x1 + x2) / 2 / img_w, (y1 + y2) / 2 / img_h,
                 (x2 - x1) / img_w, (y2 - y1) / img_h], -1)
            out = self._detect_boxes(self.model.params, px, emb, am,
                                     jnp.asarray(cxcywh)[None])
        else:
            out = self._detect(self.model.params, px, emb, am)

        logits = np.asarray(out["pred_logits"][0], np.float32)
        bxs = np.asarray(out["pred_boxes"][0], np.float32)
        msk = np.asarray(out["pred_masks"][0], np.float32)
        scores = _sigmoid(logits)
        pres = _sigmoid(np.asarray(out["presence_logits"][0], np.float32))
        scores = scores * pres
        keep = scores > thr
        scores, bxs, msk = scores[keep], bxs[keep], msk[keep]
        if scores.size == 0:
            return DetectionResult(
                boxes=np.zeros((0, 4), np.float32),
                masks=np.zeros((0, img_h, img_w), np.uint8),
                scores=np.zeros((0,), np.float32))
        bxs = bxs.copy()
        bxs[:, [0, 2]] = np.clip(bxs[:, [0, 2]] * img_w, 0, img_w)
        bxs[:, [1, 3]] = np.clip(bxs[:, [1, 3]] * img_h, 0, img_h)
        masks = (_resize_masks(msk, (img_h, img_w)) > 0).astype(np.uint8)
        return DetectionResult(boxes=bxs, masks=masks, scores=scores)


class SimpleTracker:
    """Greedy IoU track association (reference generate.py:46)."""

    def __init__(self, iou_threshold: float = 0.3, max_lost: int = 10):
        self.iou_threshold = iou_threshold
        self.max_lost = max_lost
        self.tracks: Dict[int, dict] = {}
        self._next = 0

    def update(self, result: DetectionResult) -> DetectionResult:
        ids = np.full(len(result.scores), -1, np.int64)
        live = [(tid, t) for tid, t in self.tracks.items()]
        used = set()
        for i in np.argsort(-result.scores):
            best, best_iou = None, self.iou_threshold
            for tid, t in live:
                if tid in used:
                    continue
                iou = _box_iou_matrix(result.boxes[i:i + 1],
                                      t["box"][None])[0, 0]
                if iou > best_iou:
                    best, best_iou = tid, iou
            if best is None:
                best = self._next
                self._next += 1
            used.add(best)
            ids[i] = best
            self.tracks[best] = {"box": result.boxes[i], "lost": 0}
        for tid in list(self.tracks):
            if tid not in used:
                self.tracks[tid]["lost"] += 1
                if self.tracks[tid]["lost"] > self.max_lost:
                    del self.tracks[tid]
        return DetectionResult(boxes=result.boxes, masks=result.masks,
                               scores=result.scores, track_ids=ids)


def track_video(model, processor, frames, text_prompt: str,
                score_threshold: float = 0.5, nms_thresh: float = 0.5,
                iou_threshold: float = 0.3) -> List[DetectionResult]:
    """Detect-per-frame + greedy IoU association (image-detector video
    path; reference generate.py track_video)."""
    pred = Sam3Predictor(model, processor, score_threshold)
    tracker = SimpleTracker(iou_threshold=iou_threshold)
    out = []
    for frame in frames:
        r = nms(pred.predict(frame, text_prompt), nms_thresh)
        out.append(tracker.update(r))
    return out
