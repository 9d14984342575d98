"""User-facing detection / segmentation pipeline.

Role parity: reference mlx_vlm/models/sam3/generate.py (Sam3ImagePredictor
/ CLI) and the rfdetr / rt_detr_v2 predict entry points + annotators.py —
a single `detect()` that loads any detection family through the normal
loader, preprocesses, runs the jitted forward, and returns pixel-space
boxes / scores / labels (and masks when the family produces them), plus
an `annotate()` box/mask renderer.

The per-family predictors (models/{sam3,rfdetr,rt_detr_v2}/processing.py)
own the preprocessing and decode math; this module is the dispatch +
I/O layer that makes them reachable from the CLI and the server.
"""

from __future__ import annotations

from dataclasses import asdict
from pathlib import Path
from typing import List, Optional, Union

import numpy as np

DETECTION_MODEL_TYPES = {
    "sam3": "sam3",
    "sam3_video": "sam3",
    "sam3_1": "sam3",
    "rfdetr": "rfdetr",
    "rf-detr": "rfdetr",
    "rt_detr_v2": "rt_detr_v2",
    "rt_detr": "rt_detr_v2",
}


def is_detection_model(model) -> bool:
    mt = getattr(getattr(model, "config", None), "model_type", None)
    if mt is None and isinstance(model, (str, Path)):
        import json

        p = Path(model) / "config.json"
        if p.is_file():
            with open(p) as f:
                mt = json.load(f).get("model_type")
    return mt in DETECTION_MODEL_TYPES


def make_predictor(model, model_path=None, threshold: Optional[float] = None):
    """Wrap a loaded detection model in its family predictor."""
    mt = DETECTION_MODEL_TYPES.get(model.config.model_type)
    if mt == "sam3":
        from ..models.sam3.processing import Sam3Predictor, Sam3Processor

        proc = (Sam3Processor.from_pretrained(model_path)
                if model_path else Sam3Processor(model.config))
        return Sam3Predictor(model, proc,
                             **({"score_threshold": threshold}
                                if threshold is not None else {}))
    if mt == "rfdetr":
        from ..models.rfdetr.processing import (RFDETRPredictor,
                                                RFDETRProcessor)

        proc = (RFDETRProcessor.from_pretrained(model_path)
                if model_path and hasattr(RFDETRProcessor, "from_pretrained")
                else None)
        return RFDETRPredictor(model, proc,
                               **({"score_threshold": threshold}
                                  if threshold is not None else {}))
    if mt == "rt_detr_v2":
        from ..models.rt_detr_v2.processing import (RTDetrV2Predictor,
                                                    RTDetrV2Processor)

        proc = (RTDetrV2Processor.from_pretrained(model_path)
                if model_path else None)
        return RTDetrV2Predictor(model, proc,
                                 **({"threshold": threshold}
                                    if threshold is not None else {}))
    raise ValueError(
        f"{model.config.model_type!r} is not a detection/segmentation "
        f"family (supported: {sorted(set(DETECTION_MODEL_TYPES))})")


def load_detector(model_path, threshold: Optional[float] = None):
    """load() + family predictor in one call."""
    from ..utils.loader import load

    model, _ = load(str(model_path), processor_kwargs={"optional": True})
    return make_predictor(model, model_path=model_path, threshold=threshold)


def detect(
    predictor_or_model,
    image,
    text_prompt: Optional[str] = None,
    boxes: Optional[np.ndarray] = None,
    threshold: Optional[float] = None,
):
    """Run one image through a detector.

    `predictor_or_model`: a predictor from load_detector()/make_predictor,
    a loaded detection Model, or a checkpoint path.
    `text_prompt`: concept prompt (sam3 only).  Returns a DetectionResult
    (boxes xyxy pixels, scores, labels, class_names, masks?).
    """
    pred = predictor_or_model
    if isinstance(pred, (str, Path)):
        pred = load_detector(pred, threshold=threshold)
    elif not hasattr(pred, "predict"):
        pred = make_predictor(pred, threshold=threshold)
    kind = type(pred).__name__
    if kind == "Sam3Predictor":
        if text_prompt is None and boxes is None:
            raise ValueError("sam3 needs a text_prompt (and/or boxes)")
        kwargs = {}
        if boxes is not None:
            kwargs["boxes"] = np.asarray(boxes, np.float32)
        if threshold is not None:
            kwargs["score_threshold"] = threshold
        return pred.predict(image, text_prompt or "", **kwargs)
    kwargs = {}
    if threshold is not None and kind == "RFDETRPredictor":
        kwargs["score_threshold"] = threshold
    return pred.predict(image, **kwargs)


def result_to_dict(res) -> dict:
    """JSON-safe dict (server / CLI output)."""
    d = asdict(res) if hasattr(res, "__dataclass_fields__") else dict(res)
    out = {}
    for k, v in d.items():
        if isinstance(v, np.ndarray):
            out[k] = v.astype(float).tolist() if v.dtype != bool \
                else v.astype(np.uint8).tolist()
        else:
            out[k] = v
    return out


_PALETTE = [(230, 57, 70), (29, 53, 87), (42, 157, 143), (233, 196, 106),
            (244, 162, 97), (38, 70, 83), (144, 190, 109), (249, 132, 74)]


def annotate(image, result, line_width: int = 3, draw_labels: bool = True):
    """Draw boxes (+ masks) on a PIL image — reference annotators.py role."""
    from PIL import Image, ImageDraw

    img = image.convert("RGBA") if hasattr(image, "convert") else \
        Image.fromarray(np.asarray(image)).convert("RGBA")
    masks = getattr(result, "masks", None)
    if masks is not None:
        overlay = np.zeros((img.height, img.width, 4), np.uint8)
        for i, m in enumerate(np.asarray(masks)):
            color = _PALETTE[i % len(_PALETTE)]
            mm = np.asarray(m, bool)
            if mm.shape != (img.height, img.width):
                mm = np.array(Image.fromarray(
                    mm.astype(np.uint8) * 255).resize(
                        (img.width, img.height))) > 127
            overlay[mm] = (*color, 110)
        img = Image.alpha_composite(img, Image.fromarray(overlay))
    draw = ImageDraw.Draw(img)
    names = list(getattr(result, "class_names", []) or [])
    for i, box in enumerate(np.asarray(result.boxes)):
        color = _PALETTE[i % len(_PALETTE)]
        x0, y0, x1, y1 = [float(v) for v in box]
        draw.rectangle([x0, y0, x1, y1], outline=color, width=line_width)
        if draw_labels:
            score = float(np.asarray(result.scores)[i])
            name = names[i] if i < len(names) else str(
                int(np.asarray(result.labels)[i]))
            draw.text((x0 + 2, max(0.0, y0 - 12)), f"{name} {score:.2f}",
                      fill=color)
    return img.convert("RGB")


def main(argv: Optional[List[str]] = None):
    """CLI: python -m mlx_vlm_tpu.generate.detection --model M --image I"""
    import argparse
    import json

    ap = argparse.ArgumentParser(description="Detection / segmentation")
    ap.add_argument("--model", required=True)
    ap.add_argument("--image", required=True)
    ap.add_argument("--prompt", default=None,
                    help="concept prompt (sam3 families)")
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument("--output", default=None,
                    help="write an annotated copy of the image here")
    args = ap.parse_args(argv)

    from PIL import Image

    img = Image.open(args.image).convert("RGB")
    pred = load_detector(args.model, threshold=args.threshold)
    res = detect(pred, img, text_prompt=args.prompt,
                 threshold=args.threshold)
    print(json.dumps(result_to_dict(res)))
    if args.output:
        annotate(img, res).save(args.output)


if __name__ == "__main__":
    main()
