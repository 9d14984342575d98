"""Video processing for SAM 3D Body: per-frame mesh estimation + tracking.

Role parity: reference mlx_vlm/models/sam3d_body/video.py — MHR70 skeleton
pairs, IoU person tracking with a target-region seed, full perspective
keypoint projection, per-frame annotate-and-collect loop.

cv2 is not in this image, so the pipeline is frame-array-driven: callers
hand `process_frames` an iterable of RGB uint8 arrays (from any decoder)
and receive per-frame results + numpy-annotated frames back.  Detection
comes from any callable returning [x1,y1,x2,y2] boxes — e.g. a loaded
rfdetr/rt_detr family model via generate.detection, or a fixed bbox.
"""

from __future__ import annotations

import math
from typing import Callable, Iterable, Iterator, List, Optional, Sequence

import numpy as np

__all__ = ["SKELETON_PAIRS", "bbox_iou", "track_person",
           "project_keypoints_perspective", "draw_skeleton",
           "process_frames"]

# MHR70 keypoint ordering (NOT COCO-17): 0-4 head, 5-6 shoulders,
# 7-8 elbows, 9-10 hips, 11-12 knees, 13-14 ankles, 15-20 feet,
# 21-41 R hand (wrist 41), 42-62 L hand (wrist 62), 69 neck
SKELETON_PAIRS = (
    (0, 1), (0, 2), (1, 3), (2, 4), (1, 2), (3, 5), (4, 6),
    (5, 6), (5, 9), (6, 10), (9, 10),
    (5, 7), (7, 62),
    (6, 8), (8, 41),
    (9, 11), (11, 13),
    (10, 12), (12, 14),
    (13, 15), (13, 16), (13, 17),
    (14, 18), (14, 19), (14, 20),
)


def bbox_iou(a, b) -> float:
    """IoU between two [x1, y1, x2, y2] boxes."""
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0, x2 - x1) * max(0, y2 - y1)
    union = ((a[2] - a[0]) * (a[3] - a[1])
             + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / union if union > 0 else 0.0


def track_person(detections: Sequence, prev_bbox,
                 iou_threshold: float = 0.3):
    """Pick the detection best matching prev_bbox by IoU; falls back to
    the first (largest) detection on a lost track."""
    if not detections:
        return None
    if prev_bbox is None:
        return detections[0]
    best_iou, best_box = 0.0, None
    for det in detections:
        score = bbox_iou(det, prev_bbox)
        if score > best_iou:
            best_iou, best_box = score, det
    return best_box if best_iou >= iou_threshold else detections[0]


def project_keypoints_perspective(keypoints_3d: np.ndarray,
                                  camera: np.ndarray, bbox,
                                  img_w: int, img_h: int,
                                  fov_deg: float = 60.0) -> np.ndarray:
    """(N, 3) keypoints + weak-perspective camera -> (N, 2) pixels
    (reference project_keypoints_perspective: flip s/ty, recover the
    camera translation from bbox geometry, pinhole-project)."""
    cam = np.asarray(camera, np.float64).copy()
    cam[[0, 2]] *= -1
    s, tx, ty = cam
    bcx = (bbox[0] + bbox[2]) / 2
    bcy = (bbox[1] + bbox[3]) / 2
    bsize = max(bbox[2] - bbox[0], bbox[3] - bbox[1])
    focal = img_h / (2 * math.tan(math.radians(fov_deg / 2)))
    bs = bsize * s + 1e-8
    cam_t = np.asarray([tx + 2 * (bcx - img_w / 2) / bs,
                        ty + 2 * (bcy - img_h / 2) / bs,
                        2 * focal / bs])
    j3d = np.asarray(keypoints_3d, np.float64) + cam_t[None]
    j3d = j3d / j3d[:, 2:3]
    out = np.empty((len(j3d), 2))
    out[:, 0] = focal * j3d[:, 0] + img_w / 2
    out[:, 1] = focal * j3d[:, 1] + img_h / 2
    return out


def _draw_line(img: np.ndarray, p0, p1, color) -> None:
    h, w = img.shape[:2]
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1))
    xs = np.linspace(p0[0], p1[0], n).astype(np.int64)
    ys = np.linspace(p0[1], p1[1], n).astype(np.int64)
    ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    img[ys[ok], xs[ok]] = color


def draw_skeleton(frame: np.ndarray, keypoints_2d: np.ndarray,
                  color=(0, 255, 0)) -> np.ndarray:
    """Rasterize the MHR70 skeleton onto an RGB frame (pure numpy —
    reference draw_skeleton uses cv2)."""
    out = np.array(frame, copy=True)
    kp = np.asarray(keypoints_2d)
    for a, b in SKELETON_PAIRS:
        if a < len(kp) and b < len(kp):
            _draw_line(out, kp[a], kp[b], color)
    return out


def process_frames(
    predictor,
    frames: Iterable[np.ndarray],
    detect: Optional[Callable[[np.ndarray], List[list]]] = None,
    bbox: Optional[list] = None,
    target_region: Optional[list] = None,
    annotate: bool = True,
    fov_deg: float = 60.0,
) -> Iterator[dict]:
    """Per-frame SAM 3D Body over a frame stream (reference process_video
    loop without the cv2 IO shell).

    predictor: estimator.SAM3DPredictor.  `detect(frame) -> [bbox, ...]`
    runs per frame when no fixed bbox is given; `target_region` seeds the
    IoU tracker on the first frame.  Yields dicts with the estimator
    outputs plus `bbox`, `keypoints_2d`, and (optionally) the annotated
    `frame`."""
    tracked = target_region
    for frame in frames:
        frame = np.asarray(frame)
        h, w = frame.shape[:2]
        if bbox is not None:
            box = list(bbox)
        elif detect is not None:
            box = track_person(detect(frame), tracked)
            if box is None:
                yield {"bbox": None, "skipped": True}
                continue
        else:
            box = [0, 0, w, h]
        tracked = box
        result = predictor.predict(frame, bbox=box)
        kp2d = project_keypoints_perspective(
            result["pred_keypoints_3d"], result["pred_camera"], box,
            w, h, fov_deg=fov_deg)
        result["keypoints_2d"] = kp2d
        if annotate:
            result["frame"] = draw_skeleton(frame, kp2d)
        yield result
