"""SAM 3D Body front-end: crop/normalize, CLIFF vector, predictor, export.

Role parity: reference mlx_vlm/models/sam3d_body/batch_prep.py
(get_affine_transform / apply_affine_transform / prepare_image /
get_cliff_condition), estimator.py (make_default_intrinsics, write_obj),
generate.py SAM3DPredictor.predict.

Host-side numpy throughout (one crop per request); the device work is the
jitted sam3d_forward, compiled once per image shape — bbox, intrinsics and
the CLIFF vector enter as traced arrays so per-frame video calls reuse the
same executable.  The reference's torchvision person detector is out of
scope here (no torch-vision dependency); callers pass a bbox or the full
frame is used.
"""

from __future__ import annotations

import functools
import math
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["get_affine_transform", "apply_affine_transform", "prepare_image",
           "get_cliff_condition", "make_default_intrinsics",
           "SAM3DPredictor", "write_obj", "SKELETON_EDGES",
           "draw_skeleton_overlay"]


def get_affine_transform(center: np.ndarray, scale: np.ndarray,
                         output_size: Tuple[int, int]) -> np.ndarray:
    """2x3 affine mapping the 1.2x-padded square bbox to output (W, H)
    (reference batch_prep.get_affine_transform)."""
    src_w, src_h = float(scale[0]), float(scale[1])
    dst_w, dst_h = output_size
    crop = max(src_w, src_h) * 1.2
    c = np.asarray(center, np.float32)
    src = np.stack([c, c + [crop / 2.0, 0.0], c + [0.0, crop / 2.0]])
    dst = np.asarray([[dst_w / 2.0, dst_h / 2.0], [dst_w, dst_h / 2.0],
                      [dst_w / 2.0, dst_h]], np.float32)
    # solve dst = A @ [src; 1]
    ones = np.ones((3, 1), np.float32)
    m = np.linalg.solve(np.concatenate([src, ones], axis=1), dst)
    return m.T.astype(np.float32)  # (2, 3)


def apply_affine_transform(image: np.ndarray, M: np.ndarray,
                           output_size: Tuple[int, int]) -> np.ndarray:
    """Inverse-mapped bilinear warp (reference _warp_affine_numpy)."""
    W, H = output_size
    A = np.concatenate([M, [[0, 0, 1]]], axis=0)
    Ainv = np.linalg.inv(A)
    ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    src_x = Ainv[0, 0] * xs + Ainv[0, 1] * ys + Ainv[0, 2]
    src_y = Ainv[1, 0] * xs + Ainv[1, 1] * ys + Ainv[1, 2]
    h, w = image.shape[:2]
    x0 = np.floor(src_x).astype(np.int64)
    y0 = np.floor(src_y).astype(np.int64)
    fx = src_x - x0
    fy = src_y - y0
    valid = (src_x >= 0) & (src_x <= w - 1) & (src_y >= 0) & (src_y <= h - 1)

    def at(yy, xx):
        return image[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)].astype(
            np.float32)

    out = ((1 - fx)[..., None] * (1 - fy)[..., None] * at(y0, x0)
           + fx[..., None] * (1 - fy)[..., None] * at(y0, x0 + 1)
           + (1 - fx)[..., None] * fy[..., None] * at(y0 + 1, x0)
           + fx[..., None] * fy[..., None] * at(y0 + 1, x0 + 1))
    return (out * valid[..., None]).astype(np.float32)


def prepare_image(image: np.ndarray, bbox,
                  image_size: Tuple[int, int] = (512, 384),
                  mean=(0.485, 0.456, 0.406),
                  std=(0.229, 0.224, 0.225)) -> np.ndarray:
    """(H, W, 3) uint8 + bbox -> (1, Ht, Wt, 3) ImageNet-normalized crop
    (reference batch_prep.prepare_image)."""
    bbox = np.asarray(bbox, np.float32)
    center = np.asarray([(bbox[0] + bbox[2]) / 2, (bbox[1] + bbox[3]) / 2])
    scale = np.asarray([bbox[2] - bbox[0], bbox[3] - bbox[1]])
    th, tw = image_size
    M = get_affine_transform(center, scale, (tw, th))
    crop = apply_affine_transform(image, M, (tw, th)) / 255.0
    crop = (crop - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return crop[None].astype(np.float32)


def get_cliff_condition(bbox, image_shape: Tuple[int, int],
                        focal_length: Optional[float] = None) -> np.ndarray:
    """[cx_norm, cy_norm, 1.25*bbox_w/f] (reference get_cliff_condition)."""
    bbox = np.asarray(bbox, np.float32)
    H, W = image_shape
    if focal_length is None:
        focal_length = math.sqrt(H ** 2 + W ** 2)
    cx = (bbox[0] + bbox[2]) / 2
    cy = (bbox[1] + bbox[3]) / 2
    return np.asarray([(cx - W / 2) / focal_length,
                       (cy - H / 2) / focal_length,
                       (bbox[2] - bbox[0]) * 1.25 / focal_length], np.float32)


def make_default_intrinsics(img_h: int, img_w: int) -> np.ndarray:
    """Diagonal focal length default (reference estimator)."""
    f = math.sqrt(img_h ** 2 + img_w ** 2)
    return np.asarray([[f, 0, img_w / 2], [0, f, img_h / 2], [0, 0, 1]],
                      np.float32)


class SAM3DPredictor:
    """End-to-end single-image inference (reference generate.SAM3DPredictor)."""

    def __init__(self, model, params: dict):
        self.model = model
        self.params = params

        @functools.partial(jax.jit)
        def _run(params, image, cliff, bbox, img_size, cam_int):
            return model(params, image, cliff_condition=cliff, bbox=bbox,
                         img_size=img_size, cam_int=cam_int)

        self._run = _run

    @classmethod
    def from_pretrained(cls, weights_dir: str) -> "SAM3DPredictor":
        import json

        from . import Model, SAM3DConfig
        from ...utils.loader import _nest, _read_safetensors, _stack_layers

        root = Path(weights_dir).expanduser()
        cfgfile = root / "config.json"
        cfg = SAM3DConfig.from_dict(
            json.loads(cfgfile.read_text()) if cfgfile.exists() else {})
        model = Model(cfg)
        raw = _read_safetensors(root)
        flat = _stack_layers(Model.sanitize(raw), Model.stack_patterns)
        params = jax.tree_util.tree_map(
            jnp.asarray, _nest(flat))
        return cls(model, params)

    def predict(self, image: np.ndarray, bbox=None,
                cam_int: Optional[np.ndarray] = None) -> dict:
        h, w = image.shape[:2]
        if bbox is None:
            bbox = [0, 0, w, h]
        if cam_int is None:
            cam_int = make_default_intrinsics(h, w)
        processed = prepare_image(image, bbox,
                                  image_size=self.model.config.image_size,
                                  mean=self.model.config.image_mean,
                                  std=self.model.config.image_std)
        cliff = get_cliff_condition(bbox, (h, w),
                                    focal_length=float(cam_int[0, 0]))
        body_output, pred_cam = self._run(
            self.params, jnp.asarray(processed), jnp.asarray(cliff[None]),
            jnp.asarray(bbox, jnp.float32),
            jnp.asarray([h, w], jnp.float32), jnp.asarray(cam_int))
        return {
            "pred_vertices": np.asarray(body_output["pred_vertices"][0]),
            "pred_keypoints_3d":
                np.asarray(body_output["pred_keypoints_3d"][0]),
            "pred_joint_coords":
                np.asarray(body_output["pred_joint_coords"][0]),
            "pred_camera": np.asarray(pred_cam[0]),
            "bbox": list(bbox),
        }


def write_obj(vertices: np.ndarray, faces: Optional[np.ndarray],
              path: str) -> None:
    """Minimal Wavefront OBJ export (reference estimator.write_obj)."""
    with open(path, "w") as f:
        for v in np.asarray(vertices):
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        if faces is not None:
            for face in np.asarray(faces):
                f.write(f"f {face[0] + 1} {face[1] + 1} {face[2] + 1}\n")


# first 24 body-keypoint edges of the 70-keypoint layout (reference
# overlay.py skeleton; OpenCV-free numpy rasterization here)
SKELETON_EDGES = (
    (0, 1), (0, 2), (1, 3), (2, 4), (5, 6), (5, 7), (7, 9), (6, 8), (8, 10),
    (5, 11), (6, 12), (11, 12), (11, 13), (13, 15), (12, 14), (14, 16),
)


def draw_skeleton_overlay(frame: np.ndarray, keypoints_2d: np.ndarray,
                          color=(0, 255, 0)) -> np.ndarray:
    """Rasterize skeleton edges onto an RGB frame with pure numpy
    (reference overlay.draw_skeleton_overlay uses cv2 — out of this
    image's dependency set)."""
    out = np.array(frame, copy=True)
    h, w = out.shape[:2]
    for a, b in SKELETON_EDGES:
        if a >= len(keypoints_2d) or b >= len(keypoints_2d):
            continue
        pa, pb = keypoints_2d[a], keypoints_2d[b]
        n = int(max(abs(pb[0] - pa[0]), abs(pb[1] - pa[1]), 1))
        xs = np.linspace(pa[0], pb[0], n).astype(np.int64)
        ys = np.linspace(pa[1], pb[1], n).astype(np.int64)
        ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
        out[ys[ok], xs[ok]] = color
    return out
