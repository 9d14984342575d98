"""On-device (XLA) image preprocessing: resize + normalize + patchify.

Role parity / upgrade: the reference preprocesses with PIL/numpy on CPU
(utils.py:1193-1786, per-model processing_*.py).  Here the whole pixel
pipeline is jittable jnp ops, so the server can ship raw uint8 frames to the
TPU and fuse preprocessing into the vision-tower program (BASELINE.json
north-star: "resize, normalize, patchify ... fused XLA ops instead of
PIL/numpy").
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@partial(jax.jit, static_argnames=("out_hw", "method"))
def resize_image(img: jax.Array, out_hw: Tuple[int, int], method: str = "cubic"):
    """uint8/float [H, W, C] -> float32 [h, w, C] resized."""
    return jax.image.resize(
        img.astype(jnp.float32), (*out_hw, img.shape[-1]), method=method
    )


@partial(
    jax.jit,
    static_argnames=(
        "out_hw", "patch_size", "merge_size", "temporal_patch_size", "method",
    ),
)
def preprocess_qwen2vl(
    img: jax.Array,  # [H, W, 3] uint8 (one image)
    out_hw: Tuple[int, int],  # smart_resize target (host-computed, static)
    patch_size: int = 14,
    merge_size: int = 2,
    temporal_patch_size: int = 2,
    mean: Tuple[float, ...] = OPENAI_CLIP_MEAN,
    std: Tuple[float, ...] = OPENAI_CLIP_STD,
    method: str = "cubic",
) -> jax.Array:
    """Full Qwen2-VL pixel pipeline on device -> [gt*gh*gw, C*T*P*P].

    Patch flatten order matches the HF/numpy processor exactly
    (utils/processing.py Qwen2VLImageProcessor._preprocess_one).
    """
    hb, wb = out_hw
    x = resize_image(img, out_hw, method)  # [hb, wb, 3] f32
    x = x / 255.0
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    x = x.transpose(2, 0, 1)[None]  # [1, C, H, W]
    x = jnp.tile(x, (temporal_patch_size, 1, 1, 1))  # [T, C, H, W]
    T, C = x.shape[0], x.shape[1]
    P, m = patch_size, merge_size
    gt = T // temporal_patch_size
    gh, gw = hb // P, wb // P
    x = x.reshape(gt, temporal_patch_size, C, gh // m, m, P, gw // m, m, P)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return x.reshape(gt * gh * gw, C * temporal_patch_size * P * P)


@partial(jax.jit, static_argnames=("size", "method"))
def preprocess_square(
    img: jax.Array,  # [H, W, 3] uint8
    size: int,
    mean: Tuple[float, ...] = OPENAI_CLIP_MEAN,
    std: Tuple[float, ...] = OPENAI_CLIP_STD,
    method: str = "cubic",
) -> jax.Array:
    """SigLIP/gemma3-style squash resize -> [C, size, size] normalized."""
    x = resize_image(img, (size, size), method) / 255.0
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    return x.transpose(2, 0, 1)
