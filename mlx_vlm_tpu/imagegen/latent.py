"""Packed-latent utilities for rectified-flow image generation.

Role parity: reference mlx_vlm/models/flux2/latent.py (patchify/pack/unpack,
prepare_packed_latents, prepare_grid_ids).

TPU design: everything is channels-LAST (NHWC) — the layout XLA's TPU conv
and reshape lowering prefers — instead of the reference's NCHW with
transposes around every conv.  Grid ids are tiny host-side numpy (static
per resolution, feed the rope tables once); latent noise is drawn with
jax.random so the whole denoise loop stays on device.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def patchify(latents: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [B, H/2, W/2, C*4] (2x2 space-to-depth).

    Channel order matches the reference's NCHW patchify
    (latent.py:patchify_latents): out channel = c * 4 + (dy * 2 + dx).
    """
    B, H, W, C = latents.shape
    x = latents.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, h, w, C, 2, 2]
    return x.reshape(B, H // 2, W // 2, C * 4)


def unpatchify(latents: jax.Array) -> jax.Array:
    """[B, h, w, C*4] -> [B, h*2, w*2, C] (depth-to-space, inverse of
    patchify; reference vae.py:_unpatchify_latents)."""
    B, h, w, C4 = latents.shape
    C = C4 // 4
    x = latents.reshape(B, h, w, C, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # [B, h, 2, w, 2, C]
    return x.reshape(B, h * 2, w * 2, C)


def pack(latents: jax.Array) -> jax.Array:
    """[B, h, w, C] -> [B, h*w, C] token sequence (reference pack_latents)."""
    B, h, w, C = latents.shape
    return latents.reshape(B, h * w, C)


def unpack(latents: jax.Array, latent_height: int, latent_width: int) -> jax.Array:
    """[B, N, C] -> [B, h, w, C] (reference unpack_latents)."""
    B, N, C = latents.shape
    return latents.reshape(B, latent_height, latent_width, C)


def grid_ids(height: int, width: int, t_coord: int) -> np.ndarray:
    """[h*w, 4] integer (t, h, w, layer) coords for the rope tables
    (reference prepare_grid_ids).  Host-side numpy: static per resolution."""
    h = np.arange(height, dtype=np.int32)
    w = np.arange(width, dtype=np.int32)
    hg, wg = np.meshgrid(h, w, indexing="ij")
    flat_h, flat_w = hg.reshape(-1), wg.reshape(-1)
    t = np.full_like(flat_h, t_coord)
    layer = np.zeros_like(flat_h)
    return np.stack([t, flat_h, flat_w, layer], axis=1)


def text_ids(seq_len: int) -> np.ndarray:
    """[S, 4] coords for text tokens: (0, 0, 0, token_index)
    (reference prompt.py:prepare_text_ids)."""
    tok = np.arange(seq_len, dtype=np.int32)
    z = np.zeros_like(tok)
    return np.stack([z, z, z, tok], axis=1)


def prepare_packed_latents(
    key: jax.Array,
    *,
    height: int,
    width: int,
    batch_size: int = 1,
    num_latent_channels: int = 32,
    vae_scale_factor: int = 8,
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, np.ndarray, int, int]:
    """Initial N(0,1) packed latents [B, h*w, C*4] + grid ids + latent h/w
    (reference prepare_packed_latents; jax.random instead of mx.random)."""
    lh = height // (vae_scale_factor * 2)
    lw = width // (vae_scale_factor * 2)
    latents = jax.random.normal(
        key, (batch_size, lh, lw, num_latent_channels * 4), dtype=jnp.float32
    ).astype(dtype)
    ids = grid_ids(lh, lw, t_coord=0)
    return pack(latents), ids, lh, lw
