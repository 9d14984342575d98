"""Attention-mask builders (all jittable, static shapes).

Role parity: reference `mlx_vlm/models/cache.py:24` (create_causal_mask with
window / left- / right-padding) and `models/base.py:create_attention_mask`.

Convention: masks are boolean, True = attend.  Shapes broadcast against
attention scores [B, H, S_q, C_kv].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["causal_cache_mask", "segment_mask", "full_valid_mask"]


def causal_cache_mask(
    offset: jax.Array,  # int32 scalar or [B]: tokens already in cache per row
    left_pad: jax.Array,  # int32 [B]
    q_len: int,
    capacity: int,
    window: Optional[int] = None,
) -> jax.Array:
    """Mask for queries at absolute positions offset..offset+q_len-1 against a
    left-aligned cache of size `capacity`.

    keep(b, i, j) = left_pad[b] <= j <= offset[b] + i, optionally limited to
    a sliding window of size `window` ending at the query position.
    Returns bool [B, 1, q_len, capacity].
    """
    j = jnp.arange(capacity, dtype=jnp.int32)[None, None, None, :]
    i = jnp.arange(q_len, dtype=jnp.int32)[None, None, :, None]
    if offset.ndim == 1:  # per-row cursors (BatchKVCache)
        qpos = offset[:, None, None, None] + i
    else:
        qpos = offset + i
    keep = (j <= qpos) & (j >= left_pad[:, None, None, None])
    if window is not None:
        keep &= j > qpos - window
    return keep


def segment_mask(segment_ids: jax.Array) -> jax.Array:
    """Block-diagonal mask for packed sequences (vision towers).

    Replaces the reference's per-image python loop over `cu_seqlens`
    (qwen2_vl/vision.py:148-158) with one batched masked attention.
    segment_ids: int32 [S]; tokens attend only within their own segment.
    Returns bool [1, 1, S, S].
    """
    m = segment_ids[:, None] == segment_ids[None, :]
    return m[None, None, :, :]


def full_valid_mask(left_pad: jax.Array, total: jax.Array, capacity: int) -> jax.Array:
    """Validity-only (non-causal) mask: left_pad[b] <= j < total."""
    j = jnp.arange(capacity, dtype=jnp.int32)[None, :]
    return (j >= left_pad[:, None]) & (j < total)
