"""KV caches — fixed-capacity, index-written, jit-stable.

Role parity: reference `mlx_vlm/models/cache.py` (KVCache:288,
RotatingKVCache:373, BatchKVCache:875, QuantizedKVCache:184, ...).  The
reference grows caches by concatenation in 256-token steps — hostile to XLA.

TPU design: a cache is a pytree of **preallocated** buffers written with
`lax.dynamic_update_slice`, so every decode step compiles once and reuses the
same program.  Layers are stacked on a leading axis so the whole model's KV
state is two HBM buffers scanned by `lax.scan`.

Batching follows the reference's left-padding semantics (BatchKVCache
cache.py:875): rows are right-aligned so all rows share one write cursor
(`offset`), and per-row `left_pad` masks out the unused prefix.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "KVCache",
    "BatchKVCache",
    "init_cache",
    "init_batch_cache",
    "update_layer",
    "update_layer_rows",
    "insert_row",
    "RotatingKVCache",
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "offset", "left_pad"],
    meta_fields=[],
)
@dataclasses.dataclass
class KVCache:
    """All-layer KV cache.

    k, v:      [L, B, n_kv_heads, capacity, head_dim]
    offset:    int32 scalar — shared write cursor (tokens written so far)
    left_pad:  int32 [B] — per-row count of invalid leading positions
    """

    k: jax.Array
    v: jax.Array
    offset: jax.Array
    left_pad: jax.Array

    @property
    def capacity(self) -> int:
        return self.k.shape[3]

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]


def init_cache(
    num_layers: int,
    batch_size: int,
    num_kv_heads: int,
    head_dim: int,
    capacity: int,
    dtype=jnp.bfloat16,
    left_pad: Optional[jax.Array] = None,
) -> KVCache:
    shape = (num_layers, batch_size, num_kv_heads, capacity, head_dim)
    if left_pad is None:
        left_pad = jnp.zeros((batch_size,), jnp.int32)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        offset=jnp.zeros((), jnp.int32),
        left_pad=left_pad,
    )


def update_layer(
    k_cache: jax.Array,  # [B, H, C, D] — one layer's K buffer
    v_cache: jax.Array,
    k_new: jax.Array,  # [B, H, S, D]
    v_new: jax.Array,
    offset: jax.Array,  # int32 scalar
):
    """Write S new tokens at `offset` for every row; returns updated buffers."""
    zero = jnp.zeros((), jnp.int32)
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k_new.astype(k_cache.dtype), (zero, zero, offset, zero)
    )
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, v_new.astype(v_cache.dtype), (zero, zero, offset, zero)
    )
    return k_cache, v_cache


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "offset", "left_pad"],
    meta_fields=[],
)
@dataclasses.dataclass
class BatchKVCache:
    """Continuous-batching cache: independent per-row write cursors.

    Role parity: reference cache.py:875 (BatchKVCache).  Rows live in fixed
    slots; `offset[b]` counts valid tokens of row b; rows are recycled by
    `insert_row` without touching the others — no recompiles on
    insert/remove (SURVEY.md §7.6 "fixed batch slots").

    k, v:    [L, B, n_kv_heads, capacity, head_dim]
    offset:  int32 [B]
    left_pad:int32 [B]  (always 0 in slot mode; kept for mask parity)
    """

    k: jax.Array
    v: jax.Array
    offset: jax.Array
    left_pad: jax.Array

    @property
    def capacity(self) -> int:
        return self.k.shape[3]

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]


def init_batch_cache(
    num_layers: int,
    batch_size: int,
    num_kv_heads: int,
    head_dim: int,
    capacity: int,
    dtype=jnp.bfloat16,
) -> BatchKVCache:
    shape = (num_layers, batch_size, num_kv_heads, capacity, head_dim)
    return BatchKVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        offset=jnp.zeros((batch_size,), jnp.int32),
        left_pad=jnp.zeros((batch_size,), jnp.int32),
    )


def update_layer_rows(
    k_cache: jax.Array,  # [B, H, C, D]
    v_cache: jax.Array,
    k_new: jax.Array,  # [B, H, S, D]
    v_new: jax.Array,
    offsets: jax.Array,  # int32 [B] per-row write positions
):
    """Per-row dynamic writes (vmapped dynamic_update_slice)."""
    zero = jnp.zeros((), jnp.int32)

    def write(kc, vc, kn, vn, off):
        kc = jax.lax.dynamic_update_slice(kc, kn.astype(kc.dtype), (zero, off, zero))
        vc = jax.lax.dynamic_update_slice(vc, vn.astype(vc.dtype), (zero, off, zero))
        return kc, vc

    return jax.vmap(write)(k_cache, v_cache, k_new, v_new, offsets)


def update_layer_auto(k_cache, v_cache, k_new, v_new, offset):
    """Dispatch on cursor shape: scalar (KVCache) vs per-row (BatchKVCache)."""
    if offset.ndim == 1:
        return update_layer_rows(k_cache, v_cache, k_new, v_new, offset)
    return update_layer(k_cache, v_cache, k_new, v_new, offset)


def insert_row(
    batch: BatchKVCache,
    row: KVCache,  # [L, 1, H, Cp, D] prefilled single-row cache
    slot: jax.Array,  # int32 scalar
    prompt_len: jax.Array,  # int32 scalar (valid tokens in `row`)
) -> BatchKVCache:
    """Copy a prefilled row cache into batch slot `slot` (reference
    BatchGenerator.insert ar.py:2494)."""
    zero = jnp.zeros((), jnp.int32)
    cp = min(row.k.shape[3], batch.capacity)
    k_src = row.k[:, :, :, :cp]
    v_src = row.v[:, :, :, :cp]
    k = jax.lax.dynamic_update_slice(
        batch.k, k_src.astype(batch.k.dtype), (zero, slot, zero, zero, zero)
    )
    v = jax.lax.dynamic_update_slice(
        batch.v, v_src.astype(batch.v.dtype), (zero, slot, zero, zero, zero)
    )
    return BatchKVCache(
        k=k,
        v=v,
        offset=batch.offset.at[slot].set(prompt_len),
        left_pad=batch.left_pad.at[slot].set(0),
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "offset", "left_pad"],
    meta_fields=["window"],
)
@dataclasses.dataclass
class RotatingKVCache:
    """Sliding-window ring cache — reference cache.py:373 (RotatingKVCache).

    Capacity = window; writes wrap at `offset % window`.  Masks must be built
    with `ring_mask` so positions map modulo the window.
    """

    k: jax.Array
    v: jax.Array
    offset: jax.Array
    left_pad: jax.Array
    window: int

    @property
    def capacity(self) -> int:
        return self.k.shape[3]
