"""Pallas fused attention for chunked prefill (flash v2).

Role parity: reference leans on `mx.fast.scaled_dot_product_attention`
(models/base.py:292).  The XLA fallback (ops/attention.py) materializes the
[B,H,S,C] score tensor in HBM; this kernel keeps each query tile's running
softmax state in VMEM — prefill attention becomes HBM-traffic ~ O(Q + KV)
instead of O(S*C).

v2: KV-tiled online softmax (no VMEM context cap).  Per (batch, head,
q-tile) the kernel walks KV tiles on the innermost grid dimension carrying
(m, l, acc) scratch; fully-masked KV tiles skip their compute (their DMA is
pipelined and overlapped anyway).  GQA rides the K/V BlockSpec index map
(kv_head = head // group).  Causality/left-padding/sliding-window are mask
arithmetic from prefetched per-row offsets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_Q_TILE = 256
DEFAULT_KV_TILE = 512
_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _fa2_kernel(off_ref, lp_ref, q_ref, k_ref, v_ref, o_ref,
                acc_ref, m_ref, l_ref, *, scale, q_tile, kv_tile, window):
    b = pl.program_id(0)
    ti = pl.program_id(2)
    kj = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(kj == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)

    q_lo = off_ref[b] + ti * q_tile  # first query position in this tile
    col_lo = kj * kv_tile
    # tile-level skip: every column is beyond the last query's position, or
    # before the window of the first query
    q_hi = q_lo + q_tile - 1
    live = col_lo <= q_hi
    if window is not None:
        live &= (col_lo + kv_tile - 1) > (q_lo - window)
    live &= (col_lo + kv_tile - 1) >= lp_ref[b]

    @pl.when(live)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)  # [TS, D]
        k = k_ref[0, 0].astype(jnp.float32)  # [KC, D]
        v = v_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [TS, KC]
        qpos = q_lo + jax.lax.broadcasted_iota(jnp.int32, (q_tile, kv_tile), 0)
        col = col_lo + jax.lax.broadcasted_iota(jnp.int32, (q_tile, kv_tile), 1)
        keep = (col <= qpos) & (col >= lp_ref[b])
        if window is not None:
            keep &= col > qpos - window
        s = jnp.where(keep, s, _NEG)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[:, :1] = m_new

    @pl.when(kj == nk - 1)
    def _():
        l = l_ref[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "q_tile", "kv_tile", "window", "interpret"),
)
def flash_attention(
    q: jax.Array,  # [B, H, S, D]
    k: jax.Array,  # [B, KVH, C, D]
    v: jax.Array,
    offset: jax.Array,  # [B] int32 — valid tokens before this chunk, per row
    left_pad: jax.Array,  # [B] int32
    scale: float,
    q_tile: int = DEFAULT_Q_TILE,
    kv_tile: int = DEFAULT_KV_TILE,
    window=None,
    interpret: bool = False,
) -> jax.Array:
    B, H, S, D = q.shape
    KVH, C = k.shape[1], k.shape[2]
    groups = H // KVH
    ts = min(q_tile, S)
    while S % ts:
        ts //= 2
    if ts < 8:
        raise ValueError(f"S={S} has no usable q_tile")
    kc = min(kv_tile, C)
    while C % kc:
        kc //= 2
    if kc < 128 and kc != C:
        raise ValueError(f"C={C} has no usable kv_tile")
    grid = (B, H, S // ts, C // kc)
    kernel = functools.partial(
        _fa2_kernel, scale=scale, q_tile=ts, kv_tile=kc, window=window
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, ts, D), lambda b, h, i, j, *_: (b, h, i, 0)),
            pl.BlockSpec(
                (1, 1, kc, D), lambda b, h, i, j, *_: (b, h // groups, j, 0)
            ),
            pl.BlockSpec(
                (1, 1, kc, D), lambda b, h, i, j, *_: (b, h // groups, j, 0)
            ),
        ],
        out_specs=pl.BlockSpec((1, 1, ts, D), lambda b, h, i, j, *_: (b, h, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((ts, D), jnp.float32),
            pltpu.VMEM((ts, 128), jnp.float32),
            pltpu.VMEM((ts, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * C * D,
            bytes_accessed=2 * (B * H * S * D + B * KVH * C * D) * 2,
            transcendentals=B * H * S * C,
        ),
    )(offset.astype(jnp.int32), left_pad.astype(jnp.int32), q, k, v)
