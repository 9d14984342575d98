"""Pallas fused attention for chunked prefill.

Role parity: reference leans on `mx.fast.scaled_dot_product_attention`
(models/base.py:292).  The XLA fallback (ops/attention.py) materializes the
[B,H,S,C] score tensor in HBM; this kernel keeps each query tile's scores in
VMEM — prefill attention becomes HBM-traffic ~ O(Q + KV) instead of
O(S*C).

v1 scope: whole K/V per (batch, kv-head) resident in VMEM (C*D*2*2B —
fine to ~8k context at D=128); longer contexts get KV tiling + online
softmax in a follow-up.  GQA is handled by the K/V BlockSpec index map
(kv_head = head // group).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_Q_TILE = 128
_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _fa_kernel(off_ref, lp_ref, q_ref, k_ref, v_ref, o_ref, *, scale, q_tile,
               window):
    b = pl.program_id(0)
    ti = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)  # [TS, D]
    k = k_ref[0, 0].astype(jnp.float32)  # [C, D]
    v = v_ref[0, 0].astype(jnp.float32)
    C = k.shape[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [TS, C]
    qpos = off_ref[b] + ti * q_tile + jax.lax.broadcasted_iota(
        jnp.int32, (q_tile, C), 0
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (q_tile, C), 1)
    keep = (col <= qpos) & (col >= lp_ref[b])
    if window is not None:
        keep &= col > qpos - window
    scores = jnp.where(keep, scores, _NEG)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / l
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "q_tile", "window", "interpret"),
)
def flash_attention(
    q: jax.Array,  # [B, H, S, D]
    k: jax.Array,  # [B, KVH, C, D]
    v: jax.Array,
    offset: jax.Array,  # [B] int32 — valid tokens before this chunk, per row
    left_pad: jax.Array,  # [B] int32
    scale: float,
    q_tile: int = DEFAULT_Q_TILE,
    window=None,
    interpret: bool = False,
) -> jax.Array:
    B, H, S, D = q.shape
    KVH, C = k.shape[1], k.shape[2]
    groups = H // KVH
    ts = min(q_tile, S)
    if S % ts:
        raise ValueError(f"S={S} must be a multiple of q_tile={ts}")
    grid = (B, H, S // ts)
    kernel = functools.partial(_fa_kernel, scale=scale, q_tile=ts, window=window)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, ts, D), lambda b, h, i, *_: (b, h, i, 0)),
            pl.BlockSpec((1, 1, C, D), lambda b, h, i, *_: (b, h // groups, 0, 0)),
            pl.BlockSpec((1, 1, C, D), lambda b, h, i, *_: (b, h // groups, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, ts, D), lambda b, h, i, *_: (b, h, i, 0)),
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
