"""Fused quantized matmul Pallas kernel: y = x @ dequant(W).T

Role parity: reference delegates to `mx.quantized_matmul` (mlx internals) and
ships custom Metal qmv/qmm kernels for 1-bit (quantization/one_bit.py:212).

TPU design: W stays packed in HBM (uint8, 2x int4 or 1x int8 per byte) and is
dequantized tile-by-tile in VMEM right before feeding the MXU — HBM traffic
is 4x (int4) lower than bf16 weights, which is the decode-throughput win for
4-bit checkpoints.  Grid tiles the output dim; K is streamed in VMEM blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.quant import QuantizedTensor

DEFAULT_TILE_N = 256


def _qmm_kernel(x_ref, q_ref, s_ref, b_ref, o_ref, *, bits, group_size):
    """One output tile: o[M, TN] = x[M, K] @ dequant(q[TN, Kp]).T"""
    q = q_ref[:]  # [TN, K*bits/8] uint8
    if bits == 4:
        # widen before the interleave: Mosaic only supports minor-dim
        # insertion/reshape on 32-bit types
        q32 = q.astype(jnp.int32)
        lo = q32 & 0x0F
        hi = q32 >> 4
        codes = jnp.stack([lo, hi], axis=-1).reshape(q.shape[0], q.shape[1] * 2)
    else:
        codes = q.astype(jnp.int32)
    tn, k = codes.shape
    g = group_size
    codes = codes.reshape(tn, k // g, g).astype(jnp.float32)
    w = codes * s_ref[:].astype(jnp.float32)[..., None] + b_ref[:].astype(
        jnp.float32
    )[..., None]
    w = w.reshape(tn, k)
    x = x_ref[:].astype(jnp.float32)
    o_ref[:] = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("bits", "group_size", "tile_n", "interpret")
)
def _qmm_2d(x, q, scales, biases, *, bits, group_size, tile_n, interpret):
    M, K = x.shape
    N = scales.shape[0]
    packed = q.shape[1]
    groups = scales.shape[1]
    grid = (pl.cdiv(N, tile_n),)
    kernel = functools.partial(_qmm_kernel, bits=bits, group_size=group_size)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, packed), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, groups), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, groups), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 4 + N * packed + 4 * N * groups + M * N * 4,
            transcendentals=0,
        ),
    )(x, q, scales, biases)


def quantized_matmul_pallas(
    x: jax.Array,
    t: QuantizedTensor,
    tile_n: int = DEFAULT_TILE_N,
    interpret: bool = False,
) -> jax.Array:
    """x [..., K] @ dequant(t [N, K]).T -> [..., N]."""
    *lead, K = x.shape
    N = t.scales.shape[-2] if t.q.ndim == 2 else None
    if t.q.ndim != 2:
        raise ValueError("pallas qmm expects a 2-D (unstacked) weight")
    N = t.q.shape[0]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)
    tn = min(tile_n, N)
    # pad N to tile multiple
    out = _qmm_2d(
        x2, t.q, t.scales, t.biases,
        bits=t.bits, group_size=t.group_size, tile_n=tn, interpret=interpret,
    )
    return out.reshape(*lead, N)
