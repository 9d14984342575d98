"""Fused quantized matmul Pallas kernel: y = x @ dequant(W).T

Role parity: reference delegates to `mx.quantized_matmul` (mlx internals) and
ships custom Metal qmv/qmm kernels for 1-bit (quantization/one_bit.py:212).

TPU design: W stays packed in HBM (uint8: 2x int4 or 1x int8 per byte) and is
dequantized tile-by-tile in VMEM right before feeding the MXU — HBM traffic
is ~4x (int4) lower than bf16 weights, which is the decode-throughput win
for 4-bit checkpoints.

Mosaic constraint: lane-interleaving reshapes are unsupported, so the int4
path never reorders nibbles.  The caller splits x into even/odd columns
(x[..., 0::2], x[..., 1::2] — cheap XLA gathers) and the kernel computes
   y = x_even @ dq(lo).T + x_odd @ dq(hi).T
where lo/hi are the low/high nibbles, each dequantized in grouped 3-D form
(only minor-dim split/merge reshapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.quant import QuantizedTensor

DEFAULT_TILE_N = 256


def _dq(codes_f32, s, b, group_elems):
    """[TN, Kc] codes + [TN, G] scale/bias -> dequantized [TN, Kc].

    Mosaic can't split the 128-lane minor dim (reshape to [TN, G, g]), so the
    per-group scale/bias are lane-expanded with a one-hot expansion matmul
    built from iota (runs on the MXU, no layout casts)."""
    tn, kc = codes_f32.shape
    G = s.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (G, kc), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (G, kc), 1)
    expand = (col // group_elems == row).astype(jnp.float32)  # [G, Kc]
    s_full = jax.lax.dot_general(
        s, expand, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    b_full = jax.lax.dot_general(
        b, expand, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return codes_f32 * s_full + b_full


def _qmm4_kernel(xe_ref, xo_ref, q_ref, s_ref, b_ref, o_ref, *, group_size):
    kt = pl.program_id(1)
    q = q_ref[:].astype(jnp.int32)  # [TN, TK/2] packed bytes
    lo = (q & 0x0F).astype(jnp.float32)
    hi = (q >> 4).astype(jnp.float32)
    hg = group_size // 2
    s = s_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    # f32 dequant + f32 MXU inputs: measured FASTER than bf16 inputs on v5e
    # (129 vs 112 tok/s in-model) — the cast itself costs more VPU time than
    # the MXU saves at these K
    w_lo = _dq(lo, s, b, hg)
    w_hi = _dq(hi, s, b, hg)
    xe = xe_ref[:].astype(jnp.float32)
    xo = xo_ref[:].astype(jnp.float32)
    acc = jax.lax.dot_general(
        xe, w_lo, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc += jax.lax.dot_general(
        xo, w_hi, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # K is tiled on the innermost grid dim; the output block is revisited
    # and accumulated across K tiles
    @pl.when(kt == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += acc.astype(o_ref.dtype)


def _qmm8_kernel(x_ref, q_ref, s_ref, b_ref, o_ref, *, group_size):
    kt = pl.program_id(1)
    codes = q_ref[:].astype(jnp.int32).astype(jnp.float32)
    w = _dq(codes, s_ref[:].astype(jnp.float32), b_ref[:].astype(jnp.float32),
            group_size)
    x = x_ref[:].astype(jnp.float32)
    acc = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(kt == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += acc.astype(o_ref.dtype)


VMEM_BUDGET = 12 * 1024 * 1024


def pick_tile_n(K: int, bits: int, requested: int) -> int:
    """Largest N tile whose dequant scratch fits VMEM (empirically ~7.5
    bytes per (tile_n x K) element on v5e Mosaic).  K is never tiled:
    Mosaic requires lane-dim blocks of 128 or the full array, and the
    per-group scales have only K/group lanes.  128 floor = minimum lane
    tile."""
    for tn in (requested, 512, 256, 128):
        if tn <= requested and 7.5 * tn * K <= VMEM_BUDGET:
            return tn
    return 128


@functools.partial(
    jax.jit, static_argnames=("bits", "group_size", "tile_n", "interpret")
)
def _qmm_2d(x, q, scales, biases, *, bits, group_size, tile_n, interpret):
    M, K = x.shape
    N = q.shape[0]
    per_byte = 8 // bits
    tile_k = K  # full-K blocks (see pick_tile_n)
    grid = (pl.cdiv(N, tile_n), K // tile_k)
    packed_tk = tile_k // per_byte
    groups_tk = tile_k // group_size
    common = dict(
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=grid,
        out_specs=pl.BlockSpec((M, tile_n), lambda i, kt: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 4 + N * K // per_byte + M * N * 4,
            transcendentals=0,
        ),
    )
    w_specs = [
        pl.BlockSpec((tile_n, packed_tk), lambda i, kt: (i, kt),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, groups_tk), lambda i, kt: (i, kt),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, groups_tk), lambda i, kt: (i, kt),
                     memory_space=pltpu.VMEM),
    ]
    if bits == 4:
        xe = x[:, 0::2]
        xo = x[:, 1::2]
        kernel = functools.partial(_qmm4_kernel, group_size=group_size)
        half_tk = tile_k // 2
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec((M, half_tk), lambda i, kt: (0, kt),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, half_tk), lambda i, kt: (0, kt),
                             memory_space=pltpu.VMEM),
                *w_specs,
            ],
            **common,
        )(xe, xo, q, scales, biases)
    kernel = functools.partial(_qmm8_kernel, group_size=group_size)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((M, tile_k), lambda i, kt: (0, kt),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        **common,
    )(x, q, scales, biases)


def quantized_matmul_pallas(
    x: jax.Array,
    t: QuantizedTensor,
    tile_n: int = DEFAULT_TILE_N,
    interpret: bool = False,
) -> jax.Array:
    """x [..., K] @ dequant(t [N, K]).T -> [..., N]."""
    if t.q.ndim != 2:
        raise ValueError("pallas qmm expects a 2-D (unstacked) weight")
    *lead, K = x.shape
    N = t.q.shape[0]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)
    tn = min(pick_tile_n(K, t.bits, tile_n), N)
    out = _qmm_2d(
        x2, t.q, t.scales, t.biases,
        bits=t.bits, group_size=t.group_size, tile_n=tn, interpret=interpret,
    )
    return out.reshape(*lead, N)
