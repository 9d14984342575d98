"""Grouped-int4 decode matvec: y = x @ dequant(W) with W packed in HBM.

Role parity: reference delegates 4-bit decode to `mx.quantized_matmul`
(Metal qmv kernels).  TPU design: XLA cannot fuse sub-byte unpack into a
dot operand (it materializes the dequantized weight — measured 10-27 GB/s
effective vs the int8 channel path's ~700 GB/s on v5e), so this Pallas
kernel unpacks nibbles in VMEM right before the MXU.

Measured verdict (v5e via axon, 2026-08):
- kernel work rate ~530 GB/s on packed bytes (28-layer scan probe,
  gate/up shape: 3.47 ms vs 5.75 ms for the int8 XLA scan — 1.66x);
- BUT each pallas_call inside a scan step pays a ~60-120 us fixed launch
  cost on this stack (measured with trivial kernels; scalar-prefetch,
  operand count, and 2-D scale blocks all ruled out).  A 7B decode step
  makes 28 layers x 7 linears = 196 calls -> ~13 ms of pure overhead,
  so end-to-end the int8 channel path wins (99.7 vs 64 tok/s at 7B,
  364 vs 242 tok/s at 2B).  Until the launch cost drops (or linears are
  fused to ~2 calls/layer), MLX_VLM_TPU_RUNTIME_QUANT=w8chan stays the
  perf default and w4grp is the bit-exact opt-in.

Two distinctive design points:

1. **Halves packing** (core/quant.py Int4GroupedTensor): the low-nibble
   plane is output columns [0, N2p) and the high-nibble plane columns
   [N2p, 2*N2p), so dequant never lane-reorders — each plane scales in
   place and the kernel writes two contiguous column halves.

2. **Scalar-prefetch layer indexing**: inside a `lax.scan` over stacked
   layers, slicing weights per layer would materialize a copy of every
   operand feeding a custom call (custom-call operands are buffers; XLA
   can fuse a dynamic-slice into its own dots but not into ours).  The
   kernel instead takes the FULL [L*K, N2p] stacked array plus the layer
   index as a scalar-prefetch argument used in the BlockSpec index maps —
   DMA reads come straight from the resident stacked buffer, no copies.
   core/layers.py routes scan-body linears here via the quant-scan
   context (core/quant_scan.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.quant import Int4GroupedTensor, int4_grouped_matmul

# rows above this go through the XLA dequant path (prefill is
# compute-bound; materializing the dequantized tile is fine there)
MAX_KERNEL_ROWS = 8
# VMEM budget for the packed-weight block (double-buffered by Mosaic)
MAX_TK_BYTES = 4 << 20


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kern(l_ref, x_ref, qp_ref, sl_ref, sh_ref, bl_ref, bh_ref,
          ylo_ref, yhi_ref, *, gt, g):
    """One (column-tile, K-tile) grid step.

    x [M, TK] f32 | qp [TK, TN] u8 | s/b [gt, 1, TN] f32 -> y± [M, TN].
    """
    kt = pl.program_id(1)
    TK, TN = qp_ref.shape
    qi = qp_ref[:].astype(jnp.int32)
    lo = (qi & 0xF).astype(jnp.float32).reshape(gt, g, TN)
    hi = (qi >> 4).astype(jnp.float32).reshape(gt, g, TN)
    w_lo = (lo * sl_ref[:] + bl_ref[:]).reshape(TK, TN)
    w_hi = (hi * sh_ref[:] + bh_ref[:]).reshape(TK, TN)
    x = x_ref[:]
    acc_lo = jax.lax.dot_general(
        x, w_lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_hi = jax.lax.dot_general(
        x, w_hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kt == 0)
    def _():
        ylo_ref[:] = jnp.zeros_like(ylo_ref)
        yhi_ref[:] = jnp.zeros_like(yhi_ref)

    ylo_ref[:] += acc_lo
    yhi_ref[:] += acc_hi


def _pick_tk(K: int, g: int, tn: int, budget: int = MAX_TK_BYTES) -> int:
    """Largest K tile that divides K, is a multiple of g, and keeps the
    packed block under the VMEM budget."""
    if K * tn <= budget:
        return K
    best = g
    step = K // g
    for ng in range(step, 0, -1):
        tk = ng * g
        if K % tk == 0 and tk * tn <= budget:
            return tk
    return best


# ------------------------------------------------------------------ matmul
# Prefill-grade M-tiled kernel.  The round-4 fallback for M > 8 was the XLA
# dequant path (int4_grouped_matmul) whose sub-byte unpack runs at 10-27
# GB/s effective on v5e — a 1k-token 7B prefill took 2.4 s (~1.6% MFU).
# Here the weight tile dequantizes in VMEM straight into the MXU dot, so
# prefill is compute-bound like the reference's fused Metal qmm
# (reference delegates to mx.quantized_matmul, mlx_vlm/utils.py:657).

MM_TILE_M = 256
MM_TK_BYTES = 2 << 20  # packed block budget; x/y blocks scale with TM


def _mm_kern(l_ref, x_ref, qp_ref, sl_ref, sh_ref, bl_ref, bh_ref,
             ylo_ref, yhi_ref, alo_ref, ahi_ref, *, gt, g, nk):
    """One (M-tile, column-tile, K-tile) grid step.

    x [TM, TK] | qp [TK, TN] u8 | s/b [gt, 1, TN] f32 -> y± [TM, TN].
    Dequantized weights cast to x.dtype before the dot (same rounding as
    the XLA fallback: w.astype(x.dtype)); K-tile partials accumulate in
    f32 VMEM scratch, outputs flush in x.dtype on the last K tile.
    """
    kt = pl.program_id(2)
    TK, TN = qp_ref.shape
    x = x_ref[:]
    qi = qp_ref[:].astype(jnp.int32)
    lo = (qi & 0xF).astype(jnp.float32).reshape(gt, g, TN)
    hi = (qi >> 4).astype(jnp.float32).reshape(gt, g, TN)
    w_lo = (lo * sl_ref[:] + bl_ref[:]).reshape(TK, TN).astype(x.dtype)
    w_hi = (hi * sh_ref[:] + bh_ref[:]).reshape(TK, TN).astype(x.dtype)
    acc_lo = jax.lax.dot_general(
        x, w_lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_hi = jax.lax.dot_general(
        x, w_hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kt == 0)
    def _():
        alo_ref[:] = jnp.zeros_like(alo_ref)
        ahi_ref[:] = jnp.zeros_like(ahi_ref)

    alo_ref[:] += acc_lo
    ahi_ref[:] += acc_hi

    @pl.when(kt == nk - 1)
    def _():
        ylo_ref[:] = alo_ref[:].astype(ylo_ref.dtype)
        yhi_ref[:] = ahi_ref[:].astype(yhi_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n", "group_size", "n_layers", "interpret"),
)
def _int4_matmul(x, layer, qp, sl, sh, bl, bh, *, n, group_size, n_layers,
                 interpret):
    """x [M, K] (M a multiple of the M tile), stacked arrays flattened
    along layers -> [M, n] in x.dtype.

    qp [L*K, N2p]; sl/sh/bl/bh [L*G, 1, N2p]; layer: int32 scalar.
    """
    M = x.shape[0]
    LK, n2p = qp.shape
    K = LK // n_layers
    g = group_size
    G = K // g
    tn = 512 if n2p % 512 == 0 else (256 if n2p % 256 == 0 else 128)
    tk = _pick_tk(K, g, tn, MM_TK_BYTES)
    gt = tk // g
    nk = K // tk
    tm = min(MM_TILE_M, M)

    ylo, yhi = pl.pallas_call(
        functools.partial(_mm_kern, gt=gt, g=g, nk=nk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(M // tm, n2p // tn, nk),
            in_specs=[
                pl.BlockSpec((tm, tk), lambda m, j, kt, s: (m, kt)),
                pl.BlockSpec((tk, tn),
                             lambda m, j, kt, s: (s[0] * nk + kt, j)),
                pl.BlockSpec((gt, 1, tn),
                             lambda m, j, kt, s:
                             (s[0] * (G // gt) + kt, 0, j)),
                pl.BlockSpec((gt, 1, tn),
                             lambda m, j, kt, s:
                             (s[0] * (G // gt) + kt, 0, j)),
                pl.BlockSpec((gt, 1, tn),
                             lambda m, j, kt, s:
                             (s[0] * (G // gt) + kt, 0, j)),
                pl.BlockSpec((gt, 1, tn),
                             lambda m, j, kt, s:
                             (s[0] * (G // gt) + kt, 0, j)),
            ],
            out_specs=[
                pl.BlockSpec((tm, tn), lambda m, j, kt, s: (m, j)),
                pl.BlockSpec((tm, tn), lambda m, j, kt, s: (m, j)),
            ],
            scratch_shapes=[
                pltpu.VMEM((tm, tn), jnp.float32),
                pltpu.VMEM((tm, tn), jnp.float32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((M, n2p), x.dtype),
                   jax.ShapeDtypeStruct((M, n2p), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.atleast_1d(layer).astype(jnp.int32), x, qp, sl, sh, bl, bh)
    return jnp.concatenate([ylo, yhi], axis=-1)[:, :n]


@functools.partial(
    jax.jit,
    static_argnames=("n", "group_size", "n_layers", "interpret"),
)
def _int4_matvec(x, layer, qp, sl, sh, bl, bh, *, n, group_size, n_layers,
                 interpret):
    """x [M, K] f32, stacked arrays flattened along layers -> [M, n] f32.

    qp [L*K, N2p]; sl/sh/bl/bh [L*G, 1, N2p]; layer: int32 scalar.
    """
    M = x.shape[0]
    LK, n2p = qp.shape
    K = LK // n_layers
    g = group_size
    G = K // g
    tn = 512 if n2p % 512 == 0 else (256 if n2p % 256 == 0 else 128)
    tk = _pick_tk(K, g, tn)
    gt = tk // g
    nk = K // tk

    ylo, yhi = pl.pallas_call(
        functools.partial(_kern, gt=gt, g=g),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n2p // tn, nk),
            in_specs=[
                pl.BlockSpec((M, tk), lambda j, kt, s: (0, kt)),
                pl.BlockSpec((tk, tn),
                             lambda j, kt, s: (s[0] * nk + kt, j)),
                pl.BlockSpec((gt, 1, tn),
                             lambda j, kt, s: (s[0] * (G // gt) + kt, 0, j)),
                pl.BlockSpec((gt, 1, tn),
                             lambda j, kt, s: (s[0] * (G // gt) + kt, 0, j)),
                pl.BlockSpec((gt, 1, tn),
                             lambda j, kt, s: (s[0] * (G // gt) + kt, 0, j)),
                pl.BlockSpec((gt, 1, tn),
                             lambda j, kt, s: (s[0] * (G // gt) + kt, 0, j)),
            ],
            out_specs=[
                pl.BlockSpec((M, tn), lambda j, kt, s: (0, j)),
                pl.BlockSpec((M, tn), lambda j, kt, s: (0, j)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((M, n2p), jnp.float32),
                   jax.ShapeDtypeStruct((M, n2p), jnp.float32)],
        interpret=interpret,
    )(jnp.atleast_1d(layer).astype(jnp.int32), x, qp, sl, sh, bl, bh)
    return jnp.concatenate([ylo, yhi], axis=-1)[:, :n]


def int4_matvec(x: jax.Array, t: Int4GroupedTensor,
                layer=None) -> jax.Array:
    """x [..., K] @ dequant(t).T -> [..., N].

    `t` may be a single weight ([K, N2p] arrays) or a stacked one
    ([L, K, N2p]) with `layer` selecting the slice WITHOUT copying (see
    module docstring).  Rows > MAX_KERNEL_ROWS take the XLA dequant path.
    """
    *lead, K = x.shape
    M = 1
    for d in lead:
        M *= d
    stacked = t.qp.ndim == 3
    if M == 0:
        return jnp.zeros((*lead, t.n), x.dtype)
    if M > MAX_KERNEL_ROWS:
        # prefill-grade M-tiled kernel (see _int4_matmul): tile-dequant in
        # VMEM feeding the MXU; the XLA dequant fallback measured 10-27
        # GB/s effective and regressed 1k-token prefill to 2.4 s
        if stacked:
            L, _, n2p = t.qp.shape
            qp = t.qp.reshape(L * K, n2p)
            G = t.sl.shape[1]
            sl = t.sl.reshape(L * G, 1, n2p)
            sh = t.sh.reshape(L * G, 1, n2p)
            bl = t.bl.reshape(L * G, 1, n2p)
            bh = t.bh.reshape(L * G, 1, n2p)
            lidx = layer if layer is not None else 0
        else:
            L = 1
            qp, sl, sh, bl, bh = t.qp, t.sl, t.sh, t.bl, t.bh
            lidx = 0
        interpret = jax.default_backend() != "tpu"
        tm = min(MM_TILE_M, _round_up(M, 128))
        Mp = _round_up(M, tm)
        xm = x.reshape(M, K)
        if Mp != M:
            xm = jnp.pad(xm, ((0, Mp - M), (0, 0)))
        y = _int4_matmul(
            xm, lidx, qp, sl, sh, bl, bh,
            n=t.n, group_size=t.group_size, n_layers=L, interpret=interpret)
        return y[:M].reshape(*lead, t.n)
    if stacked:
        L, _, n2p = t.qp.shape
        qp = t.qp.reshape(L * K, n2p)
        G = t.sl.shape[1]
        sl = t.sl.reshape(L * G, 1, n2p)
        sh = t.sh.reshape(L * G, 1, n2p)
        bl = t.bl.reshape(L * G, 1, n2p)
        bh = t.bh.reshape(L * G, 1, n2p)
        lidx = layer if layer is not None else 0
    else:
        L = 1
        qp, sl, sh, bl, bh = t.qp, t.sl, t.sh, t.bl, t.bh
        lidx = 0
    interpret = jax.default_backend() != "tpu"
    xm = x.reshape(M, K).astype(jnp.float32)
    # pad rows to the f32 sublane tile: an M=1 block compiles to 1-sublane
    # layouts that serialize the dequant VPU work (measured ~3x slower on
    # the 152k-vocab lm_head); the zero rows are free on the MXU
    Mp = M
    if M < MAX_KERNEL_ROWS:
        Mp = MAX_KERNEL_ROWS
        xm = jnp.zeros((Mp, K), jnp.float32).at[:M].set(xm)
    y = _int4_matvec(
        xm, lidx, qp, sl, sh, bl, bh,
        n=t.n, group_size=t.group_size, n_layers=L, interpret=interpret)
    return y[:M].reshape(*lead, t.n).astype(x.dtype)
