"""Fused packed-domain 4-bit KV decode attention.

Role parity: reference turboquant.py fully-fused decode kernels (:2021)
— attention math on PACKED sub-byte KV codes with no dequantized cache
copy in HBM.  The repo's Int8KVCache already runs integer-domain
attention at the int8 roofline; this kernel extends the design to 4-bit
codes: kv_bits=4 halves the KV bytes READ per decode step, not just the
bytes stored.

TPU design: one `pallas_call`, grid (B*Hkv, C/TC).  Codes are packed
along the head dim in two HALF PLANES (channels [0,D/2) in the low
nibble, [D/2,D) in the high nibble), so the unpack is two bit-ops with
no lane reorder, scores are two int8 MXU dots against the pre-quantized
query codes, and per-token affine scales fold into the score/probability
domain exactly as in Int8KVCache:

    q . k_c = qs * ( ks_c * (q8 . k4_c) + kb_c * sum(q8) )

Online softmax (m, l, acc scratch) accumulates across C tiles; the value
side folds vs into the probabilities and vb into a rank-1 correction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M_ROWS = 8  # query rows per (b, kv-head): g * S must fit


def _kernel(off_ref, scale_ref, lp_ref, q8_ref, qsum_ref, k4_ref, ks_ref,
            kb_ref, v4_ref, vs_ref, vb_ref, out_ref,
            m_scr, l_scr, acc_scr, bias_scr, *, TC: int, D: int):
    ct = pl.program_id(1)
    ncx = pl.num_programs(1)

    @pl.when(ct == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        bias_scr[:] = jnp.zeros_like(bias_scr)

    h = D // 2
    q8 = q8_ref[0]                                     # [8, D] int8
    k4 = k4_ref[0].astype(jnp.int32)                   # [TC, h]
    klo = (k4 & 0xF).astype(jnp.int8)
    khi = (k4 >> 4).astype(jnp.int8)
    dims = (((1,), (1,)), ((), ()))
    s_i = jax.lax.dot_general(q8[:, :h], klo, dims,
                              preferred_element_type=jnp.int32)
    s_i = s_i + jax.lax.dot_general(q8[:, h:], khi, dims,
                                    preferred_element_type=jnp.int32)
    ks = ks_ref[0].reshape(1, TC)
    kb = kb_ref[0].reshape(1, TC)
    qsum = qsum_ref[0][:, :1]                          # [8, 1] f32
    qs = qsum_ref[0][:, 1:2]
    scores = (s_i.astype(jnp.float32) * ks + qsum * kb) * qs \
        * scale_ref[0]

    # validity: left_pad <= position < offset (offset is per-row [BH] —
    # batched continuous-decode rows each see exactly their own history)
    b = pl.program_id(0)
    base = ct * TC
    ids = base + jax.lax.broadcasted_iota(jnp.int32, (M_ROWS, TC), 1)
    valid = (ids < off_ref[b]) & (ids >= lp_ref[b])
    scores = jnp.where(valid, scores, -jnp.inf)

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, scores.max(axis=-1, keepdims=True))
    # all-masked tiles keep m at -inf; guard the exp shift
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_safe), 0.0)
    p = jnp.exp(scores - m_safe)                       # [8, TC]
    p = jnp.where(valid, p, 0.0)

    v4 = v4_ref[0].astype(jnp.int32)
    vlo = (v4 & 0xF).astype(jnp.bfloat16)
    vhi = (v4 >> 4).astype(jnp.bfloat16)
    pv = (p * vs_ref[0].reshape(1, TC)).astype(jnp.bfloat16)
    dims2 = (((1,), (0,)), ((), ()))
    out_lo = jax.lax.dot_general(pv, vlo, dims2,
                                 preferred_element_type=jnp.float32)
    out_hi = jax.lax.dot_general(pv, vhi, dims2,
                                 preferred_element_type=jnp.float32)
    pb = (p * vb_ref[0].reshape(1, TC)).sum(axis=-1, keepdims=True)

    acc_scr[:, :h] = acc_scr[:, :h] * alpha + out_lo
    acc_scr[:, h:] = acc_scr[:, h:] * alpha + out_hi
    bias_scr[:] = bias_scr[:] * alpha + pb
    l_scr[:] = l_scr[:] * alpha + p.sum(axis=-1, keepdims=True)
    m_scr[:] = m_new

    @pl.when(ct == ncx - 1)
    def _():
        denom = jnp.maximum(l_scr[:], 1e-30)
        out_ref[0] = (acc_scr[:] + bias_scr[:]) / denom


def int4_kv_decode_attention(q8, qsum_qs, k4, ks, kb, v4, vs, vb,
                             offset, scale, left_pad=None, interpret=None):
    """q8 [BH, 8, D] int8 (padded query rows); qsum_qs [BH, 8, 2] f32
    (columns: sum(q8), per-row quant scale); k4/v4 [BH, C, D/2] u8 packed;
    ks/kb/vs/vb [BH, C] f32; offset scalar int32 OR per-row [BH]
    (continuous batching) -> out [BH, 8, D] f32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    BH, C, h = k4.shape
    offset = jnp.asarray(offset, jnp.int32)
    if offset.ndim == 0:
        offset = jnp.broadcast_to(offset, (BH,))
    D = 2 * h
    TC = 256 if C % 256 == 0 else 128 if C % 128 == 0 else C
    ncx = C // TC
    grid = (BH, ncx)

    kern = functools.partial(_kernel, TC=TC, D=D)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # offset
            pl.BlockSpec(memory_space=pltpu.SMEM),           # scale
            pl.BlockSpec(memory_space=pltpu.SMEM),           # left_pad [BH]
            pl.BlockSpec((1, M_ROWS, D), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((1, M_ROWS, 2), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((1, TC, h), lambda b, c: (b, c, 0)),
            # scales ride a [BH, 1, C] layout: Mosaic requires the last
            # two block dims to divide (8, 128) or equal the array dims —
            # a (1, TC) block over [BH, C] does neither
            pl.BlockSpec((1, 1, TC), lambda b, c: (b, 0, c)),
            pl.BlockSpec((1, 1, TC), lambda b, c: (b, 0, c)),
            pl.BlockSpec((1, TC, h), lambda b, c: (b, c, 0)),
            pl.BlockSpec((1, 1, TC), lambda b, c: (b, 0, c)),
            pl.BlockSpec((1, 1, TC), lambda b, c: (b, 0, c)),
        ],
        out_specs=pl.BlockSpec((1, M_ROWS, D), lambda b, c: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, M_ROWS, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((M_ROWS, 1), jnp.float32),
            pltpu.VMEM((M_ROWS, 1), jnp.float32),
            pltpu.VMEM((M_ROWS, D), jnp.float32),
            pltpu.VMEM((M_ROWS, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.atleast_1d(offset).astype(jnp.int32),
        jnp.atleast_1d(jnp.float32(scale)),
        (jnp.zeros((BH,), jnp.int32) if left_pad is None
         else jnp.asarray(left_pad, jnp.int32)),
        q8, qsum_qs, k4, ks[:, None], kb[:, None], v4, vs[:, None],
        vb[:, None],
    )
    return out
