"""Fused packed-domain codebook (TurboQuant) KV decode attention.

Role parity: reference turboquant.py fully-fused fractional decode
kernels (:2021) and codebook tables (:3628) — attention math on PACKED
2/3/4/5/6-bit Lloyd–Max codes with no dequantized cache copy in HBM, so
`--kv-bits 3.5` (3-bit K / 4-bit V) reads 3.5/16ths of the bf16 bytes at
long context instead of whole-cache-dequantizing first.

TPU design: one `pallas_call`, grid (B*Hkv, C/TC) with online softmax —
the same skeleton as ops/int4_kv_attention.py.  Codes arrive in the
bit-plane layout of core/turboquant.pack_codes (plane j = bit j of every
dim, 8 dims per byte, planes concatenated along lanes).  The in-kernel
decode is:

  1. lane-expand each plane's bytes [TC, D/8] -> [TC, D] and shift/mask
     out the per-dim bit;
  2. a binary SELECT TREE over the bit planes materializes
     lut[code] without any gather (2^b - 1 vector selects — VPU work
     that overlaps the next tile's DMA; the dots stay on the MXU).

Queries stay float and are ROTATED once outside (the Hadamard rotation
is orthogonal, so q.k == q_rot.k_rot); per-token scales fold into the
score/probability domain:

  q . k_c = kscale_c * (q_rot . lut[codes_c])
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M_ROWS = 8


def _decode_tile(packed, lut, bits: int, TC: int, D: int):
    """[TC, D*bits/8] strided bit-plane bytes -> [TC, D] bf16 codebook
    values (layout: core/turboquant.pack_codes — byte m bit i = dim
    i*w + m, so `pltpu.repeat` lays segment i at lanes [i*w, (i+1)*w))."""
    w = D // 8
    shift = jax.lax.broadcasted_iota(jnp.int32, (TC, D), 1) // w
    planes = []
    for j in range(bits):
        by = packed[:, j * w:(j + 1) * w].astype(jnp.int32)  # [TC, w]
        ex = pltpu.repeat(by, 8, axis=1)                     # [TC, D]
        planes.append(((ex >> shift) & 1).astype(jnp.bool_))
    # binary select tree, LSB first: vals[i] collapses lut[2i], lut[2i+1]
    vals = [jnp.float32(v) for v in lut]
    for j in range(bits):
        bit = planes[j]
        nxt = []
        for i in range(len(vals) // 2):
            lo, hi = vals[2 * i], vals[2 * i + 1]
            if isinstance(lo, jnp.ndarray) or isinstance(hi, jnp.ndarray):
                nxt.append(jnp.where(bit, hi, lo))
            else:
                nxt.append(jnp.where(bit, jnp.full((TC, D), hi, jnp.float32),
                                     jnp.full((TC, D), lo, jnp.float32)))
        vals = nxt
    return vals[0].astype(jnp.bfloat16)


def _kernel(off_ref, scale_ref, lp_ref, q_ref, kq_ref, ks_ref,
            vq_ref, vs_ref, out_ref, m_scr, l_scr, acc_scr,
            *, TC: int, D: int, k_bits: int, v_bits: int,
            k_lut: tuple, v_lut: tuple):
    ct = pl.program_id(1)
    ncx = pl.num_programs(1)

    @pl.when(ct == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.bfloat16)                  # [8, D]
    kdec = _decode_tile(kq_ref[0], k_lut, k_bits, TC, D)
    dims = (((1,), (1,)), ((), ()))
    s = jax.lax.dot_general(q, kdec, dims,
                            preferred_element_type=jnp.float32)
    scores = s * ks_ref[0].reshape(1, TC) * scale_ref[0]

    b = pl.program_id(0)
    base = ct * TC
    ids = base + jax.lax.broadcasted_iota(jnp.int32, (M_ROWS, TC), 1)
    valid = (ids < off_ref[b]) & (ids >= lp_ref[b])
    scores = jnp.where(valid, scores, -jnp.inf)

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, scores.max(axis=-1, keepdims=True))
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_safe), 0.0)
    p = jnp.exp(scores - m_safe)
    p = jnp.where(valid, p, 0.0)

    vdec = _decode_tile(vq_ref[0], v_lut, v_bits, TC, D)
    pv = (p * vs_ref[0].reshape(1, TC)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(pv, vdec, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)

    acc_scr[:] = acc_scr[:] * alpha + out
    l_scr[:] = l_scr[:] * alpha + p.sum(axis=-1, keepdims=True)
    m_scr[:] = m_new

    @pl.when(ct == ncx - 1)
    def _():
        denom = jnp.maximum(l_scr[:], 1e-30)
        out_ref[0] = acc_scr[:] / denom


def tq_kv_decode_attention(q_rot, kq, ks, vq, vs, offset, scale,
                           k_bits: int, v_bits: int, k_lut, v_lut,
                           left_pad=None, interpret=None):
    """q_rot [BH, 8, D] f32 ROTATED query rows (GQA group + padding);
    kq/vq [BH, C, D*bits/8] u8 bit-plane codes; ks/vs [BH, C] f32
    per-token scales; offset scalar or per-row [BH] -> out [BH, 8, D]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    BH, C, _ = kq.shape
    D = q_rot.shape[-1]
    TC = 256
    while C % TC:
        TC //= 2
    off = jnp.broadcast_to(jnp.atleast_1d(offset).astype(jnp.int32), (BH,))
    lp = (jnp.zeros((BH,), jnp.int32) if left_pad is None
          else jnp.broadcast_to(jnp.atleast_1d(left_pad).astype(jnp.int32),
                                (BH,)))
    kern = functools.partial(
        _kernel, TC=TC, D=D, k_bits=k_bits, v_bits=v_bits,
        k_lut=tuple(float(x) for x in k_lut),
        v_lut=tuple(float(x) for x in v_lut))
    wk = D * k_bits // 8
    wv = D * v_bits // 8
    grid = (BH, C // TC)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # offset [BH]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scale [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # left_pad [BH]
            pl.BlockSpec((1, M_ROWS, D), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((1, TC, wk), lambda b, c: (b, c, 0)),
            # scales ride [BH, 1, C] (Mosaic block-tiling rule; see
            # int4_kv_attention)
            pl.BlockSpec((1, 1, TC), lambda b, c: (b, 0, c)),
            pl.BlockSpec((1, TC, wv), lambda b, c: (b, c, 0)),
            pl.BlockSpec((1, 1, TC), lambda b, c: (b, 0, c)),
        ],
        out_specs=pl.BlockSpec((1, M_ROWS, D), lambda b, c: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, M_ROWS, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((M_ROWS, 1), jnp.float32),
            pltpu.VMEM((M_ROWS, 1), jnp.float32),
            pltpu.VMEM((M_ROWS, D), jnp.float32),
        ],
        interpret=interpret,
    )(off, jnp.atleast_1d(jnp.asarray(scale, jnp.float32)), lp,
      q_rot.astype(jnp.float32), kq, ks.astype(jnp.float32)[:, None],
      vq, vs.astype(jnp.float32)[:, None])
    return out


def _split_kernel(off_ref, scale_ref, lp_ref, q_ref, kqa_ref, ksa_ref,
                  kqb_ref, ksb_ref, vqa_ref, vsa_ref, vqb_ref, vsb_ref,
                  out_ref, m_scr, l_scr, acc_scr,
                  *, TC: int, DA: int, DB: int, lo_bits: int, hi_bits: int,
                  lo_lut: tuple, hi_lut: tuple):
    """Two-segment (outlier-split) codebook decode attention: segment A
    carries floor-bits codes over the first DA rotated dims, segment B
    ceil-bits codes over the last DB — scores sum BEFORE the online
    softmax (reference turboquant._SplitCodec.score_prepared)."""
    ct = pl.program_id(1)
    ncx = pl.num_programs(1)

    @pl.when(ct == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.bfloat16)                   # [8, DA+DB]
    dims = (((1,), (1,)), ((), ()))
    ka = _decode_tile(kqa_ref[0], lo_lut, lo_bits, TC, DA)
    kb = _decode_tile(kqb_ref[0], hi_lut, hi_bits, TC, DB)
    sa = jax.lax.dot_general(q[:, :DA], ka, dims,
                             preferred_element_type=jnp.float32)
    sb = jax.lax.dot_general(q[:, DA:], kb, dims,
                             preferred_element_type=jnp.float32)
    scores = (sa * ksa_ref[0].reshape(1, TC)
              + sb * ksb_ref[0].reshape(1, TC)) * scale_ref[0]

    b = pl.program_id(0)
    ids = ct * TC + jax.lax.broadcasted_iota(jnp.int32, (M_ROWS, TC), 1)
    valid = (ids < off_ref[b]) & (ids >= lp_ref[b])
    scores = jnp.where(valid, scores, -jnp.inf)

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, scores.max(axis=-1, keepdims=True))
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_safe), 0.0)
    p = jnp.where(valid, jnp.exp(scores - m_safe), 0.0)

    va = _decode_tile(vqa_ref[0], lo_lut, lo_bits, TC, DA)
    vb = _decode_tile(vqb_ref[0], hi_lut, hi_bits, TC, DB)
    pva = (p * vsa_ref[0].reshape(1, TC)).astype(jnp.bfloat16)
    pvb = (p * vsb_ref[0].reshape(1, TC)).astype(jnp.bfloat16)
    dims_pv = (((1,), (0,)), ((), ()))
    oa = jax.lax.dot_general(pva, va, dims_pv,
                             preferred_element_type=jnp.float32)
    ob = jax.lax.dot_general(pvb, vb, dims_pv,
                             preferred_element_type=jnp.float32)
    out = jnp.concatenate([oa, ob], axis=-1)

    acc_scr[:] = acc_scr[:] * alpha + out
    l_scr[:] = l_scr[:] * alpha + p.sum(axis=-1, keepdims=True)
    m_scr[:] = m_new

    @pl.when(ct == ncx - 1)
    def _():
        out_ref[0] = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)


def tq_kv_decode_attention_split(q_rot, kqa, ksa, kqb, ksb,
                                 vqa, vsa, vqb, vsb, offset, scale,
                                 lo_bits: int, hi_bits: int,
                                 lo_lut, hi_lut, left_pad=None,
                                 interpret=None):
    """Outlier-split fused decode: segment A = first DA rotated dims at
    lo_bits, segment B = last DB dims at hi_bits, per-token per-segment
    scales.  q_rot [BH, 8, DA+DB]; kqa/vqa [BH, C, DA*lo/8] u8;
    kqb/vqb [BH, C, DB*hi/8]; ks*/vs* [BH, C] f32 -> out [BH, 8, DA+DB]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    BH, C, wa = kqa.shape
    DA = wa * 8 // lo_bits
    DB = kqb.shape[-1] * 8 // hi_bits
    TC = 256
    while C % TC:
        TC //= 2
    off = jnp.broadcast_to(jnp.atleast_1d(offset).astype(jnp.int32), (BH,))
    lp = (jnp.zeros((BH,), jnp.int32) if left_pad is None
          else jnp.broadcast_to(jnp.atleast_1d(left_pad).astype(jnp.int32),
                                (BH,)))
    kern = functools.partial(
        _split_kernel, TC=TC, DA=DA, DB=DB, lo_bits=lo_bits,
        hi_bits=hi_bits, lo_lut=tuple(float(x) for x in lo_lut),
        hi_lut=tuple(float(x) for x in hi_lut))
    grid = (BH, C // TC)
    sc = pl.BlockSpec((1, 1, TC), lambda b, c: (b, 0, c))
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # offset [BH]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scale [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # left_pad [BH]
            pl.BlockSpec((1, M_ROWS, DA + DB), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((1, TC, wa), lambda b, c: (b, c, 0)), sc,
            pl.BlockSpec((1, TC, kqb.shape[-1]), lambda b, c: (b, c, 0)), sc,
            pl.BlockSpec((1, TC, wa), lambda b, c: (b, c, 0)), sc,
            pl.BlockSpec((1, TC, kqb.shape[-1]), lambda b, c: (b, c, 0)), sc,
        ],
        out_specs=pl.BlockSpec((1, M_ROWS, DA + DB), lambda b, c: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, M_ROWS, DA + DB), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((M_ROWS, 1), jnp.float32),
            pltpu.VMEM((M_ROWS, 1), jnp.float32),
            pltpu.VMEM((M_ROWS, DA + DB), jnp.float32),
        ],
        interpret=interpret,
    )(off, jnp.atleast_1d(jnp.asarray(scale, jnp.float32)), lp,
      q_rot.astype(jnp.float32),
      kqa, ksa.astype(jnp.float32)[:, None],
      kqb, ksb.astype(jnp.float32)[:, None],
      vqa, vsa.astype(jnp.float32)[:, None],
      vqb, vsb.astype(jnp.float32)[:, None])
    return out


__all__ = ["tq_kv_decode_attention", "tq_kv_decode_attention_split"]
