"""Whole-stack fused int4 decode step — ONE Pallas call for all L layers.

Role parity: the reference's decode hot path is `mx.quantized_matmul`
(fused Metal qmv) called per-linear inside per-layer modules
(reference mlx_vlm/generate/ar.py:325 `_step`).  On TPU the analogous
per-linear kernel is ops/int4_matvec.py, but at M=1 the decode step is
purely HBM-bandwidth-bound and every kernel boundary drains the DMA
pipeline: 7 linears x 28 layers = ~200 boundaries cost ~35% of the
roofline.  The TPU-native answer is a single gridless `pallas_call`
that walks the whole stack with MANUAL double-buffered DMA:

    fori over layers; per layer a statically-unrolled item list
      [qkv tiles | kv-hist | o tiles | gate_up tiles | down K-tiles]
    each item: start DMA(next item) -> wait DMA(this item) -> compute

Measured motivation (v5e via axon, 7B shapes, 2026-08): Mosaic's
automatic BlockSpec pipeline SERIALIZES compute after DMA on this stack
(per-phase ablations: DMA-only floor 4.84 ms, +dequant 5.63, +dots 8.52
— exactly additive), while a hand-rolled early-issue double buffer
overlaps them and the raw DMA floor is ~1265 GB/s (tools/probe_overlap).
Manual DMA puts the step at max(DMA, compute) instead of their sum.

- Weight bytes stream exactly once per step, double-buffered against
  compute; scales ride a parallel slot pool per stream.
- The KV-cache history for layer l is DMA'd one layer ahead (issued in
  layer l-1's gate/up run); scores are masked by the `offset` scalar,
  and the current token's k/v (computed earlier in the same kernel)
  contribute one extra attention column.
- Activations (hidden, normed x, qkv halves, attention out, gate/up
  halves) live in f32 VMEM scratch that persists across the whole step;
  the only HBM activation traffic per decode step is h_in, h_out, and
  the L per-layer k/v vectors.
- Scales/biases are stored f16 (the mlx checkpoint's own precision),
  shipped as uint16 bit patterns and decoded in-kernel (Mosaic has no
  f16 vectors); packed [G, 4, N2p] = (sl, sh, bl, bh).

Weight layout matches core/quant.py Int4GroupedTensor halves-packing;
q|k|v and gate|up are concatenated along packed columns at pack-build
time, which the layout supports without any nibble reshuffling.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.quant import Int4GroupedTensor

M_ROWS = 8  # f32 sublane tile; row 0 is the real token


def _pick_tn(n2p: int, cap: int = 512) -> int:
    # lane-dim block sizes must be multiples of 128 on TPU
    for tn in (512, 384, 256, 128):
        if tn <= cap and n2p % tn == 0:
            return tn
    return n2p


def _pick_tk(K: int, g: int, width: int, budget: int = 1 << 20) -> int:
    """K-tile: multiple of g, divides K, packed block under `budget`."""
    best = g
    for mult in range(K // g, 0, -1):
        tk = mult * g
        if K % tk == 0 and tk * width <= budget:
            return tk
    return best


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "qkv_qp", "qkv_sc", "qkv_bias", "o_qp", "o_sc",
        "gu_qp", "gu_sc", "dn_qp", "dn_sc", "norms",
    ],
    meta_fields=[
        "dim", "inter", "n_layers", "n_heads", "n_kv", "head_dim",
        "group_size", "eps", "nq2", "nk2", "nv2", "no2", "ng2", "nd2",
    ],
)
@dataclasses.dataclass
class FusedDecodePack:
    """Per-model fused weight pack (built once after load).

    TILE-MAJOR layout: every DMA tile is contiguous in HBM (column-sliced
    tiles would DMA in 384-512B row segments, measurably slower).

    qkv_qp: u8 [L, NQ, K, TNQ]  NQ*TNQ = nq2+nk2+nv2 (half-widths)
    qkv_sc: u16 [L, NQ, G, 4, TNQ]  rows: sl, sh, bl, bh (f16 bits)
    qkv_bias: f32 [L, 2, Cq]   lo/hi-plane bias (zeros when absent)
    o_qp:  u8 [L, NO, K, TNO];  o_sc [L, NO, G, 4, TNO]
    gu_qp: u8 [L, NGU, K, TNG]  gate|up along packed columns
    dn_qp: u8 [L, ND, TKD, Cd];  dn_sc [L, ND, TKD/g, 4, Cd]
    norms: f32 [L, 2, D]   input_layernorm, post_attention_layernorm
    """

    qkv_qp: jax.Array
    qkv_sc: jax.Array
    qkv_bias: jax.Array
    o_qp: jax.Array
    o_sc: jax.Array
    gu_qp: jax.Array
    gu_sc: jax.Array
    dn_qp: jax.Array
    dn_sc: jax.Array
    norms: jax.Array
    dim: int = 0
    inter: int = 0
    n_layers: int = 0
    n_heads: int = 0
    n_kv: int = 0
    head_dim: int = 0
    group_size: int = 64
    eps: float = 1e-6
    nq2: int = 0
    nk2: int = 0
    nv2: int = 0
    no2: int = 0
    ng2: int = 0
    nd2: int = 0


def _cat_tensors(ts):
    """Concatenate stacked Int4GroupedTensors along packed columns.

    Returns (qp [L,K,C], sc_f16 [L,G,4,C], half_widths)."""
    qp = jnp.concatenate([t.qp for t in ts], axis=-1)
    rows = []
    for name in ("sl", "sh", "bl", "bh"):
        rows.append(jnp.concatenate(
            [getattr(t, name) for t in ts], axis=-1))  # [L, G, 1, C]
    sc = jnp.concatenate(rows, axis=2)  # [L, G, 4, C] f32
    return qp, sc, [t.qp.shape[-1] for t in ts]


def _plane_bias(bias, n, n2p):
    """[L, n] bias -> ([L, n2p] lo, [L, n2p] hi) plane layout."""
    L = bias.shape[0]
    b = jnp.zeros((L, 2 * n2p), jnp.float32)
    b = b.at[:, :n].set(bias.astype(jnp.float32))
    return b[:, :n2p], b[:, n2p:]


def build_fused_pack(mp: dict, args, scale_dtype=jnp.float16
                     ) -> Optional[FusedDecodePack]:
    """Build the pack from stacked layer params `mp = params["model"]`.

    Returns None when the layer linears are not all stacked
    Int4GroupedTensor (then the per-linear path is used instead)."""
    layers = mp["layers"]
    try:
        attn = layers["self_attn"]
        mlp = layers["mlp"]
        ws = [attn[f"{k}_proj"]["weight"] for k in ("q", "k", "v", "o")]
        ws += [mlp[f"{k}_proj"]["weight"] for k in ("gate", "up", "down")]
    except (KeyError, TypeError):
        return None
    if not all(isinstance(w, Int4GroupedTensor) and w.qp.ndim == 3
               for w in ws):
        return None
    wq, wk, wv, wo, wg, wu, wd = ws
    if len({w.group_size for w in ws}) != 1:
        return None
    g = wq.group_size
    L, K, _ = wq.qp.shape
    D = args.hidden_size
    I = wd.qp.shape[1]
    if K % g or I % g or K != D:
        return None
    # v1 supports the standard head layout (n_heads * head_dim == D)
    if args.num_attention_heads * (D // args.num_attention_heads) != D:
        return None
    if wq.n != D or wo.n != D or wd.n != D or wg.n != I or wu.n != I:
        return None

    qkv_qp, qkv_sc, (nq2, nk2, nv2) = _cat_tensors([wq, wk, wv])
    gu_qp, gu_sc, (ng2, _) = _cat_tensors([wg, wu])
    o_qp, o_sc, (no2,) = _cat_tensors([wo])
    dn_qp, dn_sc, (nd2,) = _cat_tensors([wd])
    if scale_dtype == jnp.float16:
        # Mosaic has no f16 vectors: ship the exact f16 bit patterns as
        # uint16 and decode to f32 in-kernel (integer ops, see _f16_to_f32)
        qkv_sc, gu_sc, o_sc, dn_sc = (
            jax.lax.bitcast_convert_type(a.astype(jnp.float16), jnp.uint16)
            for a in (qkv_sc, gu_sc, o_sc, dn_sc))
    else:
        qkv_sc, gu_sc, o_sc, dn_sc = (
            a.astype(scale_dtype) for a in (qkv_sc, gu_sc, o_sc, dn_sc))

    # tile-major relayout: one contiguous HBM region per DMA tile
    import os

    tiles = os.environ.get("FUSED_DECODE_TILES", "")
    if tiles:
        TNQ, TNO, TNG, TKD = (int(t) for t in tiles.split(","))
    else:
        TNQ = _pick_tn(qkv_qp.shape[-1])
        TNO = _pick_tn(o_qp.shape[-1])
        TNG = _pick_tn(gu_qp.shape[-1])
        TKD = _pick_tk(wd.qp.shape[1], g, dn_qp.shape[-1])

    def tile_cols(qp, sc, tn):
        Lx, Kx, Cx = qp.shape
        n = Cx // tn
        qp = qp.reshape(Lx, Kx, n, tn).transpose(0, 2, 1, 3)
        Gx = sc.shape[1]
        sc = sc.reshape(Lx, Gx, 4, n, tn).transpose(0, 3, 1, 2, 4)
        return qp, sc

    qkv_qp, qkv_sc = tile_cols(qkv_qp, qkv_sc, TNQ)
    o_qp, o_sc = tile_cols(o_qp, o_sc, TNO)
    gu_qp, gu_sc = tile_cols(gu_qp, gu_sc, TNG)
    Ld, Id, Cd = dn_qp.shape
    nd = Id // TKD
    dn_qp = dn_qp.reshape(Ld, nd, TKD, Cd)
    dn_sc = dn_sc.reshape(Ld, nd, TKD // g, 4, Cd)

    zeros = jnp.zeros((L, 1), jnp.bfloat16)
    parts = []
    for w, t in ((wq, attn["q_proj"]), (wk, attn["k_proj"]),
                 (wv, attn["v_proj"])):
        b = t.get("bias")
        if b is None:
            b = jnp.zeros((L, w.n), jnp.bfloat16)
        parts.append(_plane_bias(b, w.n, w.qp.shape[-1]))
    qkv_bias = jnp.stack([
        jnp.concatenate([p[0] for p in parts], axis=-1),
        jnp.concatenate([p[1] for p in parts], axis=-1),
    ], axis=1)  # [L, 2, Cq]

    norms = jnp.stack([
        layers["input_layernorm"]["weight"].astype(jnp.float32),
        layers["post_attention_layernorm"]["weight"].astype(jnp.float32),
    ], axis=1)  # [L, 2, D]

    return FusedDecodePack(
        qkv_qp=qkv_qp, qkv_sc=qkv_sc, qkv_bias=qkv_bias,
        o_qp=o_qp, o_sc=o_sc, gu_qp=gu_qp, gu_sc=gu_sc,
        dn_qp=dn_qp, dn_sc=dn_sc, norms=norms,
        dim=D, inter=I, n_layers=L,
        n_heads=args.num_attention_heads,
        n_kv=args.num_key_value_heads,
        head_dim=D // args.num_attention_heads,
        group_size=g, eps=args.rms_norm_eps,
        nq2=nq2, nk2=nk2, nv2=nv2, no2=no2, ng2=ng2, nd2=nd2,
    )


def _f16_to_f32(u):
    """Decode f16 bit patterns (held in an integer array) to f32.

    Integer-only VPU path because Mosaic has no f16 vector type.  Handles
    normals and subnormals; exp=31 (inf/nan) maps to a large finite value,
    which real quantization scales never contain."""
    u = u.astype(jnp.int32)
    sign = jnp.where((u >> 15) & 1 != 0, -1.0, 1.0).astype(jnp.float32)
    exp = (u >> 10) & 0x1F
    mant = u & 0x3FF
    normal = jax.lax.bitcast_convert_type(
        ((exp + 112) << 23) | (mant << 13), jnp.float32)
    sub = mant.astype(jnp.float32) * jnp.float32(5.9604645e-8)
    return sign * jnp.where(exp == 0, sub, normal)


_ABLATE = frozenset(
    __import__("os").environ.get("FUSED_DECODE_ABLATE", "").split(","))


def _mv(x, qp, sc, g):
    """x [8, TK] f32 @ dequant(tile) -> (ylo, yhi) [8, TN] f32.

    qp tile [TK, TN] u8 (read from a DMA slot); sc [gt, 4, TN]."""
    TK, TN = qp.shape
    M = x.shape[0]
    gt = TK // g
    if "mv" in _ABLATE:  # touch one lane of the tile, no math
        z = qp[0:8, 0:128].astype(jnp.int32).astype(jnp.float32)
        zz = jnp.sum(z) * 0.0
        return (jnp.zeros((M, TN), jnp.float32) + zz,
                jnp.zeros((M, TN), jnp.float32))
    qi = qp.astype(jnp.int32)
    lo = (qi & 0xF).astype(jnp.float32).reshape(gt, g, TN)
    hi = (qi >> 4).astype(jnp.float32).reshape(gt, g, TN)
    if "scdec" in _ABLATE or sc.dtype != jnp.uint16:
        sc = sc.astype(jnp.float32)  # [gt, 4, TN]
    else:
        sc = _f16_to_f32(sc)  # [gt, 4, TN]
    sl = sc[:, 0:1, :]
    sh = sc[:, 1:2, :]
    bl = sc[:, 2:3, :]
    bh = sc[:, 3:4, :]
    # bf16 operands: f32 MXU passes are ~4x slower and become the grid
    # bottleneck; bf16 weights match the XLA dequant path's precision
    w_lo = (lo * sl + bl).reshape(TK, TN).astype(jnp.bfloat16)
    w_hi = (hi * sh + bh).reshape(TK, TN).astype(jnp.bfloat16)
    if "dot" in _ABLATE:
        zl = jnp.sum(w_lo[0:8, 0:128].astype(jnp.float32)) * 0.0
        zh = jnp.sum(w_hi[0:8, 0:128].astype(jnp.float32)) * 0.0
        return (jnp.zeros((M, TN), jnp.float32) + zl,
                jnp.zeros((M, TN), jnp.float32) + zh)
    xb = x.astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    ylo = jax.lax.dot_general(xb, w_lo, dims,
                              preferred_element_type=jnp.float32)
    yhi = jax.lax.dot_general(xb, w_hi, dims,
                              preferred_element_type=jnp.float32)
    return ylo, yhi


def _rope_rows(x, cos, sin):
    """x [R, hd] f32, cos/sin [1, hd] (duplicated-half convention)."""
    hd = x.shape[-1]
    x1 = x[:, : hd // 2]
    x2 = x[:, hd // 2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rot * sin


def _halves(lo, hi, n):
    """concat plane slices -> logical [R, n]."""
    return jnp.concatenate([lo, hi], axis=-1)[:, :n]


def make_kernel(plan):
    """Kernel body closure over the static plan (manual-DMA design)."""
    p = plan
    D, I, g = p.dim, p.inter, p.group_size
    nh, nkv, hd = p.n_heads, p.n_kv, p.head_dim
    gq = nh // nkv
    n_q, n_k = nh * hd, nkv * hd
    # per-layer consumption order of weight tiles: (kind, tile_index)
    SEQ = ([("qkv", j) for j in range(p.NQ)]
           + [("o", j) for j in range(p.NO)]
           + [("gu", j) for j in range(p.NGU)]
           + [("dn", j) for j in range(p.ND)])
    KIND_N = {"qkv": p.NQ, "o": p.NO, "gu": p.NGU, "dn": p.ND}

    def kernel(off_ref, h_in_ref, cossin_ref, qkv_b_ref, norms_ref,
               qkv_qp_hbm, qkv_sc_hbm, o_qp_hbm, o_sc_hbm,
               gu_qp_hbm, gu_sc_hbm, dn_qp_hbm, dn_sc_hbm,
               k_hist_hbm, v_hist_hbm,
               h_out_ref, k_new_ref, v_new_ref,
               sc_h, sc_xn, sc_qlo, sc_qhi, sc_attn, sc_qh, sc_kvh, sc_oh,
               sc_glo, sc_ghi, sc_act, sc_dlo, sc_dhi,
               sl_qkv_qp, sl_qkv_sc, sl_o_qp, sl_o_sc,
               sl_gu_qp, sl_gu_sc, sl_dn_qp, sl_dn_sc, sl_k, sl_v,
               sem_qkv_qp, sem_qkv_sc, sem_o_qp, sem_o_sc,
               sem_gu_qp, sem_gu_sc, sem_dn_qp, sem_dn_sc,
               sem_k, sem_v):
        hbm = {"qkv": (qkv_qp_hbm, qkv_sc_hbm), "o": (o_qp_hbm, o_sc_hbm),
               "gu": (gu_qp_hbm, gu_sc_hbm), "dn": (dn_qp_hbm, dn_sc_hbm)}
        slots = {"qkv": (sl_qkv_qp, sl_qkv_sc), "o": (sl_o_qp, sl_o_sc),
                 "gu": (sl_gu_qp, sl_gu_sc), "dn": (sl_dn_qp, sl_dn_sc)}
        sems = {"qkv": (sem_qkv_qp, sem_qkv_sc), "o": (sem_o_qp, sem_o_sc),
                "gu": (sem_gu_qp, sem_gu_sc), "dn": (sem_dn_qp, sem_dn_sc)}

        def tile_dmas(kind, l, j):
            """(qp_dma, sc_dma, slot) for tile j of `kind` in layer l."""
            qp_hbm, sc_hbm = hbm[kind]
            qp_sl, sc_sl = slots[kind]
            qp_sem, sc_sem = sems[kind]
            slot = jax.lax.rem(l * KIND_N[kind] + j, 2)
            qp_src = qp_hbm.at[l, j]
            sc_src = sc_hbm.at[l, j]
            return (pltpu.make_async_copy(qp_src, qp_sl.at[slot],
                                          qp_sem.at[slot]),
                    pltpu.make_async_copy(sc_src, sc_sl.at[slot],
                                          sc_sem.at[slot]),
                    slot)

        def issue(kind, l, j):
            if "nodma" in _ABLATE:
                return
            qp_dma, sc_dma, _ = tile_dmas(kind, l, j)
            qp_dma.start()
            sc_dma.start()

        def kv_dmas(l):
            slot = jax.lax.rem(l, 2)
            return (pltpu.make_async_copy(k_hist_hbm.at[l, 0],
                                          sl_k.at[slot], sem_k.at[slot]),
                    pltpu.make_async_copy(v_hist_hbm.at[l, 0],
                                          sl_v.at[slot], sem_v.at[slot]),
                    slot)

        def issue_kv(l):
            if "nodma" in _ABLATE:
                return
            kd, vd, _ = kv_dmas(l)
            kd.start()
            vd.start()

        def issue_next(l, i):
            """Start DMA for consumption item i+1 (wrapping into l+1)."""
            if i + 1 < len(SEQ):
                kind, j = SEQ[i + 1]
                issue(kind, l, j)
            else:
                @pl.when(l + 1 < p.n_layers)
                def _():
                    issue("qkv", l + 1, 0)

        def wait_tile(kind, l, j):
            qp_sl, sc_sl = slots[kind]
            if "nodma" in _ABLATE:
                return qp_sl[0], sc_sl[0]
            qp_dma, sc_dma, slot = tile_dmas(kind, l, j)
            qp_dma.wait()
            sc_dma.wait()
            return qp_sl[slot], sc_sl[slot]

        def attention(l):
            if "nodma" in _ABLATE:
                slot = 0
            else:
                kd, vd, slot = kv_dmas(l)
                kd.wait()
                vd.wait()
            # one head-major relayout per layer; per-kv-head math then
            # touches only sublane slices (no lane<->sublane moves)
            lb = qkv_b_ref[pl.ds(l, 1)][0]  # [2, Cq]
            lo = sc_qlo[0:1, :] + lb[0:1, :]
            hi = sc_qhi[0:1, :] + lb[1:2, :]
            cos = cossin_ref[0:1, :]
            sin = cossin_ref[1:2, :]
            q = _halves(lo[:, : p.nq2], hi[:, : p.nq2], n_q).reshape(nh, hd)
            sc_qh[0:nh, :] = _rope_rows(q, cos, sin) * (hd ** -0.5)
            ks = p.nq2
            k = _halves(lo[:, ks: ks + p.nk2],
                        hi[:, ks: ks + p.nk2], n_k).reshape(nkv, hd)
            k = _rope_rows(k, cos, sin)
            sc_kvh[0:nkv, :] = k
            k_new_ref[pl.ds(l, 1), 0:nkv, :] = k[None]
            vs = p.nq2 + p.nk2
            v = _halves(lo[:, vs: vs + p.nv2],
                        hi[:, vs: vs + p.nv2], n_k).reshape(nkv, hd)
            sc_kvh[p.nkv8: p.nkv8 + nkv, :] = v
            v_new_ref[pl.ds(l, 1), 0:nkv, :] = v[None]

            off = off_ref[0]
            C = p.capacity
            for a in range(nkv):
                qg = sc_qh[a * gq:(a + 1) * gq, :]       # [gq, hd]
                kf = sl_k[slot, a].astype(jnp.bfloat16)  # [C, hd]
                vf = sl_v[slot, a].astype(jnp.bfloat16)
                dims = (((1,), (1,)), ((), ()))
                s_hist = jax.lax.dot_general(
                    qg.astype(jnp.bfloat16), kf, dims,
                    preferred_element_type=jnp.float32)
                ids = jax.lax.broadcasted_iota(jnp.int32, (gq, C), 1)
                s_hist = jnp.where(ids < off, s_hist, -jnp.inf)
                kc = sc_kvh[a, :][None, :]               # [1, hd]
                vc = sc_kvh[p.nkv8 + a, :][None, :]
                s_cur = jnp.sum(qg * kc, axis=-1, keepdims=True)  # [gq, 1]
                m = jnp.maximum(
                    jnp.max(s_hist, axis=-1, keepdims=True), s_cur)
                ph_ = jnp.exp(s_hist - m)
                pc = jnp.exp(s_cur - m)
                denom = jnp.sum(ph_, axis=-1, keepdims=True) + pc
                out = jax.lax.dot_general(
                    ph_.astype(jnp.bfloat16), vf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out = (out + pc * vc) / denom            # [gq, hd]
                sc_oh[a * gq:(a + 1) * gq, :] = out

        def layer_body(l, carry):
            ln = norms_ref[pl.ds(l, 1)][0]  # [2, D]

            @pl.when(l == 0)
            def _():
                sc_h[:] = h_in_ref[:].astype(jnp.float32)

            xf = sc_h[:]
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            sc_xn[:] = xf * jax.lax.rsqrt(var + p.eps) * ln[0:1, :]

            i = 0
            # ---- qkv tiles
            for j in range(p.NQ):
                issue_next(l, i)
                qp, sc = wait_tile("qkv", l, j)
                ylo, yhi = _mv(sc_xn[:], qp, sc, g)
                sc_qlo[:, j * p.TNQ:(j + 1) * p.TNQ] = ylo
                sc_qhi[:, j * p.TNQ:(j + 1) * p.TNQ] = yhi
                i += 1

            # ---- attention (kv hist DMA'd a layer ahead)
            attention(l)

            # ---- o tiles
            for j in range(p.NO):
                if j == 0:
                    @pl.when(l + 1 < p.n_layers)
                    def _():
                        issue_kv(l + 1)

                issue_next(l, i)
                qp, sc = wait_tile("o", l, j)
                if j == 0:
                    sc_attn[:] = jnp.zeros_like(sc_attn)
                    sc_attn[0:1, :n_q] = sc_oh[0:nh, :].reshape(1, n_q)
                ylo, yhi = _mv(sc_attn[:], qp, sc, g)
                sc_dlo[:, j * p.TNO:(j + 1) * p.TNO] = ylo
                sc_dhi[:, j * p.TNO:(j + 1) * p.TNO] = yhi
                i += 1

            # close attention residual; norm2
            sc_h[:] += _halves(sc_dlo[:, : p.no2], sc_dhi[:, : p.no2], D)
            xf2 = sc_h[:]
            var2 = jnp.mean(xf2 * xf2, axis=-1, keepdims=True)
            sc_xn[:] = xf2 * jax.lax.rsqrt(var2 + p.eps) * ln[1:2, :]

            # ---- gate|up tiles
            for j in range(p.NGU):
                issue_next(l, i)
                qp, sc = wait_tile("gu", l, j)
                ylo, yhi = _mv(sc_xn[:], qp, sc, g)
                sc_glo[:, j * p.TNG:(j + 1) * p.TNG] = ylo
                sc_ghi[:, j * p.TNG:(j + 1) * p.TNG] = yhi
                i += 1

            gate = _halves(sc_glo[:, : p.ng2], sc_ghi[:, : p.ng2], I)
            up = _halves(sc_glo[:, p.ng2:], sc_ghi[:, p.ng2:], I)
            sc_act[:] = gate * jax.nn.sigmoid(gate) * up
            sc_dlo[:] = jnp.zeros_like(sc_dlo)
            sc_dhi[:] = jnp.zeros_like(sc_dhi)

            # ---- down K-tiles
            for j in range(p.ND):
                issue_next(l, i)
                qp, sc = wait_tile("dn", l, j)
                x = sc_act[:, j * p.TKD:(j + 1) * p.TKD]
                ylo, yhi = _mv(x, qp, sc, g)
                sc_dlo[:, : p.nd2] += ylo
                sc_dhi[:, : p.nd2] += yhi
                i += 1

            sc_h[:] += _halves(sc_dlo[:, : p.nd2], sc_dhi[:, : p.nd2], D)
            return carry

        # prologue: first weight tile + layer-0 kv history
        issue("qkv", 0, 0)
        issue_kv(0)
        jax.lax.fori_loop(0, p.n_layers, layer_body, 0)
        h_out_ref[:] = sc_h[:]

    return kernel


@dataclasses.dataclass(frozen=True)
class _Plan:
    dim: int
    inter: int
    n_layers: int
    n_heads: int
    n_kv: int
    head_dim: int
    group_size: int
    eps: float
    nq2: int
    nk2: int
    nv2: int
    no2: int
    ng2: int
    nd2: int
    capacity: int
    NQ: int
    TNQ: int
    NO: int
    TNO: int
    NGU: int
    TNG: int
    ND: int
    TKD: int
    nh8: int
    nkv8: int


def _make_plan(pack: FusedDecodePack, capacity: int) -> _Plan:
    # tile sizes live in the tile-major pack shapes
    return _Plan(
        dim=pack.dim, inter=pack.inter, n_layers=pack.n_layers,
        n_heads=pack.n_heads, n_kv=pack.n_kv, head_dim=pack.head_dim,
        group_size=pack.group_size, eps=pack.eps,
        nq2=pack.nq2, nk2=pack.nk2, nv2=pack.nv2, no2=pack.no2,
        ng2=pack.ng2, nd2=pack.nd2, capacity=capacity,
        NQ=pack.qkv_qp.shape[1], TNQ=pack.qkv_qp.shape[3],
        NO=pack.o_qp.shape[1], TNO=pack.o_qp.shape[3],
        NGU=pack.gu_qp.shape[1], TNG=pack.gu_qp.shape[3],
        ND=pack.dn_qp.shape[1], TKD=pack.dn_qp.shape[2],
        nh8=max(pack.n_heads, 8), nkv8=max(pack.n_kv, 8),
    )


def fused_decode_step(pack: FusedDecodePack, h: jax.Array,
                      cos: jax.Array, sin: jax.Array,
                      k_cache: jax.Array, v_cache: jax.Array,
                      offset: jax.Array,
                      interpret: Optional[bool] = None):
    """One decode step over the whole stack.

    h: [1, 1, D] embeds; cos/sin: [..., hd/2] rope halves for this
    position; k/v_cache: [L, 1, Hkv, C, hd]; offset: int32 scalar
    (valid history length).  Returns (h_out [1,1,D] f32,
    k_new [L, Hkv*hd] f32, v_new [L, Hkv*hd] f32) — h_out is
    pre-final-norm; caller appends k/v at `offset` and runs norm+head.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L, _, Hkv, C, hd = k_cache.shape
    plan = _make_plan(pack, C)
    p = plan
    D = p.dim
    G = p.dim // p.group_size  # groups along K for D-contraction weights

    cs = jnp.concatenate([cos.reshape(1, -1), sin.reshape(1, -1)], axis=0)
    cs = jnp.concatenate([cs, cs], axis=-1).astype(jnp.float32)  # [2, hd]
    h8 = jnp.zeros((M_ROWS, D), jnp.float32).at[0].set(
        h.reshape(-1, D)[0].astype(jnp.float32))

    kernel = make_kernel(plan)
    nkv8 = p.nkv8
    out_shapes = [
        jax.ShapeDtypeStruct((M_ROWS, D), jnp.float32),
        jax.ShapeDtypeStruct((L, nkv8, hd), jnp.float32),
        jax.ShapeDtypeStruct((L, nkv8, hd), jnp.float32),
    ]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    out_specs = [vmem, vmem, vmem]
    sdt = pack.qkv_sc.dtype
    kvdt = k_cache.dtype
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # offset
        vmem,                                   # h_in
        vmem,                                   # cos/sin
        vmem,                                   # qkv bias [L, 2, Cq]
        vmem,                                   # norms [L, 2, D]
        any_, any_, any_, any_,                 # qkv/o qp+sc (HBM)
        any_, any_, any_, any_,                 # gu/dn qp+sc (HBM)
        any_, any_,                             # k/v hist (HBM)
    ]
    gtd = p.TKD // p.group_size
    scratch = [
        pltpu.VMEM((M_ROWS, D), jnp.float32),          # sc_h
        pltpu.VMEM((M_ROWS, D), jnp.float32),          # sc_xn
        pltpu.VMEM((M_ROWS, p.NQ * p.TNQ), jnp.float32),   # sc_qlo
        pltpu.VMEM((M_ROWS, p.NQ * p.TNQ), jnp.float32),   # sc_qhi
        pltpu.VMEM((M_ROWS, D), jnp.float32),          # sc_attn
        pltpu.VMEM((p.nh8, hd), jnp.float32),          # sc_qh
        pltpu.VMEM((2 * p.nkv8, hd), jnp.float32),     # sc_kvh
        pltpu.VMEM((p.nh8, hd), jnp.float32),          # sc_oh
        pltpu.VMEM((M_ROWS, p.ng2 * 2), jnp.float32),  # sc_glo
        pltpu.VMEM((M_ROWS, p.ng2 * 2), jnp.float32),  # sc_ghi
        pltpu.VMEM((M_ROWS, p.inter), jnp.float32),    # sc_act
        pltpu.VMEM((M_ROWS, max(p.no2, p.nd2)), jnp.float32),  # sc_dlo
        pltpu.VMEM((M_ROWS, max(p.no2, p.nd2)), jnp.float32),  # sc_dhi
        # double-buffered DMA slots (qp + scales per stream, kv hist)
        pltpu.VMEM((2, D, p.TNQ), jnp.uint8),          # sl_qkv_qp
        pltpu.VMEM((2, G, 4, p.TNQ), sdt),             # sl_qkv_sc
        pltpu.VMEM((2, D, p.TNO), jnp.uint8),          # sl_o_qp
        pltpu.VMEM((2, G, 4, p.TNO), sdt),             # sl_o_sc
        pltpu.VMEM((2, D, p.TNG), jnp.uint8),          # sl_gu_qp
        pltpu.VMEM((2, G, 4, p.TNG), sdt),             # sl_gu_sc
        pltpu.VMEM((2, p.TKD, pack.dn_qp.shape[-1]), jnp.uint8),  # sl_dn_qp
        pltpu.VMEM((2, gtd, 4, pack.dn_qp.shape[-1]), sdt),       # sl_dn_sc
        pltpu.VMEM((2, Hkv, C, hd), kvdt),             # sl_k
        pltpu.VMEM((2, Hkv, C, hd), kvdt),             # sl_v
        pltpu.SemaphoreType.DMA((2,)),                 # sem_qkv_qp
        pltpu.SemaphoreType.DMA((2,)),                 # sem_qkv_sc
        pltpu.SemaphoreType.DMA((2,)),                 # sem_o_qp
        pltpu.SemaphoreType.DMA((2,)),                 # sem_o_sc
        pltpu.SemaphoreType.DMA((2,)),                 # sem_gu_qp
        pltpu.SemaphoreType.DMA((2,)),                 # sem_gu_sc
        pltpu.SemaphoreType.DMA((2,)),                 # sem_dn_qp
        pltpu.SemaphoreType.DMA((2,)),                 # sem_dn_sc
        pltpu.SemaphoreType.DMA((2,)),                 # sem_k
        pltpu.SemaphoreType.DMA((2,)),                 # sem_v
    ]

    h_out, k_new, v_new = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.atleast_1d(offset).astype(jnp.int32),
        h8, cs, pack.qkv_bias, pack.norms,
        pack.qkv_qp, pack.qkv_sc, pack.o_qp, pack.o_sc,
        pack.gu_qp, pack.gu_sc, pack.dn_qp, pack.dn_sc,
        k_cache, v_cache,
    )
    return h_out[0:1, None, :], k_new, v_new
