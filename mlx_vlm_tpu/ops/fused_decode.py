"""Whole-stack fused int4 decode step — ONE Pallas call for all L layers.

Role parity: the reference's decode hot path is `mx.quantized_matmul`
(fused Metal qmv) called per-linear inside per-layer modules
(reference mlx_vlm/generate/ar.py:325 `_step`).  On TPU the analogous
per-linear kernel is ops/int4_matvec.py, but at M=1 the decode step is
purely HBM-bandwidth-bound and every kernel boundary drains the DMA
pipeline: 7 linears x 28 layers = ~200 boundaries cost ~35% of the
roofline (measured 120 tok/s vs the 4.9 ms/step weight-streaming bound
on Qwen2-VL-7B, v5e).  The TPU-native answer is a single `pallas_call`
whose grid walks (layer, phase) and streams EVERY weight byte of the
step back-to-back while attention, norms, rope and activations ride in
VMEM scratch between grid steps:

    grid = (L, SPL) with per-layer phases
      [qkv tiles | per-kv-head attention | o tiles | gate_up tiles |
       down K-tiles]

- Weight operands use BlockSpec index maps that HOLD their block index
  outside their phase, so Mosaic's pipeline only re-DMAs a block when
  the (layer, tile) actually advances — weight bytes stream exactly
  once per step, double-buffered against compute.
- The KV cache history for layer l is auto-DMA'd as one block per layer;
  scores against it are masked by the `offset` scalar (prefetched) and
  the current token's k/v (computed two phases earlier in the same
  kernel) contribute one extra attention column.
- Activations (hidden, normed x, qkv halves, attention out, gate/up
  halves) live in f32 VMEM scratch that persists across grid steps; the
  only HBM activation traffic in a whole decode step is h_in, h_out,
  and the L per-layer k/v vectors.
- Scales/biases are stored f16 (the mlx checkpoint's own precision —
  core/quant.py stores f32 after import, which costs 2x the scale
  bytes; here they are packed [G, 4, N2p] = (sl, sh, bl, bh)).

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

    qkv_qp: u8 [L, K, Cq]   Cq = nq2 + nk2 + nv2 (per-tensor half-widths)
    qkv_sc: f16 [L, G, 4, Cq]  rows: sl, sh, bl, bh
    qkv_bias: f32 [L, 2, Cq]   lo/hi-plane bias (zeros when absent)
    o_qp:  u8 [L, K, Co];  o_sc [L, G, 4, Co]
    gu_qp: u8 [L, K, Cg2]  Cg2 = 2*ng2 (gate|up);  gu_sc likewise
    dn_qp: u8 [L, I, Cd];  dn_sc [L, I/g, 4, Cd]
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


def _mv(x, qp_ref, sc_ref, g):
    """x [8, TK] f32 @ dequant(block) -> (ylo, yhi) [8, TN] f32.

    qp_ref block [1, TK, TN] u8; sc_ref block [1, gt, 4, TN]."""
    _, TK, TN = qp_ref.shape
    M = x.shape[0]
    gt = TK // g
    if "mv" in _ABLATE:  # touch one lane of the block, no math
        z = qp_ref[0, 0:8, 0:128].astype(jnp.int32).astype(jnp.float32)
        zz = jnp.sum(z) * 0.0
        return (jnp.zeros((M, TN), jnp.float32) + zz,
                jnp.zeros((M, TN), jnp.float32))
    qi = qp_ref[0].astype(jnp.int32)
    lo = (qi & 0xF).astype(jnp.float32).reshape(gt, g, TN)
    hi = (qi >> 4).astype(jnp.float32).reshape(gt, g, TN)
    if "scdec" in _ABLATE or sc_ref.dtype != jnp.uint16:
        sc = sc_ref[0].astype(jnp.float32)  # [gt, 4, TN]
    else:
        sc = _f16_to_f32(sc_ref[0])  # [gt, 4, TN]
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
    """Kernel body closure over the static plan."""
    p = plan

    def kernel(off_ref, h_in_ref, cossin_ref,
               qkv_qp_ref, qkv_sc_ref, qkv_b_ref, norms_ref,
               o_qp_ref, o_sc_ref, gu_qp_ref, gu_sc_ref,
               dn_qp_ref, dn_sc_ref, k_hist_ref, v_hist_ref,
               h_out_ref, k_new_ref, v_new_ref,
               sc_h, sc_xn, sc_qlo, sc_qhi, sc_attn, sc_qh, sc_kvh, sc_oh,
               sc_glo, sc_ghi, sc_act, sc_dlo, sc_dhi):
        l = pl.program_id(0)
        ph = pl.program_id(1)
        D, I, g = p.dim, p.inter, p.group_size
        nh, nkv, hd = p.n_heads, p.n_kv, p.head_dim
        gq = nh // nkv
        n_q, n_k = nh * hd, nkv * hd

        # ---------------- phase QKV: tiles [0, NQ)
        @pl.when(ph < p.NQ)
        def _qkv():
            @pl.when(ph == 0)
            def _():
                @pl.when(l == 0)
                def _():
                    sc_h[:] = h_in_ref[:].astype(jnp.float32)
                xf = sc_h[:]
                var = jnp.mean(xf * xf, axis=-1, keepdims=True)
                w = norms_ref[0, 0, :][None, :]
                sc_xn[:] = xf * jax.lax.rsqrt(var + p.eps) * w

            ylo, yhi = _mv(sc_xn[:], qkv_qp_ref, qkv_sc_ref, g)
            j = ph
            sc_qlo[:, pl.ds(j * p.TNQ, p.TNQ)] = ylo
            sc_qhi[:, pl.ds(j * p.TNQ, p.TNQ)] = yhi

        # ---------------- phase ATTN: steps [NQ, NQ + n_kv)
        a0 = p.NQ

        @pl.when((ph >= a0) & (ph < a0 + nkv))
        def _attn():
            a = ph - a0
            if "attn" in _ABLATE:
                sc_oh[0:8, :] = (
                    k_hist_ref[0, 0, 0, 0:8, :].astype(jnp.float32) * 0.0
                    + v_hist_ref[0, 0, 0, 0:8, :].astype(jnp.float32) * 0.0)
                k_new_ref[0, 0:nkv, :] = sc_oh[0:nkv, :]
                v_new_ref[0, 0:nkv, :] = sc_oh[0:nkv, :]
                return

            @pl.when(a == 0)
            def _():
                # one head-major relayout per layer; the per-kv-head steps
                # then touch only sublane slices (no lane<->sublane moves)
                lo = sc_qlo[0:1, :] + qkv_b_ref[0, 0, :][None, :]
                hi = sc_qhi[0:1, :] + qkv_b_ref[0, 1, :][None, :]
                cos = cossin_ref[0:1, :]
                sin = cossin_ref[1:2, :]
                q = _halves(lo[:, : p.nq2], hi[:, : p.nq2], n_q)
                q = q.reshape(nh, hd)
                sc_qh[0:nh, :] = _rope_rows(q, cos, sin) * (hd ** -0.5)
                ks = p.nq2
                k = _halves(lo[:, ks: ks + p.nk2],
                            hi[:, ks: ks + p.nk2], n_k).reshape(nkv, hd)
                k = _rope_rows(k, cos, sin)
                sc_kvh[0:nkv, :] = k
                k_new_ref[0, 0:nkv, :] = k
                vs = p.nq2 + p.nk2
                v = _halves(lo[:, vs: vs + p.nv2],
                            hi[:, vs: vs + p.nv2], n_k).reshape(nkv, hd)
                sc_kvh[p.nkv8: p.nkv8 + nkv, :] = v
                v_new_ref[0, 0:nkv, :] = v

            off = off_ref[0]
            C = p.capacity
            qg = sc_qh[pl.ds(a * gq, gq), :]            # [gq, hd]
            kf = k_hist_ref[0, 0, a].astype(jnp.bfloat16)  # [C, hd]
            vf = v_hist_ref[0, 0, a].astype(jnp.bfloat16)
            dims = (((1,), (1,)), ((), ()))
            s_hist = jax.lax.dot_general(
                qg.astype(jnp.bfloat16), kf, dims,
                preferred_element_type=jnp.float32)
            ids = jax.lax.broadcasted_iota(jnp.int32, (gq, C), 1)
            s_hist = jnp.where(ids < off, s_hist, -jnp.inf)
            kc = sc_kvh[a, :][None, :]                  # [1, hd]
            vc = sc_kvh[p.nkv8 + a, :][None, :]
            s_cur = jnp.sum(qg * kc, axis=-1, keepdims=True)  # [gq, 1]
            m = jnp.maximum(jnp.max(s_hist, axis=-1, keepdims=True), s_cur)
            ph_ = jnp.exp(s_hist - m)
            pc = jnp.exp(s_cur - m)
            denom = jnp.sum(ph_, axis=-1, keepdims=True) + pc
            out = jax.lax.dot_general(
                ph_.astype(jnp.bfloat16), vf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out = (out + pc * vc) / denom  # [gq, hd]
            sc_oh[pl.ds(a * gq, gq), :] = out

        # ---------------- phase O: tiles
        o0 = a0 + nkv

        @pl.when((ph >= o0) & (ph < o0 + p.NO))
        def _o():
            @pl.when(ph == o0)
            def _():
                sc_attn[:] = jnp.zeros_like(sc_attn)
                sc_attn[0:1, :n_q] = sc_oh[0:nh, :].reshape(1, n_q)

            ylo, yhi = _mv(sc_attn[:], o_qp_ref, o_sc_ref, g)
            j = ph - o0
            sc_dlo[:, pl.ds(j * p.TNO, p.TNO)] = ylo
            sc_dhi[:, pl.ds(j * p.TNO, p.TNO)] = yhi

        # ---------------- phase GU: tiles
        g0 = o0 + p.NO

        @pl.when((ph >= g0) & (ph < g0 + p.NGU))
        def _gu():
            @pl.when(ph == g0)
            def _():
                # close attention residual; norm2
                sc_h[:] += _halves(sc_dlo[:, : p.no2],
                                   sc_dhi[:, : p.no2], D)
                xf = sc_h[:]
                var = jnp.mean(xf * xf, axis=-1, keepdims=True)
                w = norms_ref[0, 1, :][None, :]
                sc_xn[:] = xf * jax.lax.rsqrt(var + p.eps) * w

            ylo, yhi = _mv(sc_xn[:], gu_qp_ref, gu_sc_ref, g)
            j = ph - g0
            sc_glo[:, pl.ds(j * p.TNG, p.TNG)] = ylo
            sc_ghi[:, pl.ds(j * p.TNG, p.TNG)] = yhi

        # ---------------- phase DOWN: K-tiles
        d0 = g0 + p.NGU

        @pl.when(ph >= d0)
        def _dn():
            @pl.when(ph == d0)
            def _():
                gate = _halves(sc_glo[:, : p.ng2], sc_ghi[:, : p.ng2], I)
                up = _halves(sc_glo[:, p.ng2:], sc_ghi[:, p.ng2:], I)
                sc_act[:] = gate * jax.nn.sigmoid(gate) * up
                sc_dlo[:] = jnp.zeros_like(sc_dlo)
                sc_dhi[:] = jnp.zeros_like(sc_dhi)

            kt = ph - d0
            x = sc_act[:, pl.ds(kt * p.TKD, p.TKD)]
            ylo, yhi = _mv(x, dn_qp_ref, dn_sc_ref, g)
            sc_dlo[:, : p.nd2] += ylo
            sc_dhi[:, : p.nd2] += yhi

            @pl.when(kt == p.ND - 1)
            def _():
                sc_h[:] += _halves(sc_dlo[:, : p.nd2],
                                   sc_dhi[:, : p.nd2], D)

                @pl.when(l == p.n_layers - 1)
                def _():
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
    import os

    Cq = pack.qkv_qp.shape[-1]
    Co = pack.o_qp.shape[-1]
    Cg = pack.gu_qp.shape[-1]
    tiles = os.environ.get("FUSED_DECODE_TILES", "")
    if tiles:
        TNQ, TNO, TNG, TKD = (int(t) for t in tiles.split(","))
    else:
        TNQ = _pick_tn(Cq)
        TNO = _pick_tn(Co)
        TNG = _pick_tn(Cg)
        TKD = _pick_tk(pack.inter, pack.group_size, pack.dn_qp.shape[-1])
    return _Plan(
        dim=pack.dim, inter=pack.inter, n_layers=pack.n_layers,
        n_heads=pack.n_heads, n_kv=pack.n_kv, head_dim=pack.head_dim,
        group_size=pack.group_size, eps=pack.eps,
        nq2=pack.nq2, nk2=pack.nk2, nv2=pack.nv2, no2=pack.no2,
        ng2=pack.ng2, nd2=pack.nd2, capacity=capacity,
        NQ=Cq // TNQ, TNQ=TNQ, NO=Co // TNO, TNO=TNO,
        NGU=Cg // TNG, TNG=TNG, ND=pack.inter // TKD, TKD=TKD,
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
    Gd = p.inter // p.group_size
    SPL = p.NQ + p.n_kv + p.NO + p.NGU + p.ND

    cs = jnp.concatenate([cos.reshape(1, -1), sin.reshape(1, -1)], axis=0)
    cs = jnp.concatenate([cs, cs], axis=-1).astype(jnp.float32)  # [2, hd]
    h8 = jnp.zeros((M_ROWS, D), jnp.float32).at[0].set(
        h.reshape(-1, D)[0].astype(jnp.float32))

    def qkv_j(l, ph, s):
        return (l, 0, jnp.minimum(ph, p.NQ - 1))

    def sc_qkv(l, ph, s):
        return (l, 0, 0, jnp.minimum(ph, p.NQ - 1))

    o0 = p.NQ + p.n_kv
    g0 = o0 + p.NO
    d0 = g0 + p.NGU

    def o_j(l, ph, s):
        return (l, 0, jnp.clip(ph - o0, 0, p.NO - 1))

    def sc_o(l, ph, s):
        return (l, 0, 0, jnp.clip(ph - o0, 0, p.NO - 1))

    def gu_j(l, ph, s):
        return (l, 0, jnp.clip(ph - g0, 0, p.NGU - 1))

    def sc_gu(l, ph, s):
        return (l, 0, 0, jnp.clip(ph - g0, 0, p.NGU - 1))

    def dn_j(l, ph, s):
        return (l, jnp.clip(ph - d0, 0, p.ND - 1), 0)

    def sc_dn(l, ph, s):
        return (l, jnp.clip(ph - d0, 0, p.ND - 1), 0, 0)

    const = lambda l, ph, s: (0, 0)
    per_layer3 = lambda l, ph, s: (l, 0, 0)
    per_layer5 = lambda l, ph, s: (l, 0, 0, 0, 0)

    kernel = make_kernel(plan)
    n_k = p.n_kv * p.head_dim
    nkv8 = p.nkv8
    out_shapes = [
        jax.ShapeDtypeStruct((M_ROWS, D), jnp.float32),
        jax.ShapeDtypeStruct((L, nkv8, hd), jnp.float32),
        jax.ShapeDtypeStruct((L, nkv8, hd), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((M_ROWS, D), const),
        pl.BlockSpec((1, nkv8, hd), lambda l, ph, s: (l, 0, 0)),
        pl.BlockSpec((1, nkv8, hd), lambda l, ph, s: (l, 0, 0)),
    ]
    sdt = pack.qkv_sc.dtype
    in_specs = [
        pl.BlockSpec((M_ROWS, D), const),                       # h_in
        pl.BlockSpec((2, hd), const),                           # cos/sin
        pl.BlockSpec((1, D, p.TNQ), qkv_j),                     # qkv qp
        pl.BlockSpec((1, G, 4, p.TNQ), sc_qkv),                 # qkv sc
        pl.BlockSpec((1, 2, pack.qkv_bias.shape[-1]), per_layer3),
        pl.BlockSpec((1, 2, D), per_layer3),                    # norms
        pl.BlockSpec((1, D, p.TNO), o_j),
        pl.BlockSpec((1, G, 4, p.TNO), sc_o),
        pl.BlockSpec((1, D, p.TNG), gu_j),
        pl.BlockSpec((1, G, 4, p.TNG), sc_gu),
        pl.BlockSpec((1, p.TKD, pack.dn_qp.shape[-1]), dn_j),
        pl.BlockSpec((1, p.TKD // p.group_size, 4,
                      pack.dn_qp.shape[-1]), sc_dn),
        pl.BlockSpec((1, 1, Hkv, C, hd), per_layer5),           # k hist
        pl.BlockSpec((1, 1, Hkv, C, hd), per_layer5),           # v hist
    ]
    scratch = [
        pltpu.VMEM((M_ROWS, D), jnp.float32),          # sc_h
        pltpu.VMEM((M_ROWS, D), jnp.float32),          # sc_xn
        pltpu.VMEM((M_ROWS, pack.qkv_qp.shape[-1]), jnp.float32),   # sc_qlo
        pltpu.VMEM((M_ROWS, pack.qkv_qp.shape[-1]), jnp.float32),   # sc_qhi
        pltpu.VMEM((M_ROWS, D), jnp.float32),          # sc_attn
        pltpu.VMEM((p.nh8, hd), jnp.float32),          # sc_qh
        pltpu.VMEM((2 * p.nkv8, hd), jnp.float32),     # sc_kvh
        pltpu.VMEM((p.nh8, hd), jnp.float32),          # sc_oh
        pltpu.VMEM((M_ROWS, p.ng2 * 2), jnp.float32),  # sc_glo
        pltpu.VMEM((M_ROWS, p.ng2 * 2), jnp.float32),  # sc_ghi
        pltpu.VMEM((M_ROWS, p.inter), jnp.float32),    # sc_act
        pltpu.VMEM((M_ROWS, max(p.no2, p.nd2)), jnp.float32),  # sc_dlo
        pltpu.VMEM((M_ROWS, max(p.no2, p.nd2)), jnp.float32),  # sc_dhi
    ]

    h_out, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, SPL),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.atleast_1d(offset).astype(jnp.int32),
        h8, cs,
        pack.qkv_qp, pack.qkv_sc, pack.qkv_bias, pack.norms,
        pack.o_qp, pack.o_sc, pack.gu_qp, pack.gu_sc,
        pack.dn_qp, pack.dn_sc, k_cache, v_cache,
    )
    return h_out[0:1, None, :], k_new, v_new
