"""Whole-stack fused int4 decode step — ONE Pallas call for all L layers.

Role parity: the reference's decode hot path is `mx.quantized_matmul`
(fused Metal qmv) called per-linear inside per-layer modules
(reference mlx_vlm/generate/ar.py:325 `_step`).  On TPU the analogous
per-linear kernel is ops/int4_matvec.py, but at M=1 decode is purely
HBM-bandwidth-bound and every kernel boundary drains the DMA pipeline:
7 linears x 28 layers = ~200 boundaries cost ~35% of the roofline.

v2 design (2026-08, measured on the axon chip via tools/probe_stream):
a single `pallas_call` whose GRID walks every weight tile of every
layer; Mosaic's BlockSpec pipeline streams tiles from HBM, fetching
tile t+1 while tile t computes.  Four independently-blocked weight
streams (qkv / o / gate|up / down) advance on their own schedules via
index maps — each ref's next tile is prefetched while other kinds
compute, so exactly one ~1-2 MB DMA is in flight per grid step.
Layer-boundary work (attention, residuals, norms, swiglu) runs inside
`pl.when` branches keyed on the within-layer step.

Measured motivation:
- the round-2 manual-DMA megakernel (hand double-buffered copies +
  semaphores inside one gridless kernel) ran 8.5 ms/step at 7B: the
  item-serialized structure stalls both VPU and MXU behind DMA waits.
- an auto-pipelined tile stream with identical math runs at the DMA
  floor when scales ship as f32 (no in-kernel f16 decode): 1152 GB/s
  vs the 755-1495 GB/s pure-DMA envelope (tools/probe_stream.py).
- per-group (batched) dots, int8 MXU dots, native int4 dtypes, and a
  scratch-mediated dequant/dot software pipeline all measured SLOWER
  (tools/probe_i8dot2.py, probe_ops.py); plain bf16 dequant + two big
  [8,K]x[K,TN] dots is the fastest exact formulation at M=1.

- Scales/biases ship as f32 (exactly decoded from the checkpoint's f16
  at pack time — f32 is a superset, so weights stay bit-exact); the
  ~12% extra DMA beats every in-kernel decode variant measured.
- Activations ride f32 VMEM scratch across the whole step; the only
  HBM activation traffic per step is h_in, h_out and L k/v vectors.
- The KV history for layer l streams on its own blocked ref, its index
  map flipping to l+1 right after layer l's attention step (prefetch).

Weight layout matches core/quant.py Int4GroupedTensor halves-packing;
q|k|v and gate|up concatenate along packed columns at pack-build time.
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
        "hd_qp", "hd_sc", "hd_norm",
    ],
    meta_fields=[
        "dim", "inter", "n_layers", "n_heads", "n_kv", "head_dim",
        "group_size", "eps", "nq2", "nk2", "nv2", "no2", "ng2", "nd2",
        "out_dtype", "nhd2", "nhd2_pad", "head_n",
    ],
)
@dataclasses.dataclass
class FusedDecodePack:
    """Per-model fused weight pack (built once after load).

    TILE-MAJOR layout: every pipelined block is contiguous in HBM.

    qkv_qp: u8 [L, NQ, K, TNQ]  NQ*TNQ = nq2+nk2+nv2 (half-widths)
    qkv_sc: f32 [L, NQ, G, 4, TNQ]  rows: sl, sh, bl, bh
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
    # optional fused lm_head stream (same tile width as qkv so the head
    # phase reuses the qkv VMEM buffers): hd_qp u8 [NH, K, TNQ],
    # hd_sc f32 [NH, G, 4, TNQ], hd_norm f32 [1, D] (final rms norm)
    hd_qp: Optional[jax.Array] = None
    hd_sc: Optional[jax.Array] = None
    hd_norm: Optional[jax.Array] = None
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
    out_dtype: str = "bfloat16"
    nhd2: int = 0  # real lm_head half-width (vocab/2, lane-padded)
    nhd2_pad: int = 0  # tile-padded half-width
    head_n: int = 0  # true vocab size (lane padding sliced off)


def _cat_tensors(ts, xp):
    """Concatenate stacked Int4GroupedTensors along packed columns.

    Returns (qp [L,K,C], sc_f32 [L,G,4,C], half_widths)."""
    qp = xp.concatenate([t.qp for t in ts], axis=-1)
    rows = []
    for name in ("sl", "sh", "bl", "bh"):
        rows.append(xp.concatenate(
            [getattr(t, name) for t in ts], axis=-1))  # [L, G, 1, C]
    sc = xp.concatenate(rows, axis=2)  # [L, G, 4, C] f32
    return qp, sc, [t.qp.shape[-1] for t in ts]


def _plane_bias(bias, n, n2p, xp):
    """[L, n] bias -> ([L, n2p] lo, [L, n2p] hi) plane layout."""
    import numpy as _np

    L = bias.shape[0]
    if xp is _np:
        b = _np.zeros((L, 2 * n2p), _np.float32)
        b[:, :n] = _np.asarray(bias, _np.float32)
    else:
        b = jnp.zeros((L, 2 * n2p), jnp.float32)
        b = b.at[:, :n].set(bias.astype(jnp.float32))
    return b[:, :n2p], b[:, n2p:]


def build_fused_pack(mp: dict, args, scale_dtype=jnp.float32,
                     lm_head=None, final_norm=None
                     ) -> Optional[FusedDecodePack]:
    """Build the pack from stacked layer params `mp = params["model"]`.

    Runs HOST-side (numpy) when the weights are still numpy — the relayout
    transients of a 7B model (~4 GB of concats + tile transposes) would
    otherwise spike device HBM on top of the resident per-linear weights.
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
    import numpy as _np

    xp = _np if isinstance(ws[0].qp, _np.ndarray) else jnp
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
    # Mosaic's real-TPU lowering rejects the [1, nh*hd] -> [nh, hd]
    # relayout unless hd is lane-width (hd=32 fails "unsupported shape
    # cast"); interpret mode (CPU tests) has no such limit
    if (jax.default_backend() == "tpu"
            and D // args.num_attention_heads != 128):
        return None
    if wq.n != D or wo.n != D or wd.n != D or wg.n != I or wu.n != I:
        return None

    qkv_qp, qkv_sc, (nq2, nk2, nv2) = _cat_tensors([wq, wk, wv], xp)
    gu_qp, gu_sc, (ng2, _) = _cat_tensors([wg, wu], xp)
    o_qp, o_sc, (no2,) = _cat_tensors([wo], xp)
    dn_qp, dn_sc, (nd2,) = _cat_tensors([wd], xp)
    # scales ship as f32: exact superset of the checkpoint's f16, and the
    # in-kernel f16 decode was the dominant exposed compute (module doc)
    sdt = _np.float32 if xp is _np else scale_dtype
    qkv_sc, gu_sc, o_sc, dn_sc = (
        a.astype(sdt) for a in (qkv_sc, gu_sc, o_sc, dn_sc))

    # tile-major relayout: one contiguous HBM region per pipelined block
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
        qp = xp.ascontiguousarray(
            qp.reshape(Lx, Kx, n, tn).transpose(0, 2, 1, 3)) \
            if xp is _np else \
            qp.reshape(Lx, Kx, n, tn).transpose(0, 2, 1, 3)
        Gx = sc.shape[1]
        sc = sc.reshape(Lx, Gx, 4, n, tn).transpose(0, 3, 1, 2, 4)
        if xp is _np:
            sc = _np.ascontiguousarray(sc)
        return qp, sc

    qkv_qp, qkv_sc = tile_cols(qkv_qp, qkv_sc, TNQ)
    o_qp, o_sc = tile_cols(o_qp, o_sc, TNO)
    gu_qp, gu_sc = tile_cols(gu_qp, gu_sc, TNG)
    Ld, Id, Cd = dn_qp.shape
    nd = Id // TKD
    dn_qp = dn_qp.reshape(Ld, nd, TKD, Cd)
    dn_sc = dn_sc.reshape(Ld, nd, TKD // g, 4, Cd)

    # f16 scale planes (host builds only, OFF by default): shipping the
    # planes as u16 f16-bits halves their DMA (~0.3 GB/step) but the
    # in-kernel decode (_scales_f32) costs MORE than it saves on this
    # chip — measured 2026-08 on v5e: u16 8.67 ms/tok vs f32 7.92 (v3)
    # and 9.25 vs 7.99 (v2 grid).  MLX_VLM_TPU_PACK_SC16=1 re-enables
    # for experiments; values round-trip f16 exactly either way.
    if (xp is _np and os.environ.get("MLX_VLM_TPU_PACK_SC16", "0")
            not in ("0", "false")):
        planes = (qkv_sc, o_sc, gu_sc, dn_sc)
        if all(_np.array_equal(p.astype(_np.float16).astype(_np.float32), p)
               for p in planes):
            qkv_sc, o_sc, gu_sc, dn_sc = (
                p.astype(_np.float16).view(_np.uint16) for p in planes)
    elif os.environ.get("MLX_VLM_TPU_PACK_SCB16", "0") not in ("0", "false"):
        # bf16 scale planes: halves the plane DMA like the f16 path but
        # decodes with ONE native VPU convert (astype) instead of the
        # exponent-rebias bit math that made u16 a net loss.  Lossy to
        # ~2^-9 relative on the f16 checkpoint scales.
        if xp is _np:
            import ml_dtypes

            qkv_sc, o_sc, gu_sc, dn_sc = (
                p.astype(ml_dtypes.bfloat16)
                for p in (qkv_sc, o_sc, gu_sc, dn_sc))
        else:
            qkv_sc, o_sc, gu_sc, dn_sc = (
                p.astype(jnp.bfloat16)
                for p in (qkv_sc, o_sc, gu_sc, dn_sc))

    parts = []
    for w, t in ((wq, attn["q_proj"]), (wk, attn["k_proj"]),
                 (wv, attn["v_proj"])):
        b = t.get("bias")
        if b is None:
            b = xp.zeros((L, w.n),
                         _np.float32 if xp is _np else jnp.bfloat16)
        parts.append(_plane_bias(b, w.n, w.qp.shape[-1], xp))
    qkv_bias = xp.stack([
        xp.concatenate([p[0] for p in parts], axis=-1),
        xp.concatenate([p[1] for p in parts], axis=-1),
    ], axis=1)  # [L, 2, Cq]

    f32 = _np.float32 if xp is _np else jnp.float32
    norms = xp.stack([
        xp.asarray(layers["input_layernorm"]["weight"], dtype=f32)
        if xp is _np
        else layers["input_layernorm"]["weight"].astype(jnp.float32),
        xp.asarray(layers["post_attention_layernorm"]["weight"], dtype=f32)
        if xp is _np
        else layers["post_attention_layernorm"]["weight"].astype(
            jnp.float32),
    ], axis=1)  # [L, 2, D]

    # ---- optional fused lm_head stream (reuses the qkv tile width so
    # the head phase rides the qkv VMEM buffers; saves the separate
    # int4_matvec dispatch whose M=1 layout runs far off the DMA floor)
    hd_qp = hd_sc = hd_norm = None
    nhd2 = nhd2_pad = 0
    if (lm_head is not None and final_norm is not None
            and isinstance(lm_head, Int4GroupedTensor)
            and lm_head.qp.ndim == 2 and lm_head.qp.shape[0] == D
            and lm_head.group_size == g
            and os.environ.get("MLX_VLM_TPU_FUSED_HEAD", "1")
            not in ("0", "false")):
        hq = lm_head.qp
        hs = xp.concatenate(
            [lm_head.sl, lm_head.sh, lm_head.bl, lm_head.bh], axis=1)
        hs = hs.astype(sdt) if xp is _np else hs.astype(scale_dtype)
        if os.environ.get("MLX_VLM_TPU_PACK_SCB16", "0") not in (
                "0", "false"):
            if xp is _np:
                import ml_dtypes

                hs = hs.astype(ml_dtypes.bfloat16)
            else:
                hs = hs.astype(jnp.bfloat16)
        nhd2 = hq.shape[1]
        pad = (-nhd2) % TNQ
        if pad:
            if xp is _np:
                hq = _np.pad(hq, ((0, 0), (0, pad)))
                hs = _np.pad(hs, ((0, 0), (0, 0), (0, pad)))
            else:
                hq = jnp.pad(hq, ((0, 0), (0, pad)))
                hs = jnp.pad(hs, ((0, 0), (0, 0), (0, pad)))
        nhd2_pad = nhd2 + pad
        NH = nhd2_pad // TNQ
        Gh = hs.shape[0]
        hd_qp = hq.reshape(D, NH, TNQ).transpose(1, 0, 2)
        hd_sc = hs.reshape(Gh, 4, NH, TNQ).transpose(2, 0, 1, 3)
        if xp is _np:
            hd_qp = _np.ascontiguousarray(hd_qp)
            hd_sc = _np.ascontiguousarray(hd_sc)
        hd_norm = (xp.asarray(final_norm, dtype=f32).reshape(1, D)
                   if xp is _np
                   else final_norm.astype(jnp.float32).reshape(1, D))

    return FusedDecodePack(
        qkv_qp=qkv_qp, qkv_sc=qkv_sc, qkv_bias=qkv_bias,
        o_qp=o_qp, o_sc=o_sc, gu_qp=gu_qp, gu_sc=gu_sc,
        dn_qp=dn_qp, dn_sc=dn_sc, norms=norms,
        hd_qp=hd_qp, hd_sc=hd_sc, hd_norm=hd_norm,
        nhd2=nhd2, nhd2_pad=nhd2_pad,
        head_n=(lm_head.n if hd_qp is not None else 0),
        dim=D, inter=I, n_layers=L,
        n_heads=args.num_attention_heads,
        n_kv=args.num_key_value_heads,
        head_dim=D // args.num_attention_heads,
        group_size=g, eps=args.rms_norm_eps,
        nq2=nq2, nk2=nk2, nv2=nv2, no2=no2, ng2=ng2, nd2=nd2,
        out_dtype=wq.out_dtype,
    )


# --------------------------------------------------------------------------
# Pack-as-weights: the pack IS the model's only copy of the layer linears.
# Prefill (and any non-fused forward) reconstructs per-layer
# Int4GroupedTensors from pack slices inside the layer scan — pure
# relayout (transpose/reshape/column-slice), bit-exact, and only one
# layer's ~100 MB of transients live at a time.  This halves resident
# HBM at 7B (3.8 GiB pack + 3.8 GiB per-linear copy -> pack only), which
# is the difference between fitting and OOM on a 16 GiB chip.


def pack_scan_tree(pack: FusedDecodePack) -> dict:
    """The pack's arrays as a scan-xs pytree (all leaves lead with L)."""
    return {
        "qkv_qp": pack.qkv_qp, "qkv_sc": pack.qkv_sc,
        "qkv_bias": pack.qkv_bias, "o_qp": pack.o_qp, "o_sc": pack.o_sc,
        "gu_qp": pack.gu_qp, "gu_sc": pack.gu_sc,
        "dn_qp": pack.dn_qp, "dn_sc": pack.dn_sc, "norms": pack.norms,
    }


def _untile_cols(qp, sc):
    """Inverse of build_fused_pack's tile_cols for ONE layer.

    qp [NT, K, TN] -> [K, NT*TN]; sc [NT, G, 4, TN] -> [G, 4, NT*TN]."""
    NT, K, TN = qp.shape
    qp = qp.transpose(1, 0, 2).reshape(K, NT * TN)
    G = sc.shape[1]
    sc = sc.transpose(1, 2, 0, 3).reshape(G, 4, NT * TN)
    return qp, sc


def _col_segments(qp, sc, widths, ns, g, out_dtype):
    """Split concatenated packed columns back into per-linear tensors."""
    if sc.dtype == jnp.uint16:  # f16-bit planes -> exact f32
        sc = jax.lax.bitcast_convert_type(sc, jnp.float16).astype(
            jnp.float32)
    outs, c0 = [], 0
    for w, n in zip(widths, ns):
        planes = sc[:, :, c0:c0 + w]
        outs.append(Int4GroupedTensor(
            qp=qp[:, c0:c0 + w],
            sl=planes[:, 0][:, None, :], sh=planes[:, 1][:, None, :],
            bl=planes[:, 2][:, None, :], bh=planes[:, 3][:, None, :],
            n=n, group_size=g, out_dtype=out_dtype))
        c0 += w
    return outs


def layer_params_from_pack(pack: FusedDecodePack, pl: dict) -> dict:
    """One scanned layer's params dict rebuilt from its pack slices.

    `pl` holds per-layer slices of pack_scan_tree (leading L removed by
    the scan).  Output matches the per-linear layout the layer body
    expects: {input_layernorm, post_attention_layernorm, self_attn.{q,k,
    v,o}_proj, mlp.{gate,up,down}_proj} with Int4GroupedTensor weights."""
    g, od = pack.group_size, pack.out_dtype
    nkv = pack.n_kv * pack.head_dim

    qp, sc = _untile_cols(pl["qkv_qp"], pl["qkv_sc"])
    wq, wk, wv = _col_segments(
        qp, sc, (pack.nq2, pack.nk2, pack.nv2), (pack.dim, nkv, nkv), g, od)
    lo, hi = pl["qkv_bias"][0], pl["qkv_bias"][1]

    def seg_bias(c0, w, n):
        return jnp.concatenate([lo[c0:c0 + w], hi[c0:c0 + w]])[:n]

    bq = seg_bias(0, pack.nq2, pack.dim)
    bk = seg_bias(pack.nq2, pack.nk2, nkv)
    bv = seg_bias(pack.nq2 + pack.nk2, pack.nv2, nkv)

    qp, sc = _untile_cols(pl["o_qp"], pl["o_sc"])
    (wo,) = _col_segments(qp, sc, (pack.no2,), (pack.dim,), g, od)

    qp, sc = _untile_cols(pl["gu_qp"], pl["gu_sc"])
    nu2 = qp.shape[-1] - pack.ng2
    wg, wu = _col_segments(
        qp, sc, (pack.ng2, nu2), (pack.inter, pack.inter), g, od)

    dqp = pl["dn_qp"]  # [ND, TKD, Cd]
    ND, TKD, Cd = dqp.shape
    dqp = dqp.reshape(ND * TKD, Cd)
    dsc = pl["dn_sc"].reshape(ND * TKD // g, 4, Cd)
    if dsc.dtype == jnp.uint16:
        dsc = jax.lax.bitcast_convert_type(dsc, jnp.float16).astype(
            jnp.float32)
    wd = Int4GroupedTensor(
        qp=dqp, sl=dsc[:, 0][:, None, :], sh=dsc[:, 1][:, None, :],
        bl=dsc[:, 2][:, None, :], bh=dsc[:, 3][:, None, :],
        n=pack.dim, group_size=g, out_dtype=od)

    return {
        "input_layernorm": {"weight": pl["norms"][0]},
        "post_attention_layernorm": {"weight": pl["norms"][1]},
        "self_attn": {
            "q_proj": {"weight": wq, "bias": bq},
            "k_proj": {"weight": wk, "bias": bk},
            "v_proj": {"weight": wv, "bias": bv},
            "o_proj": {"weight": wo},
        },
        "mlp": {
            "gate_proj": {"weight": wg},
            "up_proj": {"weight": wu},
            "down_proj": {"weight": wd},
        },
    }


def stacked_params_from_pack(pack: FusedDecodePack) -> dict:
    """Full stacked layer tree rebuilt from the pack (HOST-side numpy).

    Inverse of build_fused_pack over every layer at once: returns the
    {input_layernorm, post_attention_layernorm, self_attn.{q,k,v,o}_proj,
    mlp.{gate,up,down}_proj} tree with [L,...]-stacked Int4GroupedTensor
    weights — exactly the layout _stack_layers produces — so pack-only
    loads can be TP-sharded (parallel/shard.py), LoRA-trained, and
    convert-roundtripped.  Device pack leaves are fetched to host first:
    the relayout transients (~4 GB at 7B) must not land in HBM on top of
    the resident pack."""
    import numpy as np

    g, od = pack.group_size, pack.out_dtype
    nkv = pack.n_kv * pack.head_dim
    L = pack.n_layers

    def untile(qp, sc):
        # [L,NT,K,TN] -> [L,K,C];  [L,NT,G,4,TN] -> [L,G,4,C]
        qp = np.asarray(qp)
        sc = np.asarray(sc)
        if sc.dtype == np.uint16:  # f16-bit planes -> exact f32
            sc = sc.view(np.float16).astype(np.float32)
        Lx, NT, K, TN = qp.shape
        qp = qp.transpose(0, 2, 1, 3).reshape(Lx, K, NT * TN)
        G = sc.shape[2]
        sc = sc.transpose(0, 2, 3, 1, 4).reshape(Lx, G, 4, NT * TN)
        return qp, sc

    def segments(qp, sc, widths, ns):
        outs, c0 = [], 0
        for w, n in zip(widths, ns):
            pl_ = sc[:, :, :, c0:c0 + w]
            outs.append(Int4GroupedTensor(
                qp=np.ascontiguousarray(qp[:, :, c0:c0 + w]),
                sl=np.ascontiguousarray(pl_[:, :, 0][:, :, None, :]),
                sh=np.ascontiguousarray(pl_[:, :, 1][:, :, None, :]),
                bl=np.ascontiguousarray(pl_[:, :, 2][:, :, None, :]),
                bh=np.ascontiguousarray(pl_[:, :, 3][:, :, None, :]),
                n=n, group_size=g, out_dtype=od))
            c0 += w
        return outs

    qp, sc = untile(pack.qkv_qp, pack.qkv_sc)
    wq, wk, wv = segments(
        qp, sc, (pack.nq2, pack.nk2, pack.nv2), (pack.dim, nkv, nkv))
    bias = np.asarray(pack.qkv_bias)  # [L, 2, Cq]
    lo, hi = bias[:, 0], bias[:, 1]

    def seg_bias(c0, w, n):
        return np.ascontiguousarray(np.concatenate(
            [lo[:, c0:c0 + w], hi[:, c0:c0 + w]], axis=-1)[:, :n])

    bq = seg_bias(0, pack.nq2, pack.dim)
    bk = seg_bias(pack.nq2, pack.nk2, nkv)
    bv = seg_bias(pack.nq2 + pack.nk2, pack.nv2, nkv)

    qp, sc = untile(pack.o_qp, pack.o_sc)
    (wo,) = segments(qp, sc, (pack.no2,), (pack.dim,))

    qp, sc = untile(pack.gu_qp, pack.gu_sc)
    nu2 = qp.shape[-1] - pack.ng2
    wg, wu = segments(qp, sc, (pack.ng2, nu2), (pack.inter, pack.inter))

    dqp = np.asarray(pack.dn_qp)  # [L, ND, TKD, Cd]
    _, ND, TKD, Cd = dqp.shape
    dsc = np.asarray(pack.dn_sc)
    if dsc.dtype == np.uint16:
        dsc = dsc.view(np.float16).astype(np.float32)
    dsc = dsc.reshape(L, ND * TKD // g, 4, Cd)
    wd = Int4GroupedTensor(
        qp=dqp.reshape(L, ND * TKD, Cd),
        sl=np.ascontiguousarray(dsc[:, :, 0][:, :, None, :]),
        sh=np.ascontiguousarray(dsc[:, :, 1][:, :, None, :]),
        bl=np.ascontiguousarray(dsc[:, :, 2][:, :, None, :]),
        bh=np.ascontiguousarray(dsc[:, :, 3][:, :, None, :]),
        n=pack.dim, group_size=g, out_dtype=od)

    norms = np.asarray(pack.norms)  # [L, 2, D]
    return {
        "input_layernorm": {"weight": np.ascontiguousarray(norms[:, 0])},
        "post_attention_layernorm": {
            "weight": np.ascontiguousarray(norms[:, 1])},
        "self_attn": {
            "q_proj": {"weight": wq, "bias": bq},
            "k_proj": {"weight": wk, "bias": bk},
            "v_proj": {"weight": wv, "bias": bv},
            "o_proj": {"weight": wo},
        },
        "mlp": {
            "gate_proj": {"weight": wg},
            "up_proj": {"weight": wu},
            "down_proj": {"weight": wd},
        },
    }


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


import os

_CHUNK_K = int(os.environ.get("FUSED_DECODE_CHUNK_K", "0"))
# dev-only ablation switch for tools/probe_fused.py: comma list of
# nodot (skip MXU dots) / nodeq (skip dequant+dot, DMA only) /
# noattn (skip attention math) — NOT for production use
_ABLATE = set(filter(None, os.environ.get(
    "FUSED_DECODE_ABLATE", "").split(",")))


def _scales_f32(sc):
    """Exact f16-bits (u16) -> f32 scale-plane decode; f32 passes through.

    Handles normals, zeros, and subnormals (tiny f16 biases); inf/nan do
    not occur in quantization scales."""
    if sc.dtype != jnp.uint16:
        return sc.astype(jnp.float32) if sc.dtype != jnp.float32 else sc
    u = sc.astype(jnp.int32)
    sign = (u & 0x8000) << 16
    exp = (u >> 10) & 0x1F
    mant = u & 0x3FF
    normal = jax.lax.bitcast_convert_type(
        sign | ((exp + 112) << 23) | (mant << 13), jnp.float32)
    sub = mant.astype(jnp.float32) * jnp.float32(5.9604645e-08)
    sub = jnp.where(sign != 0, -sub, sub)
    return jnp.where(exp == 0, sub, normal)


def _mv2(x, qp, sc, g):
    """x [8, TK] f32 @ dequant(tile) -> (ylo, yhi) [8, TN] f32.

    qp [TK, TN] u8 (two nibble planes); sc [gt, 4, TN] f32.
    FUSED_DECODE_CHUNK_K>0 processes the contraction in row chunks so the
    dequantized f32 intermediates stay small (less VMEM pressure against
    the streaming DMA)."""
    TK, TN = qp.shape
    gt = TK // g
    sc = _scales_f32(sc)
    if sc.ndim == 2:  # merged manual-kernel layout [gt*4, TN]
        sc = sc.reshape(gt, 4, TN)
    if "nodeq" in _ABLATE:
        z = (qp[0:8, :].astype(jnp.int32).astype(jnp.float32) * 1e-9
             + sc[0, 0:1, :] * 1e-9 + x[:, 0:1] * 0.0)
        return z, z
    xb = x.astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    ck = _CHUNK_K if _CHUNK_K and TK % _CHUNK_K == 0 and _CHUNK_K % g == 0 \
        else TK

    ylo = jnp.zeros((x.shape[0], TN), jnp.float32)
    yhi = jnp.zeros((x.shape[0], TN), jnp.float32)
    gc = ck // g
    for c in range(TK // ck):
        qi = qp[c * ck:(c + 1) * ck].astype(jnp.int32)
        scc = sc[c * gc:(c + 1) * gc]
        lo = (qi & 0xF).astype(jnp.float32).reshape(gc, g, TN)
        hi = (qi >> 4).astype(jnp.float32).reshape(gc, g, TN)
        # bf16 operand dots: f32 MXU passes are ~4x slower; bf16 weights
        # match the XLA dequant path's precision
        w_lo = (lo * scc[:, 0:1] + scc[:, 2:3]
                ).reshape(ck, TN).astype(jnp.bfloat16)
        w_hi = (hi * scc[:, 1:2] + scc[:, 3:4]
                ).reshape(ck, TN).astype(jnp.bfloat16)
        xc = xb[:, c * ck:(c + 1) * ck]
        if "nodot" in _ABLATE:
            ylo = ylo + w_lo[0:8, :].astype(jnp.float32) * 1e-9 \
                + xc[:, 0:1].astype(jnp.float32) * 0.0
            yhi = yhi + w_hi[0:8, :].astype(jnp.float32) * 1e-9
        else:
            ylo = ylo + jax.lax.dot_general(
                xc, w_lo, dims, preferred_element_type=jnp.float32)
            yhi = yhi + jax.lax.dot_general(
                xc, w_hi, dims, preferred_element_type=jnp.float32)
    return ylo, yhi


def make_manual_kernel(plan):
    """v3 kernel body: gridless manual-DMA pipeline (2026-08, this chip).

    Why not the pipelined grid (make_kernel below): measured on the axon
    v5e, the grid runs DMA and compute SERIALIZED — 8.2 ms/step where the
    pure-DMA floor is 5.0 ms (tools/probe_fused.py ablations add exactly
    linearly).  A gridless kernel with explicit make_async_copy
    double-buffering (tools/probe_manualdma.py) overlaps the same dequant
    +dot math to within ~15% of the DMA floor.  Per-grid-step machinery
    (6 pl.when branch groups + 6 where-based index maps x 2436 steps) is
    the exposed cost; one fori_loop over layers with 4 statically-peeled
    kind phases replaces it.

    Tile order per layer: qkv[NQ] -> attention -> o[NO] -> +residual,
    norm2 -> gu[NGU] -> swiglu -> dn[ND] (K-accumulate) -> +residual.
    Each kind's tile j+1 DMA starts before tile j's wait; the LAST tile
    of a kind starts the NEXT kind's tile 0 (cross-kind lookahead), and
    dn's last tile starts layer l+1's qkv tile 0."""
    p = plan
    D, I, g = p.dim, p.inter, p.group_size
    nh, nkv, hd = p.n_heads, p.n_kv, p.head_dim
    gq = nh // nkv
    n_q, n_k = nh * hd, nkv * hd
    L = p.n_layers
    C = p.capacity
    # z2 (raw-byte MXU dots + group-partial scaling) measured 6.93 ms/tok
    # vs deq's 7.37 on the 7B bench (2026-08, this chip) at identical or
    # better precision; MLX_VLM_TPU_FUSED_MV=deq restores the dequant dots
    mv = _mv2 if os.environ.get("MLX_VLM_TPU_FUSED_MV", "z2") == "deq" \
        else _mv2z

    def kernel(*refs):
        it = iter(refs)
        off_ref, h_in_ref, cossin_ref, qkv_b_ref, norms_ref = (
            next(it) for _ in range(5))
        hd_norm_ref = next(it) if p.NH else None
        (qkv_qp, qkv_sc, o_qp, o_sc, gu_qp, gu_sc, dn_qp, dn_sc,
         k_hist, v_hist) = (next(it) for _ in range(10))
        hd_qp_ref = next(it) if p.NH else None
        hd_sc_ref = next(it) if p.NH else None
        h_out_ref, k_new_ref, v_new_ref = (next(it) for _ in range(3))
        logits_ref = next(it) if p.NH else None
        (sc_h, sc_xn, sc_attn, sc_y, sc_act3, sc_flo, sc_fhi,
         sc_qh, sc_kvh, sc_oh,
         b_qkv_qp, b_qkv_sc, b_o_qp, b_o_sc, b_gu_qp, b_gu_sc,
         b_dn_qp, b_dn_sc, b_k, b_v,
         sem_qkv, sem_o, sem_gu, sem_dn, sem_kv) = (
            next(it) for _ in range(25))

        def mk_stream(hbm_qp, hbm_sc, bq, bs, sem):
            def start(slot, l, j):
                pltpu.make_async_copy(
                    hbm_qp.at[l, j], bq.at[slot], sem.at[slot, 0]).start()
                pltpu.make_async_copy(
                    hbm_sc.at[l, j], bs.at[slot], sem.at[slot, 1]).start()

            def wait(slot, l, j):
                pltpu.make_async_copy(
                    hbm_qp.at[l, j], bq.at[slot], sem.at[slot, 0]).wait()
                pltpu.make_async_copy(
                    hbm_sc.at[l, j], bs.at[slot], sem.at[slot, 1]).wait()

            return start, wait

        qkv_start, qkv_wait = mk_stream(
            qkv_qp, qkv_sc, b_qkv_qp, b_qkv_sc, sem_qkv)
        o_start, o_wait = mk_stream(o_qp, o_sc, b_o_qp, b_o_sc, sem_o)
        gu_start, gu_wait = mk_stream(gu_qp, gu_sc, b_gu_qp, b_gu_sc, sem_gu)
        dn_start, dn_wait = mk_stream(dn_qp, dn_sc, b_dn_qp, b_dn_sc, sem_dn)

        def kv_start(slot, l):
            pltpu.make_async_copy(
                k_hist.at[l], b_k.at[slot], sem_kv.at[slot, 0]).start()
            pltpu.make_async_copy(
                v_hist.at[l], b_v.at[slot], sem_kv.at[slot, 1]).start()

        def kv_wait(slot, l):
            pltpu.make_async_copy(
                k_hist.at[l], b_k.at[slot], sem_kv.at[slot, 0]).wait()
            pltpu.make_async_copy(
                v_hist.at[l], b_v.at[slot], sem_kv.at[slot, 1]).wait()

        NSLOT = 3

        def phase(start, wait, N, l, compute, nexts):
            """N streamed tiles; lookahead-2 over NSLOT revolving buffers.

            `nexts`: thunks that start the FIRST tiles of the next kind
            (fired from the last iterations so cross-kind DMA stays deep).
            Tiles 0..len(nexts)-1 of this kind were started the same way
            by the previous kind (or the prologue)."""
            if N > 2:
                def body(j, carry):
                    start(jax.lax.rem(j + 2, NSLOT), l, j + 2)
                    wait(jax.lax.rem(j, NSLOT), l, j)
                    compute(j, jax.lax.rem(j, NSLOT))
                    return carry
                jax.lax.fori_loop(0, N - 2, body, 0, unroll=False)
            fired = 0
            for j in range(max(0, N - 2), N):
                if fired < len(nexts):
                    nexts[fired]()
                    fired += 1
                wait(j % NSLOT, l, j)
                compute(j, j % NSLOT)
            while fired < len(nexts):
                nexts[fired]()
                fired += 1

        # -------------------------------------------------- prologue
        sc_h[:] = h_in_ref[:].astype(jnp.float32)
        qkv_start(0, 0, 0)
        if p.NQ > 1:
            qkv_start(1, 0, 1)
        kv_start(0, 0)

        def layer(l, carry):
            ln = norms_ref[pl.ds(l, 1)][0]          # [2, D]
            xf = sc_h[:]
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            sc_xn[:] = xf * jax.lax.rsqrt(var + p.eps) * ln[0:1, :]

            # ---- qkv tiles
            def qkv_compute(j, slot):
                ylo, yhi = mv(sc_xn[:], b_qkv_qp[slot], b_qkv_sc[slot], g)
                sc_y[pl.ds(j, 1), :, : p.TNQ] = ylo[None]
                sc_y[pl.ds(j, 1), :, p.TNQ: 2 * p.TNQ] = yhi[None]

            o_nexts = [lambda: o_start(0, l, 0)]
            if p.NO > 1:
                o_nexts.append(lambda: o_start(1, l, 1))
            phase(qkv_start, qkv_wait, p.NQ, l, qkv_compute, o_nexts)

            # ---- attention
            for j in range(p.NQ):  # flatten tile outputs (row 0 only)
                sc_flo[0:1, j * p.TNQ:(j + 1) * p.TNQ] = sc_y[j, 0:1, :p.TNQ]
                sc_fhi[0:1, j * p.TNQ:(j + 1) * p.TNQ] = \
                    sc_y[j, 0:1, p.TNQ: 2 * p.TNQ]
            lb = qkv_b_ref[pl.ds(l, 1)][0]          # [2, Cq]
            lo = sc_flo[0:1, : p.nq2 + p.nk2 + p.nv2] + lb[0:1, :]
            hi = sc_fhi[0:1, : p.nq2 + p.nk2 + p.nv2] + lb[1:2, :]
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

            kvslot = jax.lax.rem(l, 2)
            kv_wait(kvslot, l)
            kv_start(jax.lax.rem(l + 1, 2), jnp.minimum(l + 1, L - 1))
            off = off_ref[0]
            for a in range(nkv if "noattn" not in _ABLATE else 0):
                qg = sc_qh[a * gq:(a + 1) * gq, :]       # [gq, hd]
                kf = b_k[kvslot, a].astype(jnp.bfloat16)  # [C, hd]
                vf = b_v[kvslot, a].astype(jnp.bfloat16)
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

            sc_attn[:] = jnp.zeros_like(sc_attn)
            sc_attn[0:1, :n_q] = sc_oh[0:nh, :].reshape(1, n_q)

            # ---- o tiles
            def o_compute(j, slot):
                ylo, yhi = mv(sc_attn[:], b_o_qp[slot], b_o_sc[slot], g)
                sc_y[pl.ds(j, 1), :, : p.TNO] = ylo[None]
                sc_y[pl.ds(j, 1), :, p.TNO: 2 * p.TNO] = yhi[None]

            gu_nexts = [lambda: gu_start(0, l, 0)]
            if p.NGU > 1:
                gu_nexts.append(lambda: gu_start(1, l, 1))
            phase(o_start, o_wait, p.NO, l, o_compute, gu_nexts)

            for j in range(p.NO):
                sc_flo[:, j * p.TNO:(j + 1) * p.TNO] = sc_y[j, :, :p.TNO]
                sc_fhi[:, j * p.TNO:(j + 1) * p.TNO] = \
                    sc_y[j, :, p.TNO: 2 * p.TNO]
            sc_h[:] += _halves(sc_flo[:, : p.no2], sc_fhi[:, : p.no2], D)
            xf2 = sc_h[:]
            var2 = jnp.mean(xf2 * xf2, axis=-1, keepdims=True)
            sc_xn[:] = xf2 * jax.lax.rsqrt(var2 + p.eps) * ln[1:2, :]

            # ---- gate|up tiles
            def gu_compute(j, slot):
                ylo, yhi = mv(sc_xn[:], b_gu_qp[slot], b_gu_sc[slot], g)
                sc_y[pl.ds(j, 1), :, : p.TNG] = ylo[None]
                sc_y[pl.ds(j, 1), :, p.TNG: 2 * p.TNG] = yhi[None]

            dn_nexts = [lambda: dn_start(0, l, 0)]
            if p.ND > 1:
                dn_nexts.append(lambda: dn_start(1, l, 1))
            phase(gu_start, gu_wait, p.NGU, l, gu_compute, dn_nexts)

            # ---- swiglu
            for j in range(p.NGU):
                jl = j * p.TNG
                sc_flo[:, jl: jl + p.TNG] = sc_y[j, :, : p.TNG]
                sc_fhi[:, jl: jl + p.TNG] = sc_y[j, :, p.TNG: 2 * p.TNG]
            glo = sc_flo[:, : 2 * p.ng2]
            ghi = sc_fhi[:, : 2 * p.ng2]
            gate = _halves(glo[:, : p.ng2], ghi[:, : p.ng2], I)
            up = _halves(glo[:, p.ng2:], ghi[:, p.ng2:], I)
            act = gate * jax.nn.sigmoid(gate) * up       # [8, I]
            for j in range(p.ND):
                sc_act3[j] = act[:, j * p.TKD:(j + 1) * p.TKD]
            sc_flo[:] = jnp.zeros_like(sc_flo)
            sc_fhi[:] = jnp.zeros_like(sc_fhi)

            # ---- down K-tiles (accumulate)
            def dn_compute(j, slot):
                x = sc_act3[pl.ds(j, 1)][0]              # [8, TKD]
                ylo, yhi = mv(x, b_dn_qp[slot], b_dn_sc[slot], g)
                sc_flo[:, : p.nd2] += ylo
                sc_fhi[:, : p.nd2] += yhi

            lnx = jnp.minimum(l + 1, L - 1)
            nl_nexts = [lambda: qkv_start(0, lnx, 0)]
            if p.NQ > 1:
                nl_nexts.append(lambda: qkv_start(1, lnx, 1))
            phase(dn_start, dn_wait, p.ND, l, dn_compute, nl_nexts)

            sc_h[:] += _halves(sc_flo[:, : p.nd2], sc_fhi[:, : p.nd2], D)
            return carry

        jax.lax.fori_loop(0, L, layer, 0, unroll=False)
        h_out_ref[:] = sc_h[:]
        # drain the one speculative prefetch issued past the end (layer
        # L-1's dn peel started qkv tile 0 of clamped layer L-1, and its
        # attention started a kv fetch) so no DMA outlives the kernel
        qkv_wait(0, L - 1, 0)
        if p.NQ > 1:
            qkv_wait(1, L - 1, 1)
        kv_wait(jax.lax.rem(L, 2), L - 1)

        # ---- fused lm_head: stream head tiles through the (drained) qkv
        # buffers and emit the logits halves planes
        if p.NH:
            xf = sc_h[:]
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            sc_xn[:] = xf * jax.lax.rsqrt(var + p.eps) \
                * hd_norm_ref[0:1, :]

            def hd_start(slot, _l, j):
                pltpu.make_async_copy(
                    hd_qp_ref.at[j], b_qkv_qp.at[slot],
                    sem_qkv.at[slot, 0]).start()
                pltpu.make_async_copy(
                    hd_sc_ref.at[j], b_qkv_sc.at[slot],
                    sem_qkv.at[slot, 1]).start()

            def hd_wait(slot, _l, j):
                pltpu.make_async_copy(
                    hd_qp_ref.at[j], b_qkv_qp.at[slot],
                    sem_qkv.at[slot, 0]).wait()
                pltpu.make_async_copy(
                    hd_sc_ref.at[j], b_qkv_sc.at[slot],
                    sem_qkv.at[slot, 1]).wait()

            hd_start(0, 0, 0)
            if p.NH > 1:
                hd_start(1, 0, 1)

            def hd_compute(j, slot):
                ylo, yhi = mv(sc_xn[:], b_qkv_qp[slot], b_qkv_sc[slot], g)
                logits_ref[0:1, pl.ds(j * p.TNQ, p.TNQ)] = ylo[0:1]
                logits_ref[0:1, pl.ds(p.nhd2_pad + j * p.TNQ, p.TNQ)] = \
                    yhi[0:1]

            phase(hd_start, hd_wait, p.NH, 0, hd_compute, [])

    return kernel


def fused_decode_step_manual(pack: FusedDecodePack, h: jax.Array,
                             cos: jax.Array, sin: jax.Array,
                             k_cache: jax.Array, v_cache: jax.Array,
                             offset: jax.Array,
                             interpret: Optional[bool] = None):
    """One whole-stack decode step via the manual-DMA v3 kernel.

    Same contract as fused_decode_step (h [1,1,D] -> pre-final-norm
    h_out [1,1,D] f32 + per-layer k/v rows)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L, _, Hkv, C, hd = k_cache.shape
    p = _make_plan(pack, C)
    D = p.dim

    cs = jnp.concatenate([cos.reshape(1, -1), sin.reshape(1, -1)], axis=0)
    cs = jnp.concatenate([cs, cs], axis=-1).astype(jnp.float32)  # [2, hd]
    h8 = jnp.zeros((M_ROWS, D), jnp.float32).at[0].set(
        h.reshape(-1, D)[0].astype(jnp.float32))

    kernel = make_manual_kernel(p)
    nkv8 = p.nkv8
    out_shapes = [
        jax.ShapeDtypeStruct((M_ROWS, D), jnp.float32),
        jax.ShapeDtypeStruct((L, nkv8, hd), jnp.float32),
        jax.ShapeDtypeStruct((L, nkv8, hd), jnp.float32),
    ]
    if p.NH:
        out_shapes.append(
            jax.ShapeDtypeStruct((1, 2 * p.nhd2_pad), jnp.float32))
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)  # noqa: pl.ANY alias differs across jax versions
    G = D // p.group_size
    gtd = p.TKD // p.group_size
    TNmax = max(p.TNQ, p.TNO, p.TNG)
    NTmax = max(p.NQ, p.NO, p.NGU)
    fmax = max(p.no2, p.nd2, 2 * p.ng2,
               p.NQ * p.TNQ, p.NO * p.TNO, p.NGU * p.TNG)
    Cd = pack.dn_qp.shape[-1]
    scratch = [
        pltpu.VMEM((M_ROWS, D), jnp.float32),             # sc_h
        pltpu.VMEM((M_ROWS, D), jnp.float32),             # sc_xn
        pltpu.VMEM((M_ROWS, D), jnp.float32),             # sc_attn
        pltpu.VMEM((NTmax, M_ROWS, 2 * TNmax), jnp.float32),  # sc_y
        pltpu.VMEM((p.ND, M_ROWS, p.TKD), jnp.float32),   # sc_act3
        pltpu.VMEM((M_ROWS, fmax), jnp.float32),          # sc_flo
        pltpu.VMEM((M_ROWS, fmax), jnp.float32),          # sc_fhi
        pltpu.VMEM((p.nh8, hd), jnp.float32),             # sc_qh
        pltpu.VMEM((2 * p.nkv8, hd), jnp.float32),        # sc_kvh
        pltpu.VMEM((p.nh8, hd), jnp.float32),             # sc_oh
        pltpu.VMEM((3, D, p.TNQ), jnp.uint8),             # b_qkv_qp
        pltpu.VMEM((3, G * 4, p.TNQ), pack.qkv_sc.dtype),  # b_qkv_sc
        pltpu.VMEM((3, D, p.TNO), jnp.uint8),             # b_o_qp
        pltpu.VMEM((3, G * 4, p.TNO), pack.o_sc.dtype),   # b_o_sc
        pltpu.VMEM((3, D, p.TNG), jnp.uint8),             # b_gu_qp
        pltpu.VMEM((3, G * 4, p.TNG), pack.gu_sc.dtype),  # b_gu_sc
        pltpu.VMEM((3, p.TKD, Cd), jnp.uint8),            # b_dn_qp
        pltpu.VMEM((3, gtd * 4, Cd), pack.dn_sc.dtype),   # b_dn_sc
        pltpu.VMEM((2, Hkv, C, hd), k_cache.dtype),       # b_k
        pltpu.VMEM((2, Hkv, C, hd), v_cache.dtype),       # b_v
        pltpu.SemaphoreType.DMA((3, 2)),                  # sem_qkv
        pltpu.SemaphoreType.DMA((3, 2)),                  # sem_o
        pltpu.SemaphoreType.DMA((3, 2)),                  # sem_gu
        pltpu.SemaphoreType.DMA((3, 2)),                  # sem_dn
        pltpu.SemaphoreType.DMA((2, 2)),                  # sem_kv
    ]

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # offset
        vmem,                                   # h_in
        vmem,                                   # cos/sin
        vmem,                                   # qkv bias [L, 2, Cq]
        vmem,                                   # norms [L, 2, D]
    ]
    inputs = [
        jnp.atleast_1d(offset).astype(jnp.int32),
        h8, cs, pack.qkv_bias, pack.norms,
    ]
    if p.NH:
        in_specs.append(vmem)                   # head final-norm [1, D]
        inputs.append(pack.hd_norm)
    in_specs += [hbm, hbm, hbm, hbm, hbm, hbm, hbm, hbm,  # weights
                 hbm, hbm]                                # kv history
    def _merge_sc(a):
        # [..., G, 4, TN] -> [..., G*4, TN]: adjacent-dim merge, layout-
        # preserving on the HBM side; keeps the VMEM buffer sublane-clean
        sh = a.shape
        return a.reshape(sh[:-3] + (sh[-3] * 4, sh[-1]))

    inputs += [
        pack.qkv_qp, _merge_sc(pack.qkv_sc), pack.o_qp, _merge_sc(pack.o_sc),
        pack.gu_qp, _merge_sc(pack.gu_sc), pack.dn_qp, _merge_sc(pack.dn_sc),
        k_cache[:, 0], v_cache[:, 0],
    ]
    if p.NH:
        in_specs += [hbm, hbm]                  # head weight stream
        inputs += [pack.hd_qp, _merge_sc(pack.hd_sc)]

    outs = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=[vmem] * len(out_shapes),
        scratch_shapes=scratch,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    if p.NH:
        h_out, k_new, v_new, halves = outs
        # halves planes -> real vocab order (padding sliced away)
        logits = jnp.concatenate(
            [halves[:, : p.nhd2],
             halves[:, p.nhd2_pad: p.nhd2_pad + p.nhd2]],
            axis=-1)[:, : p.head_n]
        return h_out[0:1, None, :], k_new, v_new, logits
    h_out, k_new, v_new = outs
    return h_out[0:1, None, :], k_new, v_new


def _mv2z(x, qp, sc, g):
    """x [8, TK] f32 @ dequant(tile) -> (ylo, yhi) [8, TN] f32 — the
    MXU-heavy z2 formulation (v3 kernel default).

    Identical math to _mv2 at higher effective precision: instead of
    materializing bf16-rounded dequantized weights, dot the RAW BYTES
    (0..255 — exact in bf16's 8 significand bits) and the hi nibble per
    group, then apply scales to the f32 group partial sums:
        z2_j = x_j @ bytes_j          (= lo + 16*hi)
        zh_j = x_j @ hi_j
        ylo += (z2_j - 16 zh_j) * s_l[j] + sigma_j * b_l[j]
        yhi += zh_j * s_h[j] + sigma_j * b_h[j]
    VPU cost: widen + cvt + shr + cvt (4 passes) vs _mv2's ~9 (unpack,
    2x f32 FMA, 2x bf16 cast) — measured 1.1 us vs 4.6 us per [3584,512]
    tile on this chip (tools/probe_manualdma.py co_z2grp / co_deq), which
    is the difference between compute-bound and DMA-bound decode."""
    TK, TN = qp.shape
    gt = TK // g
    sc = _scales_f32(sc)
    # plane rows: [gt, 4, TN] (grid kernel) or MERGED [gt*4, TN] (manual
    # kernel — a 4-row sublane dim would pad to 8 in VMEM; merged rows
    # tile cleanly and the plane DMA/buffer stops carrying dead sublanes)
    if sc.ndim == 3:
        def row(j, k):
            return sc[j, k:k + 1]
    else:
        def row(j, k):
            return sc[4 * j + k: 4 * j + k + 1]
    xb = x.astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    qi = qp.astype(jnp.int32)
    q2 = qi.astype(jnp.bfloat16)          # lo + 16*hi, exact
    hi = (qi >> 4).astype(jnp.bfloat16)
    ylo = jnp.zeros((x.shape[0], TN), jnp.float32)
    yhi = jnp.zeros((x.shape[0], TN), jnp.float32)
    ylo2 = jnp.zeros((x.shape[0], TN), jnp.float32)
    yhi2 = jnp.zeros((x.shape[0], TN), jnp.float32)
    for j in range(gt):
        sl_ = slice(j * g, (j + 1) * g)
        xgj = xb[:, sl_]
        z2 = jax.lax.dot_general(xgj, q2[sl_], dims,
                                 preferred_element_type=jnp.float32)
        zh = jax.lax.dot_general(xgj, hi[sl_], dims,
                                 preferred_element_type=jnp.float32)
        sj = jnp.sum(x[:, sl_], axis=1, keepdims=True)  # [8, 1] f32
        zl = z2 - 16.0 * zh
        if j % 2 == 0:
            ylo = ylo + zl * row(j, 0) + sj * row(j, 2)
            yhi = yhi + zh * row(j, 1) + sj * row(j, 3)
        else:
            ylo2 = ylo2 + zl * row(j, 0) + sj * row(j, 2)
            yhi2 = yhi2 + zh * row(j, 1) + sj * row(j, 3)
    return ylo + ylo2, yhi + yhi2


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
    NH: int = 0  # fused lm_head tiles (0 = head not packed)
    nhd2: int = 0
    nhd2_pad: int = 0
    head_n: int = 0

    @property
    def TPL(self) -> int:  # grid steps per layer
        return self.NQ + self.NO + self.NGU + self.ND


def _make_plan(pack: FusedDecodePack, capacity: int) -> _Plan:
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
        NH=(pack.hd_qp.shape[0] if pack.hd_qp is not None else 0),
        nhd2=pack.nhd2, nhd2_pad=pack.nhd2_pad, head_n=pack.head_n,
    )


def make_kernel(plan):
    """Kernel body closure over the static plan (pipelined-grid design)."""
    p = plan
    D, I, g = p.dim, p.inter, p.group_size
    nh, nkv, hd = p.n_heads, p.n_kv, p.head_dim
    gq = nh // nkv
    n_q, n_k = nh * hd, nkv * hd
    B1 = p.NQ               # first o step (attention runs here)
    B2 = p.NQ + p.NO        # first gu step (o residual + norm2 here)
    B3 = B2 + p.NGU         # first dn step (swiglu here)
    TPL = p.TPL

    def kernel(off_ref, h_in_ref, cossin_ref, qkv_b_ref, norms_ref,
               qkv_qp, qkv_sc, o_qp, o_sc, gu_qp, gu_sc, dn_qp, dn_sc,
               k_hist, v_hist,
               h_out_ref, k_new_ref, v_new_ref,
               sc_h, sc_xn, sc_attn, sc_qlo, sc_qhi,
               sc_qh, sc_kvh, sc_oh,
               sc_yq, sc_yo, sc_yg, sc_act3, sc_flo, sc_fhi):
        t = pl.program_id(0)
        l = t // TPL
        s = t - l * TPL

        # ---- layer entry: residual comes in via sc_h; norm1
        @pl.when(s == 0)
        def _():
            @pl.when(l == 0)
            def _():
                sc_h[:] = h_in_ref[:].astype(jnp.float32)

            ln = norms_ref[pl.ds(l, 1)][0]  # [2, D]
            xf = sc_h[:]
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            sc_xn[:] = xf * jax.lax.rsqrt(var + p.eps) * ln[0:1, :]

        # ---- qkv tiles
        @pl.when(s < B1)
        def _():
            ylo, yhi = _mv2(sc_xn[:], qkv_qp[0, 0], qkv_sc[0, 0], g)
            sc_yq[pl.ds(s, 1), :, : p.TNQ] = ylo[None]
            sc_yq[pl.ds(s, 1), :, p.TNQ:] = yhi[None]

        # ---- attention (first o step, before its dot)
        @pl.when(s == B1)
        def _():
            for j in range(p.NQ):  # flatten tile outputs (row 0 only)
                sc_qlo[0:1, j * p.TNQ:(j + 1) * p.TNQ] = sc_yq[j, 0:1, :p.TNQ]
                sc_qhi[0:1, j * p.TNQ:(j + 1) * p.TNQ] = sc_yq[j, 0:1, p.TNQ:]
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
            for a in range(nkv if "noattn" not in _ABLATE else 0):
                qg = sc_qh[a * gq:(a + 1) * gq, :]       # [gq, hd]
                kf = k_hist[0, a].astype(jnp.bfloat16)   # [C, hd]
                vf = v_hist[0, a].astype(jnp.bfloat16)
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

            sc_attn[:] = jnp.zeros_like(sc_attn)
            sc_attn[0:1, :n_q] = sc_oh[0:nh, :].reshape(1, n_q)

        # ---- o tiles
        @pl.when((s >= B1) & (s < B2))
        def _():
            ylo, yhi = _mv2(sc_attn[:], o_qp[0, 0], o_sc[0, 0], g)
            sc_yo[pl.ds(s - B1, 1), :, : p.TNO] = ylo[None]
            sc_yo[pl.ds(s - B1, 1), :, p.TNO:] = yhi[None]

        # ---- o residual + norm2 (first gu step, before its dot)
        @pl.when(s == B2)
        def _():
            for j in range(p.NO):
                sc_flo[:, j * p.TNO:(j + 1) * p.TNO] = sc_yo[j, :, :p.TNO]
                sc_fhi[:, j * p.TNO:(j + 1) * p.TNO] = sc_yo[j, :, p.TNO:]
            sc_h[:] += _halves(sc_flo[:, : p.no2], sc_fhi[:, : p.no2], D)
            ln = norms_ref[pl.ds(l, 1)][0]
            xf2 = sc_h[:]
            var2 = jnp.mean(xf2 * xf2, axis=-1, keepdims=True)
            sc_xn[:] = xf2 * jax.lax.rsqrt(var2 + p.eps) * ln[1:2, :]

        # ---- gate|up tiles
        @pl.when((s >= B2) & (s < B3))
        def _():
            ylo, yhi = _mv2(sc_xn[:], gu_qp[0, 0], gu_sc[0, 0], g)
            sc_yg[pl.ds(s - B2, 1), :, : p.TNG] = ylo[None]
            sc_yg[pl.ds(s - B2, 1), :, p.TNG:] = yhi[None]

        # ---- swiglu (first dn step, before its dot)
        @pl.when(s == B3)
        def _():
            # flatten gu planes into (lo | hi) packed-column order via the
            # f-scratches reused as [8, ng2] views
            for j in range(p.NGU):
                jl = j * p.TNG
                sc_flo[:, jl: jl + p.TNG] = sc_yg[j, :, : p.TNG]
                sc_fhi[:, jl: jl + p.TNG] = sc_yg[j, :, p.TNG:]
            glo = sc_flo[:, : 2 * p.ng2]
            ghi = sc_fhi[:, : 2 * p.ng2]
            gate = _halves(glo[:, : p.ng2], ghi[:, : p.ng2], I)
            up = _halves(glo[:, p.ng2:], ghi[:, p.ng2:], I)
            act = gate * jax.nn.sigmoid(gate) * up       # [8, I]
            for j in range(p.ND):
                sc_act3[j] = act[:, j * p.TKD:(j + 1) * p.TKD]
            sc_flo[:] = jnp.zeros_like(sc_flo)
            sc_fhi[:] = jnp.zeros_like(sc_fhi)

        # ---- down K-tiles (accumulate)
        @pl.when(s >= B3)
        def _():
            x = sc_act3[pl.ds(s - B3, 1)][0]             # [8, TKD]
            ylo, yhi = _mv2(x, dn_qp[0, 0], dn_sc[0, 0], g)
            sc_flo[:, : p.nd2] += ylo
            sc_fhi[:, : p.nd2] += yhi

        # ---- close the mlp residual; emit h at the very end
        @pl.when(s == TPL - 1)
        def _():
            sc_h[:] += _halves(sc_flo[:, : p.nd2], sc_fhi[:, : p.nd2], D)

            @pl.when(l == p.n_layers - 1)
            def _():
                h_out_ref[:] = sc_h[:]

    return kernel


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
    TPL = p.TPL
    B1, B2, B3 = p.NQ, p.NQ + p.NO, p.NQ + p.NO + p.NGU
    Lm1 = L - 1

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

    # ---- weight-stream index maps: each kind walks its own tile schedule;
    # outside its active window a ref points at the NEXT tile it will
    # consume, so the pipeline prefetches during other kinds' compute.
    def qkv_idx(t):
        l = t // TPL
        s = t - l * TPL
        nl = jnp.where(s < B1, l, jnp.minimum(l + 1, Lm1))
        nj = jnp.where(s < B1, s, 0)
        return (nl, nj, 0, 0)

    def o_idx(t):
        l = t // TPL
        s = t - l * TPL
        nl = jnp.where(s < B2, l, jnp.minimum(l + 1, Lm1))
        nj = jnp.where((s >= B1) & (s < B2), s - B1, 0)
        return (nl, nj, 0, 0)

    def gu_idx(t):
        l = t // TPL
        s = t - l * TPL
        nl = jnp.where(s < B3, l, jnp.minimum(l + 1, Lm1))
        nj = jnp.where((s >= B2) & (s < B3), s - B2, 0)
        return (nl, nj, 0, 0)

    def dn_idx(t):
        l = t // TPL
        s = t - l * TPL
        nj = jnp.where(s >= B3, s - B3, 0)
        return (l, nj, 0, 0)

    def kv_idx(t):
        l = t // TPL
        s = t - l * TPL
        return (jnp.where(s <= B1, l, jnp.minimum(l + 1, Lm1)), 0, 0, 0)

    def sc5(idx):
        return lambda t: idx(t) + (0,)

    G = D // p.group_size
    gtd = p.TKD // p.group_size
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # offset
        vmem,                                   # h_in
        vmem,                                   # cos/sin
        vmem,                                   # qkv bias [L, 2, Cq]
        vmem,                                   # norms [L, 2, D]
        pl.BlockSpec((1, 1, D, p.TNQ), qkv_idx),
        pl.BlockSpec((1, 1, G, 4, p.TNQ), sc5(qkv_idx)),
        pl.BlockSpec((1, 1, D, p.TNO), o_idx),
        pl.BlockSpec((1, 1, G, 4, p.TNO), sc5(o_idx)),
        pl.BlockSpec((1, 1, D, p.TNG), gu_idx),
        pl.BlockSpec((1, 1, G, 4, p.TNG), sc5(gu_idx)),
        pl.BlockSpec((1, 1, p.TKD, pack.dn_qp.shape[-1]), dn_idx),
        pl.BlockSpec((1, 1, gtd, 4, pack.dn_qp.shape[-1]), sc5(dn_idx)),
        pl.BlockSpec((1, Hkv, C, hd), kv_idx),
        pl.BlockSpec((1, Hkv, C, hd), kv_idx),
    ]
    out_specs = [
        pl.BlockSpec((M_ROWS, D), lambda t: (0, 0)),
        pl.BlockSpec((L, nkv8, hd), lambda t: (0, 0, 0)),
        pl.BlockSpec((L, nkv8, hd), lambda t: (0, 0, 0)),
    ]
    fmax = max(p.no2, p.nd2, 2 * p.ng2)
    scratch = [
        pltpu.VMEM((M_ROWS, D), jnp.float32),            # sc_h
        pltpu.VMEM((M_ROWS, D), jnp.float32),            # sc_xn
        pltpu.VMEM((M_ROWS, D), jnp.float32),            # sc_attn
        pltpu.VMEM((M_ROWS, p.NQ * p.TNQ), jnp.float32),  # sc_qlo
        pltpu.VMEM((M_ROWS, p.NQ * p.TNQ), jnp.float32),  # sc_qhi
        pltpu.VMEM((p.nh8, hd), jnp.float32),            # sc_qh
        pltpu.VMEM((2 * p.nkv8, hd), jnp.float32),       # sc_kvh
        pltpu.VMEM((p.nh8, hd), jnp.float32),            # sc_oh
        pltpu.VMEM((p.NQ, M_ROWS, 2 * p.TNQ), jnp.float32),   # sc_yq
        pltpu.VMEM((p.NO, M_ROWS, 2 * p.TNO), jnp.float32),   # sc_yo
        pltpu.VMEM((p.NGU, M_ROWS, 2 * p.TNG), jnp.float32),  # sc_yg
        pltpu.VMEM((p.ND, M_ROWS, p.TKD), jnp.float32),       # sc_act3
        pltpu.VMEM((M_ROWS, fmax), jnp.float32),         # sc_flo
        pltpu.VMEM((M_ROWS, fmax), jnp.float32),         # sc_fhi
    ]

    h_out, k_new, v_new = pl.pallas_call(
        kernel,
        grid=(L * TPL,),
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
        k_cache[:, 0], v_cache[:, 0],
    )
    return h_out[0:1, None, :], k_new, v_new


def fused_decode_step_auto(pack: FusedDecodePack, h: jax.Array,
                           cos: jax.Array, sin: jax.Array,
                           k_cache: jax.Array, v_cache: jax.Array,
                           offset: jax.Array):
    """Route to the v3 manual-DMA kernel on real TPU (the pipelined grid
    serializes DMA against compute there — see make_manual_kernel); the
    grid version remains the interpret/CPU path and the
    MLX_VLM_TPU_FUSED_V3=0 fallback."""
    if (jax.default_backend() == "tpu"
            and os.environ.get("MLX_VLM_TPU_FUSED_V3", "1")
            not in ("0", "false")):
        return fused_decode_step_manual(
            pack, h, cos, sin, k_cache, v_cache, offset)
    return fused_decode_step(pack, h, cos, sin, k_cache, v_cache, offset)
