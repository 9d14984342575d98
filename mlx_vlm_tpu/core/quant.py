"""Group-affine weight quantization (TPU-native layout).

Role parity: reference relies on `mx.quantize`/`mx.quantized_matmul`
(mlx_vlm/utils.py:657, quant_utils.py:35) with the affine scheme
``w ≈ scales * q + biases`` over groups along the input dimension.

TPU design: quantized weights live in HBM as uint8 (one or two elements per
byte), and are dequantized on the fly.  The XLA path below dequantizes into
bf16 tiles that fuse into the consuming matmul; a Pallas fused
int4-matmul kernel lives in `mlx_vlm_tpu/ops/qmatmul.py` for the hot path.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "QuantizedTensor",
    "ChannelQuantizedTensor",
    "quantize",
    "dequantize",
    "quantized_matmul",
    "to_channel_quantized",
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["q", "scales", "biases"],
    meta_fields=["bits", "group_size", "out_dtype"],
)
@dataclasses.dataclass
class QuantizedTensor:
    """A group-affine quantized 2-D (or stacked 3-D) weight.

    q:      uint8, packed along the last axis. For bits=4 two elements per
            byte (low nibble = even index); for bits=8 one element per byte.
    scales: [..., groups] in `out_dtype`
    biases: [..., groups] in `out_dtype`
    bits:   4 or 8
    group_size: elements per quantization group along the input axis
    """

    q: jax.Array
    scales: jax.Array
    biases: jax.Array
    bits: int
    group_size: int
    out_dtype: str  # dtype name, e.g. "bfloat16"

    @property
    def shape(self):
        *lead, packed = self.q.shape
        per_byte = 8 // self.bits
        return tuple(lead) + (packed * per_byte,)

    @property
    def dtype(self):
        return jnp.dtype(self.out_dtype)

    @property
    def ndim(self):
        return self.q.ndim


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["q8", "scales", "biases"],
    meta_fields=["src_bits", "out_dtype"],
)
@dataclasses.dataclass
class ChannelQuantizedTensor:
    """Per-output-channel affine int8 weight in transposed [.., K, N] layout.

    The TPU decode hot path: XLA fuses `q8.astype(bf16) * s + b` straight
    into its memory-bound matvec loop (measured at the int8 HBM roofline on
    v5e — ~1.9x bf16), which group-wise scales cannot do (the [G, g, N]
    reshape between the convert and the dot blocks the fusion and
    materializes a bf16 copy of the weights).  Group-affine checkpoints
    (mlx 4/8-bit) are requantized to this layout at load time; for 4-bit
    sources the added per-channel-int8 error is ~10x smaller than the int4
    group error already present in the checkpoint.

    q8:     int8 [.., K, N] (codes shifted by -128)
    scales: [.., 1, N] in out_dtype
    biases: [.., 1, N] in out_dtype (already includes the +128*s shift)
    """

    q8: jax.Array
    scales: jax.Array
    biases: jax.Array
    src_bits: int
    out_dtype: str

    @property
    def shape(self):
        *lead, k, n = self.q8.shape
        return tuple(lead) + (n, k)  # logical HF [out, in] view

    @property
    def dtype(self):
        return jnp.dtype(self.out_dtype)

    @property
    def ndim(self):
        return self.q8.ndim


def to_channel_quantized(t: QuantizedTensor) -> ChannelQuantizedTensor:
    """Requantize a group-affine tensor to per-channel int8 [K, N] (host).

    Exact dequant of the source followed by per-output-channel affine int8:
    q8 = round((w - min_n) / s_n) - 128, s_n = (max_n - min_n) / 255.
    """
    q = np.asarray(t.q)
    scales = np.asarray(t.scales, np.float64)
    biases = np.asarray(t.biases, np.float64)
    per_byte = 8 // t.bits
    if per_byte > 1:
        mask = (1 << t.bits) - 1
        parts = [(q >> (t.bits * j)) & mask for j in range(per_byte)]
        q = np.stack(parts, axis=-1).reshape(*q.shape[:-1], -1)
    *lead, n_in = q.shape
    g = t.group_size
    w = q.reshape(*lead, n_in // g, g).astype(np.float64)
    w = w * scales[..., None] + biases[..., None]
    w = w.reshape(*lead, n_in)  # [.., N_out, K]
    mn = w.min(axis=-1, keepdims=True)
    mx = w.max(axis=-1, keepdims=True)
    s = (mx - mn) / 255.0
    s = np.where(s == 0.0, 1.0, s)
    q8 = np.clip(np.round((w - mn) / s), 0, 255) - 128.0
    b = mn + 128.0 * s
    dt = np.dtype(t.out_dtype) if t.out_dtype != "bfloat16" else None
    axes = list(range(w.ndim))
    axes[-1], axes[-2] = axes[-2], axes[-1]

    def cast(a):
        a = np.transpose(a, axes)
        if dt is not None:
            return a.astype(dt)
        import jax.numpy as _jnp  # bfloat16 via jnp dtype on numpy

        return a.astype(_jnp.bfloat16.dtype)

    return ChannelQuantizedTensor(
        q8=q8.transpose(axes).astype(np.int8),
        scales=cast(s),
        biases=cast(b),
        src_bits=t.bits,
        out_dtype=t.out_dtype,
    )


def channel_dequantize(t: ChannelQuantizedTensor, dtype=None) -> jax.Array:
    """Dense [.., N, K] weight from the channel layout."""
    dtype = dtype or t.dtype
    w = (
        t.q8.astype(jnp.float32)
        * t.scales.astype(jnp.float32)
        + t.biases.astype(jnp.float32)
    )
    axes = list(range(w.ndim))
    axes[-1], axes[-2] = axes[-2], axes[-1]
    return jnp.transpose(w, axes).astype(dtype)


def channel_quantized_matmul(x: jax.Array, t: ChannelQuantizedTensor) -> jax.Array:
    """x [..., K] @ dequant(t).T -> [..., N] with dequant fused in-loop."""
    w = t.q8.astype(x.dtype) * t.scales.astype(x.dtype) + t.biases.astype(x.dtype)
    kdim = w.ndim - 2
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (kdim,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _check_bits(bits: int):
    if bits not in (1, 2, 4, 8):
        raise ValueError(f"Only 1/2/4/8-bit quantization supported, got {bits}")


def quantize(w: jax.Array, bits: int = 4, group_size: int = 64) -> QuantizedTensor:
    """Affine-quantize `w` along its last axis (mlx-compatible semantics).

    For each group: q = round((w - min) / scale), w ≈ scale * q + min.
    bits=1 gives the OneBitLinear layout (reference quantization/one_bit.py).
    """
    _check_bits(bits)
    *lead, n = w.shape
    if n % group_size:
        raise ValueError(f"last dim {n} not divisible by group_size {group_size}")
    out_dtype = w.dtype
    wf = w.astype(jnp.float32).reshape(*lead, n // group_size, group_size)
    wmax = wf.max(axis=-1)
    wmin = wf.min(axis=-1)
    qmax = float(2**bits - 1)
    scale = (wmax - wmin) / qmax
    scale = jnp.where(scale == 0.0, 1.0, scale)
    q = jnp.clip(jnp.round((wf - wmin[..., None]) / scale[..., None]), 0, qmax)
    q = q.astype(jnp.uint8).reshape(*lead, n)
    per_byte = 8 // bits
    if per_byte > 1:
        packed = jnp.zeros((*lead, n // per_byte), jnp.uint8)
        for j in range(per_byte):
            packed = packed | (q[..., j::per_byte] << (bits * j))
        q = packed
    return QuantizedTensor(
        q=q,
        scales=scale.astype(out_dtype),
        biases=wmin.astype(out_dtype),
        bits=bits,
        group_size=group_size,
        out_dtype=jnp.dtype(out_dtype).name,
    )


def _unpack(q: jax.Array, bits: int) -> jax.Array:
    """uint8 packed -> uint8 elements in [0, 2^bits)."""
    if bits == 8:
        return q
    per_byte = 8 // bits
    mask = (1 << bits) - 1
    parts = [(q >> (bits * j)) & mask for j in range(per_byte)]
    out = jnp.stack(parts, axis=-1)
    return out.reshape(*q.shape[:-1], q.shape[-1] * per_byte)


def dequantize(t: QuantizedTensor, dtype=None) -> jax.Array:
    dtype = dtype or t.dtype
    q = _unpack(t.q, t.bits)
    *lead, n = q.shape
    g = t.group_size
    qf = q.reshape(*lead, n // g, g).astype(jnp.float32)
    w = qf * t.scales.astype(jnp.float32)[..., None] + t.biases.astype(jnp.float32)[
        ..., None
    ]
    return w.reshape(*lead, n).astype(dtype)


def quantized_matmul(x: jax.Array, t: QuantizedTensor, transpose: bool = True) -> jax.Array:
    """x @ dequant(t).T (transpose=True, HF Linear layout) or x @ dequant(t).

    On a TPU backend, eligible 2-D int4/int8 weights route through the fused
    Pallas kernel (ops/qmatmul.py) by default — it reads the packed codes
    directly from HBM (measured 2.9x decode speedup over XLA dequant for
    4-bit Qwen2-VL-2B).  Set MLX_VLM_TPU_QMM=0 to force the XLA path.
    """
    import os

    if (
        transpose
        and t.q.ndim == 2
        and t.bits in (4, 8)
        and t.q.shape[1] % max(t.group_size, 2) == 0
        and os.environ.get("MLX_VLM_TPU_QMM", "1") not in ("0", "false")
    ):
        try:
            if jax.default_backend() == "tpu":
                from ..ops.qmatmul import quantized_matmul_pallas

                return quantized_matmul_pallas(x, t)
        except Exception:  # pragma: no cover - backend probing
            pass
    w = dequantize(t, dtype=x.dtype)
    if transpose:
        return jax.lax.dot_general(
            x, w, (((x.ndim - 1,), (w.ndim - 1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    return (x @ w).astype(x.dtype)


def from_mlx_packed(
    wq_u32: np.ndarray, scales: np.ndarray, biases: np.ndarray, bits: int, group_size: int
) -> QuantizedTensor:
    """Import an mlx affine-quantized checkpoint tensor.

    mlx packs little-endian along the input axis into uint32 words
    (8 x 4-bit or 4 x 8-bit per word).  We rebyte to our uint8 layout.
    """
    _check_bits(bits)
    u8 = wq_u32.view(np.uint8)  # little-endian byte order matches low-first packing
    # for bits=4 nibble order inside a byte is already low-first in mlx.
    return QuantizedTensor(
        q=jnp.asarray(u8),
        scales=jnp.asarray(scales),
        biases=jnp.asarray(biases),
        bits=bits,
        group_size=group_size,
        out_dtype=np.dtype(scales.dtype).name,
    )


# ------------------------------------------------------------------- NVFP4

# OCP FP4 E2M1 magnitudes (sign in bit 3): the 8 positive code values.
_E2M1_POS = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], np.float32)
_E2M1_LUT = np.concatenate([_E2M1_POS, -_E2M1_POS]).astype(np.float32)


def e4m3_decode_table() -> np.ndarray:
    """256-entry LUT: OCP E4M3FN byte -> float32 (bias 7, no infinities,
    0x7F/0xFF = NaN).  Public-format constant (reference utils.py:86)."""
    out = np.empty(256, np.float32)
    for byte in range(256):
        sign = -1.0 if byte & 0x80 else 1.0
        e = (byte >> 3) & 0xF
        m = byte & 0x7
        if e == 0:
            v = (m / 8.0) * 2.0**-6
        elif e == 15 and m == 7:
            v = np.nan
        else:
            v = (1.0 + m / 8.0) * 2.0 ** (e - 7)
        out[byte] = sign * v
    return out


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["q", "scales"],
    meta_fields=["out_dtype"],
)
@dataclasses.dataclass
class NVFP4Tensor:
    """NVFP4 weight: E2M1 codes with a float scale per group of 16.

    q:      uint8 [.., out, in/2] — two E2M1 nibbles per byte, low-first
    scales: [.., out, in/16] float16/32 — the checkpoint's per-group E4M3
            scales decoded and divided by the per-tensor global scale at
            load (reference folds the global INTO re-encoded E4M3,
            utils.py:158; we keep the fold exact by storing floats).

    Decode is a 16-entry gather + broadcast-mul — XLA fuses it into the
    consuming matmul, so HBM traffic stays at ~5 bits/weight.
    """

    q: jax.Array
    scales: jax.Array

    out_dtype: str = "bfloat16"

    @property
    def shape(self):
        *lead, o, i2 = self.q.shape
        return tuple(lead) + (o, i2 * 2)

    @property
    def dtype(self):
        return jnp.dtype(self.out_dtype)

    @property
    def ndim(self):
        return self.q.ndim


def nvfp4_dequantize(t: NVFP4Tensor, dtype=None) -> jax.Array:
    """[.., out, in] dense weight from packed E2M1 + group-16 scales."""
    dtype = dtype or t.dtype
    lo = t.q & 0xF
    hi = t.q >> 4
    codes = jnp.stack([lo, hi], axis=-1).reshape(*t.q.shape[:-1],
                                                 t.q.shape[-1] * 2)
    vals = jnp.take(jnp.asarray(_E2M1_LUT), codes.astype(jnp.int32))
    *lead, o, i = vals.shape
    vals = vals.reshape(*lead, o, i // 16, 16)
    w = vals * t.scales.astype(jnp.float32)[..., None]
    return w.reshape(*lead, o, i).astype(dtype)


def nvfp4_matmul(x: jax.Array, t: NVFP4Tensor) -> jax.Array:
    """x [..., in] @ W.T with the E2M1 decode fused into the matmul."""
    w = nvfp4_dequantize(t, dtype=x.dtype)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (w.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def from_compressed_nvfp4(
    packed: np.ndarray,       # uint8 [out, in/2]
    weight_scale: np.ndarray,  # uint8 E4M3 bytes [out, in/16]
    global_scale: np.ndarray,  # float [1]
    out_dtype: str = "bfloat16",
) -> NVFP4Tensor:
    """Import a compressed-tensors nvfp4-pack-quantized weight
    (reference _transform_compressed_tensors_nvfp4_weights, utils.py:158).

    real_w = e2m1(codes) * e4m3(weight_scale) / global_scale; the global
    scale folds into the decoded group scales exactly (stored as f16)."""
    lut = e4m3_decode_table()
    scales = lut[weight_scale.astype(np.uint32).view(np.uint8) if
                 weight_scale.dtype != np.uint8 else weight_scale]
    scales = scales / np.asarray(global_scale, np.float32).reshape(-1)[0]
    return NVFP4Tensor(
        q=jnp.asarray(np.ascontiguousarray(packed)),
        scales=jnp.asarray(scales.astype(np.float16)),
        out_dtype=out_dtype,
    )


# -------------------------------------------------- activation quantization

_ACT_QUANT = False


def set_activation_quant(enabled: bool):
    """Enable dynamic int8 activation quantization for channel-int8 weights
    (reference quantize_activations, utils.py:294 — QQLinear on Metal; on
    TPU the analogue is an int8 x int8 MXU matmul with per-row activation
    scales)."""
    global _ACT_QUANT
    _ACT_QUANT = bool(enabled)


def activation_quant_enabled() -> bool:
    import os

    return _ACT_QUANT or os.environ.get(
        "MLX_VLM_TPU_ACT_QUANT", "0") in ("1", "true")


def channel_quantized_matmul_int8(x: jax.Array,
                                  t: ChannelQuantizedTensor) -> jax.Array:
    """Dynamic-int8-activation matmul against channel-int8 weights.

    x ~= xs * xq (per-row symmetric int8); y = x @ (q8*s + b).T
      = xs * (xq @ q8) * s  +  sum(x) * b
    The xq @ q8 contraction runs int8 x int8 -> int32 on the MXU.
    """
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    xs = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    kdim = t.q8.ndim - 2
    acc = jax.lax.dot_general(
        xq, t.q8, (((x.ndim - 1,), (kdim,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    s = t.scales.astype(jnp.float32)
    b = t.biases.astype(jnp.float32)
    # scales/biases are [.., 1, N]; drop the K-axis placeholder
    s = jnp.squeeze(s, axis=kdim)
    b = jnp.squeeze(b, axis=kdim)
    y = acc * xs.astype(jnp.float32) * s
    y = y + jnp.sum(x.astype(jnp.float32), axis=-1, keepdims=True) * b
    return y.astype(x.dtype)


def quantize_activations(model):
    """Flip the runtime into int8-activation mode after validating the
    model actually carries channel-int8 weights (reference utils.py:294)."""
    found = []

    def walk(tree):
        for v in tree.values():
            if isinstance(v, dict):
                walk(v)
            elif isinstance(v, ChannelQuantizedTensor):
                found.append(v)

    walk(model.params)
    if not found:
        raise ValueError(
            "activation quantization requires channel-int8 weights "
            "(load with MLX_VLM_TPU_RUNTIME_QUANT=w8chan)")
    set_activation_quant(True)
    return model


# ----------------------------------------- grouped int4 (Pallas matvec)

@partial(
    jax.tree_util.register_dataclass,
    data_fields=["qp", "sl", "sh", "bl", "bh"],
    meta_fields=["n", "group_size", "out_dtype"],
)
@dataclasses.dataclass
class Int4GroupedTensor:
    """Group-affine int4 weight in the halves-packed decode-kernel layout.

    Codes stay BIT-EXACT from the checkpoint (unlike the w8chan requant).
    The layout is designed for ops/int4_matvec.py: nibbles never need
    lane-reordering in VMEM — the low-nibble plane covers output columns
    [0, N2p) and the high-nibble plane columns [N2p, 2*N2p), so the
    kernel dequantizes each plane in place and writes two contiguous
    column halves.  (Plain-XLA dots can't fuse sub-byte unpack on TPU —
    measured ~10x slower than w8chan — hence the dedicated kernel.)

    qp: uint8 [.., K, N2p] — byte at [k, j] holds code(col j) in the low
        nibble and code(col N2p + j) in the high nibble; columns >= N are
        zero padding (N2p = padded half-width, lane-tile aligned)
    sl/sh: [.., G, 1, N2p] f32 — per-(K-group, column) scales for the
        low/high planes; bl/bh the matching affine biases
    n: logical output-feature count N; group_size: along K
    """

    qp: jax.Array
    sl: jax.Array
    sh: jax.Array
    bl: jax.Array
    bh: jax.Array
    n: int = 0
    group_size: int = 64
    out_dtype: str = "bfloat16"

    @property
    def shape(self):
        *lead, K, _ = self.qp.shape
        return tuple(lead) + (self.n, K)  # logical HF [out, in]

    @property
    def dtype(self):
        return jnp.dtype(self.out_dtype)

    @property
    def ndim(self):
        return self.qp.ndim  # logical [out, in] rank bookkeeping


def _int4_half_width(N: int) -> int:
    """Padded half-width: lane-tile (128) aligned.

    128 alignment only — coarser (512) alignment wasted up to 14% of
    packed bytes on shapes like 3584 (half 1792 -> 2048), and at the HBM
    roofline every padded byte is decode latency.  Kernels pick the
    largest column tile that divides the 128-aligned width instead."""
    half = (N + 1) // 2
    return ((half + 127) // 128) * 128


def to_int4_grouped(t: QuantizedTensor) -> Int4GroupedTensor:
    """Bit-exact host repack of an mlx-affine 4-bit tensor [N, K]."""
    if t.bits != 4:
        raise ValueError("Int4GroupedTensor requires a 4-bit source")
    q = np.asarray(t.q)
    N, K2 = q.shape
    codes = np.empty((N, K2 * 2), np.uint8)
    codes[:, 0::2] = q & 0xF
    codes[:, 1::2] = q >> 4
    K = K2 * 2
    g = t.group_size
    G = K // g
    n2p = _int4_half_width(N)
    ct = codes.T  # [K, N] unsigned codes
    cp = np.zeros((K, 2 * n2p), np.uint8)
    cp[:, :N] = ct
    qp = (cp[:, :n2p] | (cp[:, n2p:] << 4)).astype(np.uint8)
    s = np.zeros((N_p := 2 * n2p, G), np.float32)
    b = np.zeros((N_p, G), np.float32)
    s[:N] = np.asarray(t.scales, np.float32)
    b[:N] = np.asarray(t.biases, np.float32)
    s = s.T.reshape(G, 1, N_p)
    b = b.T.reshape(G, 1, N_p)
    # stays HOST-side (numpy): the loader transfers after layer stacking,
    # and the fused-decode pack relayout also runs on host (loader.py)
    return Int4GroupedTensor(
        qp=qp,
        sl=np.ascontiguousarray(s[..., :n2p]),
        sh=np.ascontiguousarray(s[..., n2p:]),
        bl=np.ascontiguousarray(b[..., :n2p]),
        bh=np.ascontiguousarray(b[..., n2p:]),
        n=N,
        group_size=g,
        out_dtype=t.out_dtype,
    )


def int4_grouped_dequantize(t: Int4GroupedTensor, dtype=None) -> jax.Array:
    """Dense [N, K] weight (prefill / export / fallback paths)."""
    dtype = dtype or t.dtype
    K, n2p = t.qp.shape
    G = t.sl.shape[0]
    g = K // G
    qi = t.qp.astype(jnp.int32)
    lo = (qi & 0xF).astype(jnp.float32).reshape(G, g, n2p)
    hi = (qi >> 4).astype(jnp.float32).reshape(G, g, n2p)
    w = jnp.concatenate([lo * t.sl + t.bl, hi * t.sh + t.bh], axis=-1)
    return w.reshape(K, 2 * n2p)[:, : t.n].T.astype(dtype)


def int4_grouped_matmul(x: jax.Array, t: Int4GroupedTensor) -> jax.Array:
    """x [..., K] @ dequant(t).T -> [..., N].

    XLA fallback (dequant materializes, fine for compute-bound prefill);
    the decode hot path goes through ops/int4_matvec.py instead.
    """
    w = int4_grouped_dequantize(t, x.dtype)  # [N, K]
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
