"""KV caches — fixed-capacity, index-written, jit-stable.

Role parity: reference `mlx_vlm/models/cache.py` (KVCache:288,
RotatingKVCache:373, BatchKVCache:875, QuantizedKVCache:184, ...).  The
reference grows caches by concatenation in 256-token steps — hostile to XLA.

TPU design: a cache is a pytree of **preallocated** buffers written with
`lax.dynamic_update_slice`, so every decode step compiles once and reuses the
same program.  Layers are stacked on a leading axis so the whole model's KV
state is two HBM buffers scanned by `lax.scan`.

Batching follows the reference's left-padding semantics (BatchKVCache
cache.py:875): rows are right-aligned so all rows share one write cursor
(`offset`), and per-row `left_pad` masks out the unused prefix.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "KVCache",
    "BatchKVCache",
    "init_cache",
    "init_batch_cache",
    "update_layer",
    "update_layer_rows",
    "insert_row",
    "RotatingKVCache",
]

import os


def _flash_tile(S: int) -> int:
    for t in (128, 64, 32, 16, 8):
        if S % t == 0:
            return t
    return 0


def _flash_eligible(q, k_buf) -> bool:
    """Static routing decision for the v2 (KV-tiled online-softmax) kernel.

    Measured on v5e (tools/bench_fa, B=1 H=12 KVH=2 D=128): flash beats the
    XLA score-materializing path ~2.2x once the HBM score tensor dominates
    (C >= ~8k with prefill-sized S); below that XLA's fused softmax wins.
    Default ON in its winning region; MLX_VLM_TPU_FLASH=0 disables, =1
    forces (any eligible shape).
    """
    env = os.environ.get("MLX_VLM_TPU_FLASH", "auto")
    if env in ("0", "false"):
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    B, H, S, D = q.shape
    C = k_buf.shape[2]
    if S < 64 or _flash_tile(S) == 0 or (C % 128 and C > 128):
        return False
    if env in ("1", "true"):
        return True
    return S >= 256 and C >= 8192


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "offset", "left_pad"],
    meta_fields=[],
)
@dataclasses.dataclass
class KVCache:
    """All-layer KV cache.

    k, v:      [L, B, n_kv_heads, capacity, head_dim]
    offset:    int32 scalar — shared write cursor (tokens written so far)
    left_pad:  int32 [B] — per-row count of invalid leading positions
    """

    k: jax.Array
    v: jax.Array
    offset: jax.Array
    left_pad: jax.Array

    @property
    def capacity(self) -> int:
        return self.k.shape[3]

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]

    # --- scan plumbing: per-layer arrays threaded through lax.scan ---------
    def scan_arrays(self):
        return (self.k, self.v)

    def with_arrays(self, ys, new_tokens: int):
        k, v = ys
        return type(self)(
            k=k, v=v, offset=self.offset + new_tokens, left_pad=self.left_pad
        )

    def attend(self, cxs, q, k, v, scale, mask, flash_ok: bool = True,
               window=None, logit_softcap=None, sinks=None):
        """Write new k/v into this layer's buffers and attend.

        Prefill chunks (S large enough) route through the Pallas fused
        kernel when eligible; decode and odd shapes use the XLA SDPA with
        the provided mask."""
        from ..ops.attention import sdpa
        from ..parallel.ring import maybe_ring_attend

        k_buf, v_buf = cxs
        k_buf, v_buf = update_layer_auto(k_buf, v_buf, k, v, self.offset)
        ring_out = maybe_ring_attend(
            q, k, v, scale, offset=self.offset, left_pad=self.left_pad,
            window=window, logit_softcap=logit_softcap, sinks=sinks,
        )
        if ring_out is not None:
            return ring_out, (k_buf, v_buf)
        if flash_ok and logit_softcap is None and sinks is None \
                and _flash_eligible(q, k_buf):
            from ..ops.flash_attention import flash_attention

            B = q.shape[0]
            off = self.offset
            if off.ndim == 0:
                off = jnp.broadcast_to(off[None], (B,))
            out = flash_attention(
                q, k_buf, v_buf, off, self.left_pad, scale, window=window,
            )
        else:
            out = sdpa(q, k_buf, v_buf, scale, mask,
                       logit_softcap=logit_softcap, sinks=sinks)
        return out, (k_buf, v_buf)


def init_cache(
    num_layers: int,
    batch_size: int,
    num_kv_heads: int,
    head_dim: int,
    capacity: int,
    dtype=jnp.bfloat16,
    left_pad: Optional[jax.Array] = None,
) -> KVCache:
    shape = (num_layers, batch_size, num_kv_heads, capacity, head_dim)
    if left_pad is None:
        left_pad = jnp.zeros((batch_size,), jnp.int32)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        offset=jnp.zeros((), jnp.int32),
        left_pad=left_pad,
    )


def update_layer(
    k_cache: jax.Array,  # [B, H, C, D] — one layer's K buffer
    v_cache: jax.Array,
    k_new: jax.Array,  # [B, H, S, D]
    v_new: jax.Array,
    offset: jax.Array,  # int32 scalar
):
    """Write S new tokens at `offset` for every row; returns updated buffers."""
    zero = jnp.zeros((), jnp.int32)
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k_new.astype(k_cache.dtype), (zero, zero, offset, zero)
    )
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, v_new.astype(v_cache.dtype), (zero, zero, offset, zero)
    )
    return k_cache, v_cache


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "offset", "left_pad"],
    meta_fields=[],
)
@dataclasses.dataclass
class BatchKVCache:
    """Continuous-batching cache: independent per-row write cursors.

    Role parity: reference cache.py:875 (BatchKVCache).  Rows live in fixed
    slots; `offset[b]` counts valid tokens of row b; rows are recycled by
    `insert_row` without touching the others — no recompiles on
    insert/remove (SURVEY.md §7.6 "fixed batch slots").

    k, v:    [L, B, n_kv_heads, capacity, head_dim]
    offset:  int32 [B]
    left_pad:int32 [B]  (always 0 in slot mode; kept for mask parity)
    """

    k: jax.Array
    v: jax.Array
    offset: jax.Array
    left_pad: jax.Array

    @property
    def capacity(self) -> int:
        return self.k.shape[3]

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]

    scan_arrays = KVCache.scan_arrays
    with_arrays = KVCache.with_arrays
    attend = KVCache.attend


def init_batch_cache(
    num_layers: int,
    batch_size: int,
    num_kv_heads: int,
    head_dim: int,
    capacity: int,
    dtype=jnp.bfloat16,
) -> BatchKVCache:
    shape = (num_layers, batch_size, num_kv_heads, capacity, head_dim)
    return BatchKVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        offset=jnp.zeros((batch_size,), jnp.int32),
        left_pad=jnp.zeros((batch_size,), jnp.int32),
    )


def update_layer_rows(
    k_cache: jax.Array,  # [B, H, C, D]
    v_cache: jax.Array,
    k_new: jax.Array,  # [B, H, S, D]
    v_new: jax.Array,
    offsets: jax.Array,  # int32 [B] per-row write positions
):
    """Per-row dynamic writes (vmapped dynamic_update_slice)."""
    zero = jnp.zeros((), jnp.int32)

    def write(kc, vc, kn, vn, off):
        kc = jax.lax.dynamic_update_slice(kc, kn.astype(kc.dtype), (zero, off, zero))
        vc = jax.lax.dynamic_update_slice(vc, vn.astype(vc.dtype), (zero, off, zero))
        return kc, vc

    return jax.vmap(write)(k_cache, v_cache, k_new, v_new, offsets)


def update_layer_auto(k_cache, v_cache, k_new, v_new, offset):
    """Dispatch on cursor shape: scalar (KVCache) vs per-row (BatchKVCache)."""
    if offset.ndim == 1:
        return update_layer_rows(k_cache, v_cache, k_new, v_new, offset)
    return update_layer(k_cache, v_cache, k_new, v_new, offset)


def insert_row(
    batch,
    row,  # prefilled source cache of the SAME cache class (1+ rows)
    slot: jax.Array,  # int32 scalar
    prompt_len: jax.Array,  # int32 scalar (valid tokens in `row`)
    src_row: int = 0,
):
    """Copy one prefilled row into batch slot `slot` (reference
    BatchGenerator.insert ar.py:2494).  Works for any cache class exposing
    scan_arrays()/with_arrays() with [L,B,H,C,...] buffers; `src_row`
    selects the row of a multi-row (batched-prefill) source."""
    zero = jnp.zeros((), jnp.int32)
    outs = []
    for b_buf, r_buf in zip(batch.scan_arrays(), row.scan_arrays()):
        cp = min(r_buf.shape[3], b_buf.shape[3])
        src = r_buf[:, src_row : src_row + 1, :, :cp]
        # rank-generic (Int8KVCache mixes rank-5 codes with rank-4 scales)
        starts = (zero, slot) + (zero,) * (b_buf.ndim - 2)
        outs.append(
            jax.lax.dynamic_update_slice(b_buf, src.astype(b_buf.dtype), starts)
        )
    new = batch.with_arrays(tuple(outs), 0)
    return dataclasses.replace(
        new,
        offset=batch.offset.at[slot].set(prompt_len),
        left_pad=batch.left_pad.at[slot].set(0),
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["kq", "ks", "kb", "vq", "vs", "vb", "offset", "left_pad"],
    meta_fields=["bits", "group_size"],
)
@dataclasses.dataclass
class QuantizedKVCache:
    """Group-affine quantized KV cache (4- or 8-bit along head_dim).

    Role parity: reference cache.py:184 (QuantizedKVCache) /
    :1646 (BatchQuantizedKVCache) built on mx.quantize.

    kq, vq:  uint8 [L, B, H, C, D * bits / 8]  (packed codes)
    ks/kb, vs/vb: [L, B, H, C, D/group] scale / bias (bf16)
    offset:  scalar (single-stream) or [B] (batch slots)

    The XLA path halves/quarters KV *capacity* cost; the fused Pallas
    decode-attention kernel (ops/) removes the dequantize bandwidth too.
    """

    kq: jax.Array
    ks: jax.Array
    kb: jax.Array
    vq: jax.Array
    vs: jax.Array
    vb: jax.Array
    offset: jax.Array
    left_pad: jax.Array
    bits: int
    group_size: int

    @property
    def capacity(self) -> int:
        return self.kq.shape[3]

    @property
    def num_layers(self) -> int:
        return self.kq.shape[0]

    @property
    def batch_size(self) -> int:
        return self.kq.shape[1]

    def scan_arrays(self):
        return (self.kq, self.ks, self.kb, self.vq, self.vs, self.vb)

    def with_arrays(self, ys, new_tokens: int):
        kq, ks, kb, vq, vs, vb = ys
        return dataclasses.replace(
            self, kq=kq, ks=ks, kb=kb, vq=vq, vs=vs, vb=vb,
            offset=self.offset + new_tokens,
        )

    def _quantize(self, x: jax.Array):
        """[B,H,S,D] -> (codes uint8 [B,H,S,D*bits/8], scales, biases)."""
        from .quant import quantize

        t = quantize(x, bits=self.bits, group_size=self.group_size)
        return t.q, t.scales, t.biases

    def _dequantize(self, q, s, b, dtype):
        from .quant import QuantizedTensor, dequantize

        t = QuantizedTensor(
            q=q, scales=s, biases=b, bits=self.bits,
            group_size=self.group_size, out_dtype=jnp.dtype(dtype).name,
        )
        return dequantize(t, dtype)

    def attend(self, cxs, q, k, v, scale, mask, flash_ok: bool = False,
               window=None, logit_softcap=None, sinks=None):
        """Same kwargs as KVCache.attend so softcap/window/sink families
        (gemma3, glm4v, gpt_oss, ...) can run with kv_bits set;
        logit_softcap is threaded to sdpa (ignoring it would silently
        change logits). `window` is already encoded in `mask` by the
        caller; `flash_ok` has no fused quantized path yet and is accepted
        for parity."""
        from ..ops.attention import sdpa

        kq, ks, kb, vq, vs, vb = cxs
        knq, kns, knb = self._quantize(k)
        vnq, vns, vnb = self._quantize(v)
        off = self.offset
        kq, vq_ = update_layer_auto(kq, vq, knq, vnq, off)
        ks, vs_ = update_layer_auto(ks, vs, kns, vns, off)
        kb, vb_ = update_layer_auto(kb, vb, knb, vnb, off)
        dtype = q.dtype
        k_full = self._dequantize(kq, ks, kb, dtype)
        v_full = self._dequantize(vq_, vs_, vb_, dtype)
        out = sdpa(q, k_full, v_full, scale, mask,
                   logit_softcap=logit_softcap, sinks=sinks)
        return out, (kq, ks, kb, vq_, vs_, vb_)


def init_quantized_cache(
    num_layers: int,
    batch_size: int,
    num_kv_heads: int,
    head_dim: int,
    capacity: int,
    dtype=jnp.bfloat16,
    bits: int = 8,
    group_size: int = 64,
    left_pad: Optional[jax.Array] = None,
    per_row: bool = False,
) -> QuantizedKVCache:
    packed = head_dim * bits // 8
    groups = head_dim // group_size
    base = (num_layers, batch_size, num_kv_heads, capacity)
    if left_pad is None:
        left_pad = jnp.zeros((batch_size,), jnp.int32)
    offset = (
        jnp.zeros((batch_size,), jnp.int32) if per_row else jnp.zeros((), jnp.int32)
    )
    return QuantizedKVCache(
        kq=jnp.zeros(base + (packed,), jnp.uint8),
        ks=jnp.zeros(base + (groups,), dtype),
        kb=jnp.zeros(base + (groups,), dtype),
        vq=jnp.zeros(base + (packed,), jnp.uint8),
        vs=jnp.zeros(base + (groups,), dtype),
        vb=jnp.zeros(base + (groups,), dtype),
        offset=offset,
        left_pad=left_pad,
        bits=bits,
        group_size=group_size,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "offset", "left_pad"],
    meta_fields=["window"],
)
@dataclasses.dataclass
class RotatingKVCache:
    """Sliding-window ring cache — reference cache.py:373 (RotatingKVCache).

    Buffer capacity = window + chunk margin: writes land at absolute position
    mod capacity, so a token written during a multi-token call can only
    displace a token already outside every current query's window (the
    margin must be >= the largest prefill chunk).  Memory is O(window)
    instead of O(total context) for sliding-window layers (gemma3 local
    layers, mistral etc.).

    Slot j after writing up to absolute position P holds
        pos_j = j + C * floor((P - j) / C)
    (negative for never-written slots); `ring_mask` keeps
    left_pad <= pos_j <= qpos and pos_j > qpos - window.
    """

    k: jax.Array  # [L, B, H, C, D]
    v: jax.Array
    offset: jax.Array  # scalar int32: tokens written so far
    left_pad: jax.Array  # [B]
    window: int

    @property
    def capacity(self) -> int:
        return self.k.shape[3]

    def scan_arrays(self):
        return (self.k, self.v)

    def with_arrays(self, ys, new_tokens: int):
        k, v = ys
        return dataclasses.replace(
            self, k=k, v=v, offset=self.offset + new_tokens
        )

    def ring_mask(self, q_len: int) -> jax.Array:
        """bool [B, 1, q_len, capacity] for queries at offset..offset+q_len-1."""
        C = self.capacity
        S = q_len
        o = self.offset
        j = jnp.arange(C, dtype=jnp.int32)[None, None, None, :]
        i = jnp.arange(S, dtype=jnp.int32)[None, None, :, None]
        last = o + S - 1
        pos_j = j + C * ((last - j) // C)  # newest abs pos in slot j
        qpos = o + i
        keep = (pos_j <= qpos) & (pos_j > qpos - self.window)
        keep &= pos_j >= self.left_pad[:, None, None, None]
        return keep

    def attend(self, cxs, q, k, v, scale, mask=None, flash_ok=False,
               window=None, logit_softcap=None, sinks=None):
        """Ring-write new k/v and attend with the ring mask."""
        from ..ops.attention import sdpa

        k_buf, v_buf = cxs
        C = self.capacity
        S = k.shape[2]
        idx = (self.offset + jnp.arange(S, dtype=jnp.int32)) % C
        k_buf = k_buf.at[:, :, idx].set(k.astype(k_buf.dtype))
        v_buf = v_buf.at[:, :, idx].set(v.astype(v_buf.dtype))
        if mask is None:
            mask = self.ring_mask(S)
        out = sdpa(q, k_buf, v_buf, scale, mask,
                   logit_softcap=logit_softcap, sinks=sinks)
        return out, (k_buf, v_buf)


def init_rotating_cache(
    num_layers: int,
    batch_size: int,
    num_kv_heads: int,
    head_dim: int,
    window: int,
    dtype=jnp.bfloat16,
    chunk_margin: int = 512,
    left_pad: Optional[jax.Array] = None,
) -> RotatingKVCache:
    """Ring cache with capacity window + chunk_margin (see class docstring);
    chunk_margin must cover the largest single write (prefill step size)."""
    cap = window + chunk_margin
    if left_pad is None:
        left_pad = jnp.zeros((batch_size,), jnp.int32)
    shape = (num_layers, batch_size, num_kv_heads, cap, head_dim)
    return RotatingKVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        offset=jnp.zeros((), jnp.int32),
        left_pad=left_pad,
        window=window,
    )


def ring_slot_mask(offset, left_pad, q_len: int, capacity: int, window: int):
    """bool [B, 1, q_len, capacity] for a ring buffer written up to
    offset+q_len-1: slot j holds the newest absolute position congruent to
    j mod capacity (reference RotatingKVCache mask semantics cache.py:373)."""
    C = capacity
    j = jnp.arange(C, dtype=jnp.int32)[None, None, None, :]
    i = jnp.arange(q_len, dtype=jnp.int32)[None, None, :, None]
    last = offset + q_len - 1
    pos_j = j + C * ((last - j) // C)
    qpos = offset + i
    keep = (pos_j <= qpos) & (pos_j > qpos - window)
    keep &= pos_j >= left_pad[:, None, None, None]
    return keep


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k_g", "v_g", "k_l", "v_l", "offset", "left_pad"],
    meta_fields=["window"],
)
@dataclasses.dataclass
class MixedWindowCache:
    """Heterogeneous cache for interleaved global/sliding-window layers
    (gemma3 pattern): global layers keep full [C] buffers, local layers an
    O(window) ring — reference make_cache with RotatingKVCache for local
    layers (cache.py:45 + :373).  Memory: Lg*C + Ll*(window+margin) instead
    of L*C.

    The owning language model drives it as a scan CARRY (the two buffer
    stacks have different capacities, so they cannot be scan xs); per-layer
    slices are read/written with dynamic_index ops at traced slot ids.
    """

    k_g: jax.Array  # [Lg, B, H, C, D]
    v_g: jax.Array
    k_l: jax.Array  # [Ll, B, H, window+margin, D]
    v_l: jax.Array
    offset: jax.Array
    left_pad: jax.Array
    window: int

    @property
    def capacity(self) -> int:
        return self.k_g.shape[3]

    @property
    def ring_capacity(self) -> int:
        return self.k_l.shape[3]

    @property
    def batch_size(self) -> int:
        return self.k_g.shape[1]


def init_mixed_window_cache(
    is_global,  # sequence of per-layer bools
    batch_size: int,
    num_kv_heads: int,
    head_dim: int,
    capacity: int,
    window: int,
    dtype=jnp.bfloat16,
    chunk_margin: int = 512,
    left_pad: Optional[jax.Array] = None,
) -> MixedWindowCache:
    n_g = int(sum(bool(g) for g in is_global))
    n_l = len(list(is_global)) - n_g
    cw = window + chunk_margin
    if left_pad is None:
        left_pad = jnp.zeros((batch_size,), jnp.int32)
    return MixedWindowCache(
        k_g=jnp.zeros((n_g, batch_size, num_kv_heads, capacity, head_dim), dtype),
        v_g=jnp.zeros((n_g, batch_size, num_kv_heads, capacity, head_dim), dtype),
        k_l=jnp.zeros((n_l, batch_size, num_kv_heads, cw, head_dim), dtype),
        v_l=jnp.zeros((n_l, batch_size, num_kv_heads, cw, head_dim), dtype),
        offset=jnp.zeros((), jnp.int32),
        left_pad=left_pad,
        window=window,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k8", "ks", "kb", "v8", "vs", "vb", "offset", "left_pad"],
    meta_fields=[],
)
@dataclasses.dataclass
class Int8KVCache:
    """Per-token-scale int8 KV cache with a fused integer-domain attend.

    Role parity: reference QuantizedKVCache (cache.py:184) + the TurboQuant
    goal of attention math on packed codes without a dequantized KV copy
    (turboquant.py fused decode kernels, SURVEY §2.6/2.9).

    TPU design: group-broadcast dequant (the 8/4-bit group-affine layout)
    cannot fuse into XLA's attention matmuls — the [.., C, D/g] -> [.., C, D]
    reshape materializes a bf16 KV copy in HBM every step, which is why the
    group-affine cache is a capacity feature but a bandwidth LOSS.  With ONE
    affine scale per (b, h, token) the scale factors out of the d-reduction:

        q . k_c = qs * ( s_c * (q8 . k8_c) + b_c * sum(q8) )

    so scores run on the int8 MXU over raw codes (zero per-element VPU
    work), and the value side folds its scale into the probabilities
    (p' = p * vs_c) with only the code->bf16 convert fused into the matmul.
    Measured on v5e this turns 8-bit KV decode attention from ~4x off its
    bandwidth roofline into ~roofline (faster than bf16 KV from ~8k ctx).

    k8, v8: int8 [L, B, H, C, D] (codes, shifted by -128)
    ks/kb, vs/vb: f32 [L, B, H, C] per-token scale / bias
    """

    k8: jax.Array
    ks: jax.Array
    kb: jax.Array
    v8: jax.Array
    vs: jax.Array
    vb: jax.Array
    offset: jax.Array
    left_pad: jax.Array

    @property
    def capacity(self) -> int:
        return self.k8.shape[3]

    @property
    def num_layers(self) -> int:
        return self.k8.shape[0]

    @property
    def batch_size(self) -> int:
        return self.k8.shape[1]

    def scan_arrays(self):
        return (self.k8, self.ks, self.kb, self.v8, self.vs, self.vb)

    def with_arrays(self, ys, new_tokens: int):
        k8, ks, kb, v8, vs, vb = ys
        return dataclasses.replace(
            self, k8=k8, ks=ks, kb=kb, v8=v8, vs=vs, vb=vb,
            offset=self.offset + new_tokens,
        )

    @staticmethod
    def _quantize_tokens(x: jax.Array):
        """[B,H,S,D] -> (int8 codes, scale [B,H,S], bias [B,H,S])."""
        xf = x.astype(jnp.float32)
        mn = xf.min(axis=-1)
        mx = xf.max(axis=-1)
        s = (mx - mn) / 255.0
        s = jnp.where(s == 0.0, 1.0, s)
        q = jnp.clip(jnp.round((xf - mn[..., None]) / s[..., None]), 0, 255)
        return (q - 128.0).astype(jnp.int8), s, mn + 128.0 * s

    def attend(self, cxs, q, k, v, scale, mask, flash_ok: bool = False,
               window=None, logit_softcap=None, sinks=None):
        k8, ks, kb, v8, vs, vb = cxs
        kn8, kns, knb = self._quantize_tokens(k)
        vn8, vns, vnb = self._quantize_tokens(v)
        off = self.offset
        k8, v8 = update_layer_auto(k8, v8, kn8, vn8, off)
        ks, vs = _update_scalar_auto(ks, vs, kns, vns, off)
        kb, vb = _update_scalar_auto(kb, vb, knb, vnb, off)

        B, nh, S, D = q.shape
        nkv = k8.shape[1]
        g = nh // nkv
        # symmetric per-(b,h,s) int8 activation quant for the score matmul
        qf = q.astype(jnp.float32)
        qs = jnp.max(jnp.abs(qf), axis=-1) / 127.0
        qs = jnp.where(qs == 0.0, 1.0, qs)
        q8 = jnp.round(qf / qs[..., None]).astype(jnp.int8)
        qsum = q8.astype(jnp.int32).sum(axis=-1)  # [B,nh,S]

        q8g = q8.reshape(B, nkv, g, S, D)
        iscores = jnp.einsum(
            "bkgsd,bktd->bkgst", q8g, k8, preferred_element_type=jnp.int32
        )  # [B,nkv,g,S,C]
        ksb = ks[:, :, None, None, :]  # [B,nkv,1,1,C]
        kbb = kb[:, :, None, None, :]
        qsg = qs.reshape(B, nkv, g, S, 1)
        qsumg = qsum.reshape(B, nkv, g, S, 1).astype(jnp.float32)
        scores = (
            (iscores.astype(jnp.float32) * ksb + qsumg * kbb)
            * qsg * jnp.float32(scale)
        )
        if logit_softcap is not None:
            scores = jnp.tanh(scores / logit_softcap) * logit_softcap
        if mask is not None:
            m = mask
            if m.ndim == 4:
                mh = m.shape[1]
                m = (
                    m.reshape(B, nkv, g, S, -1)
                    if mh == nh
                    else m[:, :, None, :, :]
                )
            scores = jnp.where(m, scores, jnp.float32(jnp.finfo(jnp.float32).min))
        if sinks is not None:
            # per-head sink logit in the denominator, mass dropped (gpt_oss)
            col = jnp.broadcast_to(
                sinks.astype(jnp.float32).reshape(1, nkv, g, 1, 1),
                (B, nkv, g, S, 1),
            )
            p = jax.nn.softmax(
                jnp.concatenate([scores, col], axis=-1), axis=-1
            )[..., :-1]
        else:
            p = jax.nn.softmax(scores, axis=-1)  # [B,nkv,g,S,C] f32
        pv = p * vs[:, :, None, None, :]  # fold V scale into probabilities
        out = jnp.einsum(
            "bkgst,bktd->bkgsd", pv.astype(q.dtype), v8.astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
        bias_term = jnp.einsum(
            "bkgst,bkt->bkgs", p, vb, preferred_element_type=jnp.float32
        )
        out = out + bias_term[..., None].astype(out.dtype)
        out = out.reshape(B, nh, S, D).astype(q.dtype)
        return out, (k8, ks, kb, v8, vs, vb)


def _update_scalar_auto(a_cache, b_cache, a_new, b_new, offset):
    """Write per-token scalars [B,H,S] at `offset` into [B,H,C] buffers."""
    zero = jnp.zeros((), jnp.int32)
    if offset.ndim == 1:
        def write(ac, bc, an, bn, off):
            ac = jax.lax.dynamic_update_slice(ac, an.astype(ac.dtype), (zero, off))
            bc = jax.lax.dynamic_update_slice(bc, bn.astype(bc.dtype), (zero, off))
            return ac, bc

        return jax.vmap(write)(a_cache, b_cache, a_new, b_new, offset)
    a_cache = jax.lax.dynamic_update_slice(
        a_cache, a_new.astype(a_cache.dtype), (zero, zero, offset)
    )
    b_cache = jax.lax.dynamic_update_slice(
        b_cache, b_new.astype(b_cache.dtype), (zero, zero, offset)
    )
    return a_cache, b_cache


def init_int8_cache(
    num_layers: int,
    batch_size: int,
    num_kv_heads: int,
    head_dim: int,
    capacity: int,
    left_pad: Optional[jax.Array] = None,
    per_row: bool = False,
) -> Int8KVCache:
    base = (num_layers, batch_size, num_kv_heads, capacity)
    if left_pad is None:
        left_pad = jnp.zeros((batch_size,), jnp.int32)
    offset = (
        jnp.zeros((batch_size,), jnp.int32) if per_row else jnp.zeros((), jnp.int32)
    )
    return Int8KVCache(
        k8=jnp.zeros((*base, head_dim), jnp.int8),
        ks=jnp.zeros(base, jnp.float32),
        kb=jnp.zeros(base, jnp.float32),
        v8=jnp.zeros((*base, head_dim), jnp.int8),
        vs=jnp.zeros(base, jnp.float32),
        vb=jnp.zeros(base, jnp.float32),
        offset=offset,
        left_pad=left_pad,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k4", "ks", "kb", "v4", "vs", "vb", "offset", "left_pad"],
    meta_fields=[],
)
@dataclasses.dataclass
class Int4KVCache:
    """Per-token-scale 4-bit KV cache with a fused packed-domain attend.

    Role parity: reference turboquant.py fully-fused 4-bit decode
    (:2021) — kv_bits=4 halves the bytes READ per decode step, not just
    the bytes stored (the group-affine QuantizedKVCache dequantizes the
    whole cache per step).

    Codes pack along the head dim in two half planes (channels [0,D/2)
    low nibble, [D/2,D) high nibble — no lane reorder on unpack):

    k4, v4: u8 [L, B, H, C, D/2]
    ks/kb, vs/vb: f32 [L, B, H, C]  per-token scale / bias (dequant =
    code * s + b, codes 0..15)

    Single-stream decode (S==1, scalar offset) runs the Pallas online-
    softmax kernel (ops/int4_kv_attention.py) straight on packed codes;
    everything else takes the XLA integer-domain path (same math as
    Int8KVCache with the unpack materialized — correct, prefill-bound).
    """

    k4: jax.Array
    ks: jax.Array
    kb: jax.Array
    v4: jax.Array
    vs: jax.Array
    vb: jax.Array
    offset: jax.Array
    left_pad: jax.Array

    @property
    def capacity(self) -> int:
        return self.k4.shape[3]

    @property
    def num_layers(self) -> int:
        return self.k4.shape[0]

    @property
    def batch_size(self) -> int:
        return self.k4.shape[1]

    def scan_arrays(self):
        return (self.k4, self.ks, self.kb, self.v4, self.vs, self.vb)

    def with_arrays(self, ys, new_tokens: int):
        k4, ks, kb, v4, vs, vb = ys
        return dataclasses.replace(
            self, k4=k4, ks=ks, kb=kb, v4=v4, vs=vs, vb=vb,
            offset=self.offset + new_tokens,
        )

    @staticmethod
    def _quantize_tokens(x: jax.Array):
        """[B,H,S,D] -> (packed u8 [B,H,S,D/2], scale [B,H,S], bias)."""
        xf = x.astype(jnp.float32)
        mn = xf.min(axis=-1)
        mx = xf.max(axis=-1)
        s = (mx - mn) / 15.0
        s = jnp.where(s == 0.0, 1.0, s)
        q = jnp.clip(jnp.round((xf - mn[..., None]) / s[..., None]), 0, 15)
        q = q.astype(jnp.uint8)
        h = x.shape[-1] // 2
        packed = q[..., :h] | (q[..., h:] << 4)
        return packed, s, mn

    @staticmethod
    def _unpack(p4: jax.Array):
        """u8 [..., D/2] -> int8 codes [..., D] (half-plane order)."""
        lo = (p4 & 0xF).astype(jnp.int8)
        hi = (p4 >> 4).astype(jnp.int8)
        return jnp.concatenate([lo, hi], axis=-1)

    def attend(self, cxs, q, k, v, scale, mask, flash_ok: bool = False,
               window=None, logit_softcap=None, sinks=None):
        k4, ks, kb, v4, vs, vb = cxs
        kn4, kns, knb = self._quantize_tokens(k)
        vn4, vns, vnb = self._quantize_tokens(v)
        off = self.offset
        k4, v4 = update_layer_auto(k4, v4, kn4, vn4, off)
        ks, vs = _update_scalar_auto(ks, vs, kns, vns, off)
        kb, vb = _update_scalar_auto(kb, vb, knb, vnb, off)

        B, nh, S, D = q.shape
        nkv = k4.shape[1]
        g = nh // nkv
        qf = q.astype(jnp.float32)
        qs = jnp.max(jnp.abs(qf), axis=-1) / 127.0
        qs = jnp.where(qs == 0.0, 1.0, qs)
        q8 = jnp.round(qf / qs[..., None]).astype(jnp.int8)
        qsum = q8.astype(jnp.int32).sum(axis=-1).astype(jnp.float32)

        fused_ok = (
            S == 1 and g * S <= 8
            and window is None and logit_softcap is None and sinks is None
            and D % 2 == 0 and (D // 2) % 128 == 0
            and k4.shape[3] % 128 == 0
        )
        if fused_ok:
            from ..ops.int4_kv_attention import (
                M_ROWS,
                int4_kv_decode_attention,
            )

            BH = B * nkv
            q8r = q8.reshape(B, nkv, g, D).reshape(BH, g, D)
            pad = M_ROWS - g
            q8p = jnp.pad(q8r, ((0, 0), (0, pad), (0, 0)))
            meta = jnp.stack(
                [qsum.reshape(BH, g), qs.reshape(BH, g)], axis=-1)
            meta = jnp.pad(meta, ((0, 0), (0, pad), (0, 0)),
                           constant_values=1.0)
            lp = jnp.broadcast_to(
                self.left_pad[:, None], (B, nkv)).reshape(BH)
            # per-row cursors (continuous batching) expand to [B*H]; the
            # kernel masks each row to its own lp <= pos < off+1 window
            offs = (off + S if off.ndim == 0
                    else jnp.broadcast_to(
                        (off + S)[:, None], (B, nkv)).reshape(BH))
            out = int4_kv_decode_attention(
                q8p, meta.astype(jnp.float32),
                k4.reshape(BH, -1, D // 2), ks.reshape(BH, -1),
                kb.reshape(BH, -1), v4.reshape(BH, -1, D // 2),
                vs.reshape(BH, -1), vb.reshape(BH, -1),
                offs, scale, left_pad=lp,
            )
            out = out[:, :g].reshape(B, nh, S, D).astype(q.dtype)
            return out, (k4, ks, kb, v4, vs, vb)

        # ---- XLA fallback: identical math, unpack materialized
        k8 = self._unpack(k4)
        v8 = self._unpack(v4)
        q8g = q8.reshape(B, nkv, g, S, D)
        iscores = jnp.einsum(
            "bkgsd,bktd->bkgst", q8g, k8, preferred_element_type=jnp.int32)
        ksb = ks[:, :, None, None, :]
        kbb = kb[:, :, None, None, :]
        qsg = qs.reshape(B, nkv, g, S, 1)
        qsumg = qsum.reshape(B, nkv, g, S, 1)
        scores = ((iscores.astype(jnp.float32) * ksb + qsumg * kbb)
                  * qsg * jnp.float32(scale))
        if logit_softcap is not None:
            scores = jnp.tanh(scores / logit_softcap) * logit_softcap
        if mask is not None:
            m = mask
            if m.ndim == 4:
                mh = m.shape[1]
                m = (m.reshape(B, nkv, g, S, -1) if mh == nh
                     else m[:, :, None, :, :])
            scores = jnp.where(
                m, scores, jnp.float32(jnp.finfo(jnp.float32).min))
        if sinks is not None:
            col = jnp.broadcast_to(
                sinks.astype(jnp.float32).reshape(1, nkv, g, 1, 1),
                (B, nkv, g, S, 1))
            p = jax.nn.softmax(
                jnp.concatenate([scores, col], axis=-1), axis=-1)[..., :-1]
        else:
            p = jax.nn.softmax(scores, axis=-1)
        pv = p * vs[:, :, None, None, :]
        out = jnp.einsum(
            "bkgst,bktd->bkgsd", pv.astype(q.dtype), v8.astype(q.dtype),
            preferred_element_type=jnp.float32)
        bias_term = jnp.einsum(
            "bkgst,bkt->bkgs", p, vb, preferred_element_type=jnp.float32)
        out = out + bias_term[..., None].astype(out.dtype)
        out = out.reshape(B, nh, S, D).astype(q.dtype)
        return out, (k4, ks, kb, v4, vs, vb)


def init_int4_cache(
    num_layers: int,
    batch_size: int,
    num_kv_heads: int,
    head_dim: int,
    capacity: int,
    left_pad: Optional[jax.Array] = None,
    per_row: bool = False,
) -> Int4KVCache:
    base = (num_layers, batch_size, num_kv_heads, capacity)
    if left_pad is None:
        left_pad = jnp.zeros((batch_size,), jnp.int32)
    offset = (
        jnp.zeros((batch_size,), jnp.int32) if per_row
        else jnp.zeros((), jnp.int32)
    )
    return Int4KVCache(
        k4=jnp.zeros((*base, head_dim // 2), jnp.uint8),
        ks=jnp.zeros(base, jnp.float32),
        kb=jnp.zeros(base, jnp.float32),
        v4=jnp.zeros((*base, head_dim // 2), jnp.uint8),
        vs=jnp.zeros(base, jnp.float32),
        vb=jnp.zeros(base, jnp.float32),
        offset=offset,
        left_pad=left_pad,
    )
