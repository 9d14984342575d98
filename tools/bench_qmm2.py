"""Prototype v2 quantized-matmul kernels ([K,N] transposed layout) vs v1.

Variants benchmarked at Qwen2-VL-2B decode shapes (M=1):
  v1   — current ops/qmatmul.py kernel ([N,K] layout, one-hot scale expand)
  v2a  — [K,N] layout: scales broadcast by sublane repeat, bias folded into
         a per-group x-sum matmul, bf16 dequant + bf16 MXU
  v2f  — v2a but f32 dequant/MXU
  xla4 — XLA-native int4: w4.astype(bf16) matmul under jit (no pallas)

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 580 python tools/bench_qmm2.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from __future__ import annotations

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mlx_vlm_tpu.core.quant import quantize, dequantize, QuantizedTensor
from mlx_vlm_tpu.ops.qmatmul import quantized_matmul_pallas

INNER = 1000
_FLOOR = [0.0]


def _run_once(fn, *args):
    @jax.jit
    def run(*args):
        def body(carry, _):
            y = fn(carry, *args[1:])
            carry = carry + (jnp.tanh(y).sum() * 1e-30).astype(carry.dtype)
            return carry, ()

        out, _ = jax.lax.scan(body, args[0], None, length=INNER)
        return out

    r = run(*args)
    jax.block_until_ready(r)
    np.asarray(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = run(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best


def timeit(fn, *args):
    if not _FLOOR[0]:
        z = jnp.zeros((1, 128), jnp.float32)
        _FLOOR[0] = _run_once(lambda c: c * 1.0000001, z)
        print(f"program floor: {_FLOOR[0]*1e3:.2f} ms/call")
    return max(_run_once(fn, *args) - _FLOOR[0], 0.0) / INNER


# ---------------------------------------------------------------- v2 kernel
def _qmm4_v2_kernel(xe_ref, xo_ref, q_ref, s_ref, o_ref,
                    *, half_groups, compute_dtype):
    """[K,N]-layout int4 qmm tile (bias term handled outside by XLA).

    q_ref: [TK/2, TN] packed bytes (row i: lo=k=2i, hi=k=2i+1)
    s_ref: [G_t, TN] group scales
    xe/xo: [M, TK/2] even/odd x columns
    """
    kt = pl.program_id(1)
    q = q_ref[:].astype(jnp.int32)
    lo = (q & 0x0F).astype(compute_dtype)
    hi = (q >> 4).astype(compute_dtype)
    s = s_ref[:].astype(compute_dtype)
    tkh, tn = lo.shape
    rep = tkh // half_groups  # sublanes per group in the half plane
    s_half = jnp.broadcast_to(s[:, None, :], (half_groups, rep, tn)).reshape(
        tkh, tn
    )
    w_lo = lo * s_half
    w_hi = hi * s_half
    xe = xe_ref[:].astype(compute_dtype)
    xo = xo_ref[:].astype(compute_dtype)
    acc = jax.lax.dot_general(
        xe, w_lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc += jax.lax.dot_general(
        xo, w_hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(kt == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += acc


def _largest_divisor(n: int, cap: int, mult: int) -> int:
    """Largest d <= cap with d % mult == 0 and n % d == 0 (or mult)."""
    best = mult
    d = mult
    while d <= cap:
        if n % d == 0:
            best = d
        d += mult
    return best


@functools.partial(jax.jit, static_argnames=("group_size", "tile_n", "tile_k",
                                             "compute_dtype"))
def qmm4_v2(x, qT, sT, bT, *, group_size, tile_n=512, tile_k=2048,
            compute_dtype=jnp.bfloat16):
    """x [M, K] @ dequant(qT [K/2, N] packed).  sT/bT: [G, N]."""
    M, K = x.shape
    N = qT.shape[1]
    tile_k = _largest_divisor(K, min(tile_k, K), 2 * group_size)
    tile_n = _largest_divisor(N, min(tile_n, N), 128)
    half_groups = tile_k // group_size
    xf = x.astype(jnp.float32)
    xe = x[:, 0::2]
    xo = x[:, 1::2]
    xs = xf.reshape(M, K // group_size, group_size).sum(-1)  # [M, G]
    grid = (N // tile_n, K // tile_k)
    out = pl.pallas_call(
        functools.partial(_qmm4_v2_kernel, half_groups=half_groups,
                          compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, tile_k // 2), lambda i, kt: (0, kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, tile_k // 2), lambda i, kt: (0, kt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k // 2, tile_n), lambda i, kt: (kt, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((half_groups, tile_n), lambda i, kt: (kt, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, tile_n), lambda i, kt: (0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=N * K // 2 + M * K * 4 + M * N * 4,
            transcendentals=0,
        ),
    )(xe, xo, qT, sT)
    # bias term via XLA: sum_g xs[m,g] b[g,n]
    out = out + jax.lax.dot_general(
        xs, bT.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("group_size",))
def qmm4_xla_int4(x, w4, sT, bT, *, group_size):
    """XLA-native int4 path: w4 [K, N] jnp.int4; dequant fused (we hope)
    into the matvec reduce loop."""
    M, K = x.shape
    G, N = sT.shape
    w = w4.astype(jnp.bfloat16).reshape(G, group_size, N)
    w = w * sT.astype(jnp.bfloat16)[:, None, :] + bT.astype(jnp.bfloat16)[:, None, :]
    return jax.lax.dot_general(
        x, w.reshape(K, N), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


@jax.jit
def pack_int4(qT):
    """[K/2, N] packed uint8 -> [K, N] jnp.int4 (on device, under jit —
    eager int4 device_put is broken on the axon platform)."""
    lo = (qT & 0x0F).astype(jnp.int8)
    hi = (qT >> 4).astype(jnp.int8)
    k2, n = qT.shape
    inter = jnp.stack([lo, hi], axis=1).reshape(2 * k2, n)
    return inter.astype(jnp.int4)


def to_transposed(t: QuantizedTensor):
    """[N, K]-packed v1 tensor -> ([K/2, N] packed uint8, sT [G,N], bT [G,N]).

    v1 byte j of row n packs codes (2j lo, 2j+1 hi) along K; transposing the
    packed array directly preserves that pairing per byte.
    """
    qT = jnp.transpose(t.q, (1, 0))  # [K/2, N]
    sT = jnp.transpose(t.scales, (1, 0)).astype(jnp.float32)
    bT = jnp.transpose(t.biases, (1, 0)).astype(jnp.float32)
    return qT, sT, bT


SHAPES = {
    "q_proj": (1536, 1536),
    "o_proj": (1536, 1536),
    "gate_up_single": (8960, 1536),
    "down": (1536, 8960),
    "qkv_fused": (2048, 1536),
    "gateup_fused": (17920, 1536),
    "lm_head": (151936, 1536),
    # Qwen2-VL-7B dims
    "7b_qkv": (4608, 3584),
    "7b_o": (3584, 3584),
    "7b_gateup": (37888, 3584),
    "7b_down": (3584, 18944),
}


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)

    # correctness first (small shape)
    w = jnp.asarray(rng.standard_normal((256, 512)), jnp.float32)
    t = quantize(w, bits=4, group_size=64)
    x = jnp.asarray(rng.standard_normal((1, 512)), jnp.float32)
    ref = x @ dequantize(t, jnp.float32).T
    qT, sT, bT = to_transposed(t)
    got = qmm4_v2(x, qT, sT, bT, group_size=64, tile_n=256, tile_k=512,
                  compute_dtype=jnp.float32)
    err = float(jnp.abs(ref - got).max() / jnp.abs(ref).max())
    print(f"v2 correctness rel-err: {err:.2e}")
    got_bf = qmm4_v2(x.astype(jnp.bfloat16), qT, sT, bT, group_size=64,
                     tile_n=256, tile_k=512)
    err_bf = float(jnp.abs(ref - got_bf.astype(jnp.float32)).max()
                   / jnp.abs(ref).max())
    print(f"v2 bf16 rel-err: {err_bf:.2e}")
    try:
        w4 = pack_int4(qT)
        got4 = qmm4_xla_int4(x.astype(jnp.bfloat16), w4, sT, bT, group_size=64)
        err4 = float(jnp.abs(ref - got4.astype(jnp.float32)).max()
                     / jnp.abs(ref).max())
        print(f"xla-int4 rel-err: {err4:.2e}")
        have_int4 = True
    except Exception as e:  # noqa: BLE001
        print("xla-int4 unavailable:", repr(e)[:200])
        have_int4 = False

    results = {}
    for name, (N, K) in SHAPES.items():
        w = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)
        t4 = quantize(w, bits=4, group_size=64)
        x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)
        qT, sT, bT = to_transposed(t4)
        jax.block_until_ready((qT, sT, bT))

        def v1(xx, q, s, b):
            tt = QuantizedTensor(q=q, scales=s, biases=b, bits=4,
                                 group_size=64, out_dtype="bfloat16")
            return quantized_matmul_pallas(xx, tt)

        tv1 = timeit(v1, x, t4.q, t4.scales, t4.biases)

        def v2a(xx, q, s, b):
            return qmm4_v2(xx, q, s, b, group_size=64)

        tv2a = timeit(v2a, x, qT, sT, bT)

        if have_int4:
            w4 = jax.block_until_ready(pack_int4(qT))

            def x4(xx, w4, s, b):
                return qmm4_xla_int4(xx, w4, s, b, group_size=64)

            tx4 = timeit(x4, x, w4, sT, bT)
        else:
            tx4 = float("nan")

        ideal = (N * K / 2) / 819e9
        results[name] = (tv1, tv2a, tx4)
        print(
            f"{name:14s} N={N:6d} K={K:5d}  v1 {tv1*1e6:7.1f}  "
            f"v2a {tv2a*1e6:7.1f}  xla4 {tx4*1e6:7.1f}  "
            f"ideal {ideal*1e6:6.1f} us"
        )

    L = 28
    for label, idx in (("v1", 0), ("v2a", 1), ("xla4", 2)):
        per_layer = (
            results["qkv_fused"][idx]
            + results["o_proj"][idx]
            + results["gateup_fused"][idx]
            + results["down"][idx]
        )
        tot = L * per_layer + results["lm_head"][idx]
        print(f"2B fused-model matmul/token [{label:4s}]: {tot*1e3:6.2f} ms"
              f" ({1/tot:5.0f} tok/s cap)")
    L7 = 28
    for label, idx in (("v1", 0), ("v2a", 1), ("xla4", 2)):
        per_layer = (
            results["7b_qkv"][idx]
            + results["7b_o"][idx]
            + results["7b_gateup"][idx]
            + results["7b_down"][idx]
        )
        tot = L7 * per_layer + results["lm_head"][idx]
        print(f"7B fused-model matmul/token [{label:4s}]: {tot*1e3:6.2f} ms"
              f" ({1/tot:5.0f} tok/s cap)")


if __name__ == "__main__":
    main()
