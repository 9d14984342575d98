"""Streaming probe: grid-pipelined tiles from HBM + per-tile compute.

Measures effective HBM bandwidth of an auto-pipelined pallas grid doing
the real per-tile dequant+dot math (PROBE_VARIANT: none|bf16|grp|i8grp).
NT tiles of [K, TN] u8 stream once each; compute accumulates into one
[M, TN] output block.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os
K, TN, M, g = 3584, int(_os.environ.get("PROBE_TN", "512")), 8, 64
gt = K // g
NT = (56 * 512) // TN  # ~103 MB of packed weights

VARIANT = os.environ.get("PROBE_VARIANT", "grp")


def f16_to_f32(u):
    u = u.astype(jnp.int32)
    sign = jnp.where((u >> 15) & 1 != 0, -1.0, 1.0).astype(jnp.float32)
    exp = (u >> 10) & 0x1F
    mant = u & 0x3FF
    normal = jax.lax.bitcast_convert_type(
        ((exp + 112) << 23) | (mant << 13), jnp.float32)
    sub = mant.astype(jnp.float32) * jnp.float32(5.9604645e-8)
    return sign * jnp.where(exp == 0, sub, normal)


def kern_pipe(q_ref, sc_ref, x_ref, o_ref, w_scr):
    """Software-pipelined: dot tile t-1 (already dequantized in scratch)
    while dequantizing tile t — VPU and MXU run dependence-free."""
    dims = (((1,), (0,)), ((), ()))
    r = pl.program_id(0)
    nt = pl.num_programs(0)
    x = x_ref[:]

    @pl.when(r == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(r > 0)
    def _():
        w = w_scr[jax.lax.rem(r + 1, 2)]          # tile r-1, [K, 2TN] bf16
        xb = x.astype(jnp.bfloat16)
        y2 = jax.lax.dot_general(xb, w, dims,
                                 preferred_element_type=jnp.float32)
        o_ref[:] += y2[:, :TN] + y2[:, TN:]

    # stage A: dequantize tile r into the other slot (skipped on the
    # epilogue step, where q_ref re-reads the last tile)
    @pl.when(r < nt - 1)
    def _():
        q = q_ref[0]
        sc = f16_to_f32(sc_ref[0])
        qi = q.astype(jnp.int32)
        lo = (qi & 0xF).astype(jnp.float32).reshape(gt, g, TN)
        hi = (qi >> 4).astype(jnp.float32).reshape(gt, g, TN)
        slot = jax.lax.rem(r, 2)
        w_scr[slot, :, :TN] = (
            lo * sc[:, 0:1] + sc[:, 2:3]).reshape(K, TN).astype(jnp.bfloat16)
        w_scr[slot, :, TN:] = (
            hi * sc[:, 1:2] + sc[:, 3:4]).reshape(K, TN).astype(jnp.bfloat16)


def kern(q_ref, sc_ref, x_ref, o_ref):
    dims = (((1,), (0,)), ((), ()))
    r = pl.program_id(0)
    x = x_ref[:]
    q = q_ref[0]
    if VARIANT in ("f32sc", "bf16sc"):
        sc = sc_ref[0].astype(jnp.float32)
    elif VARIANT == "fastdec":
        # scales are positive normals; biases carry sign, no subnormals
        u = sc_ref[0].astype(jnp.int32)
        sc = jax.lax.bitcast_convert_type(
            ((u & 0x8000) << 16) | (((u & 0x7FFF) + (112 << 10)) << 13),
            jnp.float32)
    else:
        sc = f16_to_f32(sc_ref[0])

    if VARIANT == "dqonly":
        qi = q.astype(jnp.int32)
        lo = (qi & 0xF).astype(jnp.float32).reshape(gt, g, TN)
        hi = (qi >> 4).astype(jnp.float32).reshape(gt, g, TN)
        w_lo = (lo * sc[:, 0:1] + sc[:, 2:3]).reshape(K, TN)
        w_hi = (hi * sc[:, 1:2] + sc[:, 3:4]).reshape(K, TN)
        y = (w_lo[0:8, :] + w_hi[0:8, :]) * 1e-9 + x[:, 0:1] * 0.0
    elif VARIANT == "nodec":
        # bf16 math but skip the f16->f32 scale decode (treat raw u16 as f32)
        scr = sc_ref[0].astype(jnp.float32) * 1e-9
        qi = q.astype(jnp.int32)
        lo = (qi & 0xF).astype(jnp.float32).reshape(gt, g, TN)
        hi = (qi >> 4).astype(jnp.float32).reshape(gt, g, TN)
        w_lo = (lo * scr[:, 0:1] + scr[:, 2:3]).reshape(K, TN)
        w_hi = (hi * scr[:, 1:2] + scr[:, 3:4]).reshape(K, TN)
        xb = x.astype(jnp.bfloat16)
        ylo = jax.lax.dot_general(xb, w_lo.astype(jnp.bfloat16), dims,
                                  preferred_element_type=jnp.float32)
        yhi = jax.lax.dot_general(xb, w_hi.astype(jnp.bfloat16), dims,
                                  preferred_element_type=jnp.float32)
        y = ylo + yhi
    elif VARIANT == "none":
        y = q[0:8, 0:TN].astype(jnp.int32).astype(jnp.float32) * 1e-9
    elif VARIANT in ("bf16", "f32sc", "bf16sc", "fastdec"):
        qi = q.astype(jnp.int32)
        lo = (qi & 0xF).astype(jnp.float32).reshape(gt, g, TN)
        hi = (qi >> 4).astype(jnp.float32).reshape(gt, g, TN)
        w_lo = (lo * sc[:, 0:1] + sc[:, 2:3]).reshape(K, TN)
        w_hi = (hi * sc[:, 1:2] + sc[:, 3:4]).reshape(K, TN)
        xb = x.astype(jnp.bfloat16)
        ylo = jax.lax.dot_general(xb, w_lo.astype(jnp.bfloat16), dims,
                                  preferred_element_type=jnp.float32)
        yhi = jax.lax.dot_general(xb, w_hi.astype(jnp.bfloat16), dims,
                                  preferred_element_type=jnp.float32)
        y = ylo + yhi
    elif VARIANT == "grp":
        qi = q.astype(jnp.int32)
        lo = (qi & 0xF).astype(jnp.bfloat16)
        hi = (qi >> 4).astype(jnp.bfloat16)
        xb = x.astype(jnp.bfloat16)
        y = jnp.zeros((M, TN), jnp.float32)
        for j in range(gt):
            sl_ = slice(j * g, (j + 1) * g)
            xg = xb[:, sl_]
            zlo = jax.lax.dot_general(xg, lo[sl_], dims,
                                      preferred_element_type=jnp.float32)
            zhi = jax.lax.dot_general(xg, hi[sl_], dims,
                                      preferred_element_type=jnp.float32)
            xs = jnp.sum(x[:, sl_], axis=1, keepdims=True)
            y = (y + zlo * sc[j, 0:1] + zhi * sc[j, 1:2]
                 + xs * (sc[j, 2:3] + sc[j, 3:4]))
    else:  # i8grp
        qi = q.astype(jnp.int32)
        lo = (qi & 0xF).astype(jnp.int8)
        hi = (qi >> 4).astype(jnp.int8)
        y = jnp.zeros((M, TN), jnp.float32)
        for j in range(gt):
            sl_ = slice(j * g, (j + 1) * g)
            xg = x[:, sl_]
            ax = jnp.max(jnp.abs(xg), axis=1, keepdims=True)
            sx = ax * (1.0 / 127.0) + 1e-30
            xq = jnp.round(xg / sx).astype(jnp.int8)
            zlo = jax.lax.dot_general(xq, lo[sl_], dims,
                                      preferred_element_type=jnp.int32)
            zhi = jax.lax.dot_general(xq, hi[sl_], dims,
                                      preferred_element_type=jnp.int32)
            xs = jnp.sum(xg, axis=1, keepdims=True)
            y = (y + zlo.astype(jnp.float32) * (sx * sc[j, 0:1])
                 + zhi.astype(jnp.float32) * (sx * sc[j, 1:2])
                 + xs * (sc[j, 2:3] + sc[j, 3:4]))

    @pl.when(r == 0)
    def _():
        o_ref[:] = jnp.zeros((M, TN), jnp.float32)
    o_ref[:] += y


def main():
    rng = np.random.default_rng(0)
    q = jnp.array(rng.integers(0, 255, (NT, K, TN)).astype(np.uint8))
    scf = jnp.array(
        rng.standard_normal((NT, gt, 4, TN)) * 0.01, jnp.float16)
    if VARIANT == "f32sc":
        sc = scf.astype(jnp.float32)
    elif VARIANT == "bf16sc":
        sc = scf.astype(jnp.bfloat16)
    else:
        sc = jax.lax.bitcast_convert_type(scf, jnp.uint16)
    x = jnp.array(rng.standard_normal((M, K)).astype(np.float32))

    if VARIANT == "pipe":
        fn = pl.pallas_call(
            kern_pipe,
            grid=(NT + 1,),
            in_specs=[
                pl.BlockSpec((1, K, TN),
                             lambda r: (jnp.minimum(r, NT - 1), 0, 0)),
                pl.BlockSpec((1, gt, 4, TN),
                             lambda r: (jnp.minimum(r, NT - 1), 0, 0, 0)),
                pl.BlockSpec((M, K), lambda r: (0, 0)),
            ],
            out_specs=pl.BlockSpec((M, TN), lambda r: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((M, TN), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, K, 2 * TN), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )
    else:
        fn = pl.pallas_call(
        kern,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, K, TN), lambda r: (r, 0, 0)),
            pl.BlockSpec((1, gt, 4, TN), lambda r: (r, 0, 0, 0)),
            pl.BlockSpec((M, K), lambda r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, TN), lambda r: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, TN), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        )
    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def run(n, q, sc, x):
        def body(h, _):
            y = fn(q, sc, h)             # [M, TN]
            h2 = x + jnp.tanh(y[:, 0:1]) * 1e-3   # [M, K] via broadcast
            return h2, None
        h, _ = jax.lax.scan(body, x, None, length=n)
        return h[0, 0]

    def go(n):
        return float(np.asarray(run(n, q, sc, x)))

    t0 = time.time(); go(1)
    print(f"compile {time.time()-t0:.0f}s", flush=True)
    ts = {}
    for n in (2, 62):
        best = float("inf")
        for _ in range(7):
            t0 = time.perf_counter(); go(n)
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    dt = (ts[62] - ts[2]) / 60
    nbytes = q.nbytes + sc.nbytes
    bw = nbytes / dt / 1e9
    full = 3.67e9 / (q.nbytes / dt)
    print(f"{VARIANT}: {dt*1e3:.3f} ms for {nbytes/1e6:.0f} MB "
          f"-> {bw:.0f} GB/s; 7B stack ~{full*1e3:.2f} ms "
          f"({1/full:.0f} tok/s)", flush=True)


if __name__ == "__main__":
    main()
