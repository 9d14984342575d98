"""Manual double-buffered DMA pipeline probe: dequant+dot at the DMA floor?

One gridless kernel; weights stay in HBM (memory_space=ANY); explicit
make_async_copy per tile with 2 revolving VMEM slots: start(t+1) BEFORE
wait(t), then compute(t).  Compare vs the auto-pipelined grid
(tools/probe_stream.py), which measures DMA+compute serialized.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, TN, M, g = 3584, 512, 8, 64
gt = K // g
NT = 56
VARIANT = os.environ.get("PROBE_VARIANT", "deq")  # none|deq


def kern(x_ref, q_hbm, sc_hbm, o_ref, q_scr, sc_scr, sem_q, sem_s):
    x = x_ref[:]
    xb = x.astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))

    def qdma(slot, t):
        return pltpu.make_async_copy(
            q_hbm.at[t], q_scr.at[slot], sem_q.at[slot])

    def sdma(slot, t):
        return pltpu.make_async_copy(
            sc_hbm.at[t], sc_scr.at[slot], sem_s.at[slot])

    qdma(0, 0).start()
    sdma(0, 0).start()
    if VARIANT.startswith("co_"):
        qdma(0, 0).wait()
        sdma(0, 0).wait()
    o_ref[:] = jnp.zeros_like(o_ref)

    def body(t, acc):
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        nodma = VARIANT.startswith("co_")

        if not nodma:
            @pl.when(t + 1 < NT)
            def _():
                qdma(nxt, t + 1).start()
                sdma(nxt, t + 1).start()

            qdma(slot, t).wait()
            sdma(slot, t).wait()
        else:
            slot = jax.lax.rem(t, 2) * 0  # always slot 0, fetched in prologue

        q = q_scr[slot]
        sc = sc_scr[slot]
        v = VARIANT[3:] if nodma else VARIANT
        if v == "none":
            return acc + q[0:8, :].astype(jnp.int32).astype(jnp.float32) \
                + sc[0, 0:1, :] * 1e-9
        if v == "deq":
            qi = q.astype(jnp.int32)
            lo = (qi & 0xF).astype(jnp.float32).reshape(gt, g, TN)
            hi = (qi >> 4).astype(jnp.float32).reshape(gt, g, TN)
            w_lo = (lo * sc[:, 0:1] + sc[:, 2:3]).reshape(K, TN).astype(
                jnp.bfloat16)
            w_hi = (hi * sc[:, 1:2] + sc[:, 3:4]).reshape(K, TN).astype(
                jnp.bfloat16)
            ylo = jax.lax.dot_general(xb, w_lo, dims,
                                      preferred_element_type=jnp.float32)
            yhi = jax.lax.dot_general(xb, w_hi, dims,
                                      preferred_element_type=jnp.float32)
            return acc + ylo + yhi
        if v == "z2grp":
            # z2 trick: dot the RAW BYTES (exact in bf16: 0..255 has 8
            # significand bits) and the hi nibble; lo-dot = z2 - 16*zh.
            # Saves the &0xF pass: unpack = widen, cvt, shr, cvt.
            qi = q.astype(jnp.int32)
            q2 = qi.astype(jnp.bfloat16)          # lo + 16*hi
            hi = (qi >> 4).astype(jnp.bfloat16)
            y = jnp.zeros((M, TN), jnp.float32)
            y2 = jnp.zeros((M, TN), jnp.float32)
            for j in range(gt):
                sl_ = slice(j * g, (j + 1) * g)
                xgj = xb[:, sl_]
                z2 = jax.lax.dot_general(xgj, q2[sl_], dims,
                                         preferred_element_type=jnp.float32)
                zh = jax.lax.dot_general(xgj, hi[sl_], dims,
                                         preferred_element_type=jnp.float32)
                xsj = jnp.sum(x[:, sl_], axis=1, keepdims=True)
                # s_l*z_lo + s_h*z_h + (b_l+b_h)*sigma, z_lo = z2 - 16 zh
                t_ = (z2 * sc[j, 0:1]
                      + zh * (sc[j, 1:2] - 16.0 * sc[j, 0:1])
                      + xsj * (sc[j, 2:3] + sc[j, 3:4]))
                if j % 2 == 0:
                    y = y + t_
                else:
                    y2 = y2 + t_
            return acc + y + y2
        if v == "bgrp":
            # batched per-group dots on raw nibbles; scales applied to the
            # [gt, M, TN] group outputs, bias via a single [M,gt]x[gt,TN] dot
            qi = q.astype(jnp.int32)
            lo = (qi & 0xF).astype(jnp.bfloat16)   # [K, TN]
            hi = (qi >> 4).astype(jnp.bfloat16)
            # contract over g per group without batched dots: use one big
            # [M*gt? ] -- instead block-diagonal trick: x expanded per group
            # via iota masking, single [M*? ] dot is too big; fall back to
            # two interleaved accumulators to shorten the dependency chain
            y = jnp.zeros((M, TN), jnp.float32)
            y2 = jnp.zeros((M, TN), jnp.float32)
            for j in range(gt):
                sl_ = slice(j * g, (j + 1) * g)
                xgj = xb[:, sl_]
                zl = jax.lax.dot_general(xgj, lo[sl_], dims,
                                         preferred_element_type=jnp.float32)
                zh = jax.lax.dot_general(xgj, hi[sl_], dims,
                                         preferred_element_type=jnp.float32)
                if j % 2 == 0:
                    y = y + zl * sc[j, 0:1] + zh * sc[j, 1:2]
                else:
                    y2 = y2 + zl * sc[j, 0:1] + zh * sc[j, 1:2]
            y = y + y2
            for j in range(gt):
                sl_ = slice(j * g, (j + 1) * g)
                xsj = jnp.sum(x[:, sl_], axis=1, keepdims=True)  # [M,1]
                y = y + xsj * (sc[j, 2:3] + sc[j, 3:4])
            return acc + y
        raise ValueError(v)

    acc = jax.lax.fori_loop(0, NT, body, jnp.zeros((M, TN), jnp.float32))
    o_ref[:] = acc


def main():
    rng = np.random.default_rng(0)
    q = jnp.array(rng.integers(0, 255, (NT, K, TN)).astype(np.uint8))
    sc = jnp.array(rng.standard_normal((NT, gt, 4, TN)) * 0.01, jnp.float32)

    fn = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, TN), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, K, TN), jnp.uint8),
            pltpu.VMEM((2, gt, 4, TN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    x = jnp.array(np.random.default_rng(1).standard_normal((M, K)),
                  jnp.float32)

    @functools.partial(jax.jit, static_argnums=0)
    def run(n, q, sc, x):
        def body(h, _):
            y = fn(h, q, sc)
            return h + jnp.tanh(y[0, 0]) * 1e-9, None
        h, _ = jax.lax.scan(body, x, None, length=n)
        return h[0, 0]

    def go(n):
        return float(np.asarray(run(n, q, sc, x)))

    t0 = time.time(); go(1)
    print(f"compile {time.time()-t0:.0f}s", flush=True)
    if os.environ.get("CHECK", "0") == "1":
        y = np.asarray(fn(x, q, sc))
        qn = np.asarray(q).astype(np.int64)
        scn = np.asarray(sc, np.float64)
        xn = np.asarray(x, np.float64)
        w = np.zeros((NT, K, TN))
        ref = np.zeros((M, TN))
        for t in range(NT):
            lo = (qn[t] & 0xF).reshape(gt, g, TN)
            hi = (qn[t] >> 4).reshape(gt, g, TN)
            wl = lo * scn[t][:, 0:1] + scn[t][:, 2:3]
            wh = hi * scn[t][:, 1:2] + scn[t][:, 3:4]
            ref += xn @ wl.reshape(K, TN) + xn @ wh.reshape(K, TN)
        err = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"CHECK rel err = {err:.2e}", flush=True)
    ts = {}
    for n in (2, 42):
        best = float("inf")
        for _ in range(7):
            t0 = time.perf_counter(); go(n)
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    dt = (ts[42] - ts[2]) / 40
    nbytes = q.nbytes + sc.nbytes
    bw = nbytes / dt / 1e9
    full = 4.078e9 * dt / nbytes
    print(f"{VARIANT}: {dt*1e3:.3f} ms for {nbytes/1e6:.0f} MB -> "
          f"{bw:.0f} GB/s; 7B stack ~{full*1e3:.2f} ms "
          f"({1/full:.0f} tok/s)", flush=True)


if __name__ == "__main__":
    main()


def bench_many(variants=("none", "deq", "bgrp", "z2grp"), rounds=5):
    """Interleaved A/B of variants in one process (shared-chip variance)."""
    global VARIANT
    import importlib
    rng = np.random.default_rng(0)
    q = jnp.array(rng.integers(0, 255, (NT, K, TN)).astype(np.uint8))
    sc = jnp.array(rng.standard_normal((NT, gt, 4, TN)) * 0.01, jnp.float32)
    x = jnp.array(np.random.default_rng(1).standard_normal((M, K)),
                  jnp.float32)
    runs = {}
    for v in variants:
        VARIANT = v
        fn = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, TN), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, K, TN), jnp.uint8),
                pltpu.VMEM((2, gt, 4, TN), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))

        @functools.partial(jax.jit, static_argnums=0)
        def run(n, q, sc, x, fn=fn):
            def body(h, _):
                y = fn(h, q, sc)
                return h + jnp.tanh(y[0, 0]) * 1e-9, None
            h, _ = jax.lax.scan(body, x, None, length=n)
            return h[0, 0]
        float(np.asarray(run(2, q, sc, x)))
        float(np.asarray(run(42, q, sc, x)))
        runs[v] = run
    b2 = {v: float("inf") for v in variants}
    b42 = {v: float("inf") for v in variants}
    for r in range(rounds):
        for v in variants:
            t0 = time.perf_counter()
            float(np.asarray(runs[v](2, q, sc, x)))
            b2[v] = min(b2[v], time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(np.asarray(runs[v](42, q, sc, x)))
            b42[v] = min(b42[v], time.perf_counter() - t0)
    best = {v: (b42[v] - b2[v]) / 40 for v in variants}
    nbytes = q.nbytes + sc.nbytes
    for v in variants:
        dt = best[v]
        print(f"{v}: {dt*1e3:.3f} ms -> {nbytes/dt/1e9:.0f} GB/s; "
              f"7B ~{4.078e9*dt/nbytes*1e3:.2f} ms "
              f"({nbytes/4.078e9/dt:.0f} tok/s)", flush=True)


if os.environ.get("MANY", "0") == "1":
    bench_many()
