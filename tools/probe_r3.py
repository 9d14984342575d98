"""Round-3 perf probes.  The axon tunnel costs ~6 ms per dispatch, so all
measurements run N device-side iterations inside one jitted program and fit
the slope between two N values — pure device time, link-independent.
Big arrays are always jit ARGUMENTS (closure capture would constant-fold)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def device_time(fn, args, n_lo=4, n_hi=16, reps=5):
    """fn(n_static, *args) jitted with n static; returns sec/iteration."""
    def run(n):
        r = fn(n, *args)
        np.asarray(jax.block_until_ready(r))

    run(n_lo); run(n_hi)  # compile
    ts = {}
    for name, n in (("lo", n_lo), ("hi", n_hi)):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run(n)
            best = min(best, time.perf_counter() - t0)
        ts[name] = best
    return (ts["hi"] - ts["lo"]) / (n_hi - n_lo)


# ---------------------------------------------------------------- 1. stream BW
def stream_probe():
    NBYTES = 1 << 28  # 256 MiB
    ROWS, COLS = NBYTES // 1024, 1024
    TR = 2048

    def kern(x_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += jnp.sum(
            x_ref[:].astype(jnp.int32), axis=0, keepdims=True
        ).astype(jnp.float32)

    def once(x):
        return pl.pallas_call(
            kern,
            grid=(ROWS // TR,),
            in_specs=[pl.BlockSpec((TR, COLS), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((1, COLS), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, COLS), jnp.float32),
        )(x)

    @functools.partial(jax.jit, static_argnums=0)
    def f(n, x):
        def body(c, _):
            return jnp.sum(once(x)) * 0 + c, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return c

    x = jnp.ones((ROWS, COLS), jnp.uint8)
    dt = device_time(f, (x,), 2, 8)
    print(f"stream read 256MiB: {dt*1e3:.2f} ms -> {NBYTES/dt/1e9:.0f} GB/s",
          flush=True)


# ------------------------------------------------------- 2. pallas call cost
def overhead_probe():
    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    def once(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)

    @functools.partial(jax.jit, static_argnums=0)
    def f(n, x0):
        def body(c, _):
            return once(c), None
        c, _ = jax.lax.scan(body, x0, None, length=n)
        return c[0, 0]

    x0 = jnp.zeros((8, 128), jnp.float32)
    dt = device_time(f, (x0,), 32, 256)
    print(f"trivial pallas in scan: {dt*1e6:.2f} us/call", flush=True)

    @functools.partial(jax.jit, static_argnums=0)
    def fx(n, x0):
        def body(c, _):
            return c * 1.0001 + 1.0, None
        c, _ = jax.lax.scan(body, x0, None, length=n)
        return c[0, 0]

    dt = device_time(fx, (x0,), 32, 256)
    print(f"xla add in scan: {dt*1e6:.2f} us/iter", flush=True)


# ----------------------------------------------- 3. current int4 kernel rate
def int4_probe():
    from mlx_vlm_tpu.core.quant import quantize, to_int4_grouped
    from mlx_vlm_tpu.ops.int4_matvec import int4_matvec

    L, K, N = 28, 3584, 18944
    rng = np.random.default_rng(0)
    w = rng.standard_normal((N, K), dtype=np.float32) * 0.02
    print("quantizing...", flush=True)
    t1 = to_int4_grouped(quantize(jnp.asarray(w), bits=4, group_size=64))
    t = jax.tree_util.tree_map(
        lambda a: jnp.copy(jnp.broadcast_to(a[None], (L,) + a.shape)), t1)
    x = jnp.ones((1, K), jnp.bfloat16)
    print("quantized", flush=True)

    @functools.partial(jax.jit, static_argnums=0)
    def f(n, x, t):
        def body(c, i):
            y = int4_matvec(c, t, i % L)
            return (y[:, :K] * 1e-3).astype(c.dtype), None
        c, _ = jax.lax.scan(body, x, jnp.arange(n * L, dtype=jnp.int32))
        return c[0, 0]

    dt = device_time(f, (x, t), 1, 3) / L  # per matvec
    nbytes = (t.qp.nbytes + t.sl.nbytes + t.sh.nbytes + t.bl.nbytes
              + t.bh.nbytes) // L
    print(f"int4_matvec [{K}x{N}]: {dt*1e6:.1f} us -> "
          f"{nbytes/dt/1e9:.0f} GB/s total ({t.qp.nbytes//L/dt/1e9:.0f} GB/s "
          f"packed; qp {t.qp.nbytes//L>>20} MiB + scales "
          f"{(nbytes - t.qp.nbytes//L)>>20} MiB per layer)", flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    stream_probe()
    overhead_probe()
    int4_probe()
