"""Minimal probe: does Mosaic overlap block DMA with compute at all?

Streams NT [K,TN] u8 tiles; VARIANTS scale the per-tile VPU work.  If the
pipeline double-buffers, total ~= max(DMA, compute); if it serializes,
total ~= DMA + compute.
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

K, TN = 3584, 512
NT = 56
WORK = int(os.environ.get("WORK", "0"))  # extra VPU passes per tile
DIMSEM = os.environ.get("DIMSEM", "0") == "1"


def kern(x_ref, q_ref, o_ref):
    q = q_ref[0]
    acc = q[0:8, :].astype(jnp.int32).astype(jnp.float32) + x_ref[0:8, 0:TN]
    for i in range(WORK):
        # full-tile VPU work: depends on the arriving tile
        w = (q.astype(jnp.int32) & 0xF).astype(jnp.float32)
        acc += w[0:8, :] * (1.0 + i)
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    o_ref[:] += acc


def main():
    rng = np.random.default_rng(0)
    q = jnp.array(rng.integers(0, 255, (NT, K, TN)).astype(np.uint8))

    fn = pl.pallas_call(
        kern,
        grid=(NT,),
        in_specs=[pl.BlockSpec((8, K), lambda r: (0, 0)),
                  pl.BlockSpec((1, K, TN), lambda r: (r, 0, 0))],
        out_specs=pl.BlockSpec((8, TN), lambda r: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, TN), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    x = jnp.array(np.random.default_rng(1).standard_normal((8, K)), jnp.float32)

    @functools.partial(jax.jit, static_argnums=0)
    def run(n, q, x):
        def body(h, _):
            y = fn(h, q)
            return h + jnp.tanh(y[0, 0]) * 1e-9, None
        h, _ = jax.lax.scan(body, x, None, length=n)
        return h[0, 0]

    def go(n):
        return float(np.asarray(run(n, q, x)))

    t0 = time.time(); go(1)
    print(f"compile {time.time()-t0:.0f}s", flush=True)
    ts = {}
    for n in (2, 42):
        best = float("inf")
        for _ in range(7):
            t0 = time.perf_counter(); go(n)
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    dt = (ts[42] - ts[2]) / 40
    bw = q.nbytes / dt / 1e9
    print(f"WORK={WORK}: {dt*1e3:.3f} ms for {q.nbytes/1e6:.0f} MB "
          f"-> {bw:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
