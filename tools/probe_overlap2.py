"""Is DMA/compute overlap possible AT ALL on this stack?

Manual-DMA stream (3-slot ring) + per-step dummy compute on a SEPARATE
constant VMEM buffer — zero data dependence on the streamed tiles.
If step time == max(DMA, compute) overlap works and the fused kernel's
problem is scheduling/dependence; if == DMA + compute the toolchain or
chip serializes them and the design must cut bytes instead.

OV2_COMP=<n> repeats of a [8,512]x[512,512] bf16 dot per step (0 = pure
DMA floor).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TK, TN = 3584, 512
NSLOT = 3
NBLK = (1 << 30) // (TK * TN)  # ~1.1GB
R_COMP = int(os.environ.get("OV2_COMP", "4"))


def kernel(w_hbm, a_ref, o_ref, slots, sem):
    def dma(i, slot):
        return pltpu.make_async_copy(w_hbm.at[i], slots.at[slot], sem.at[slot])

    def body(i, acc):
        slot = jax.lax.rem(i, NSLOT)
        nxt = i + NSLOT - 1

        @pl.when(nxt < NBLK)
        def _():
            dma(nxt, jax.lax.rem(nxt, NSLOT)).start()

        dma(i, slot).wait()
        # independent compute: chained bf16 dots on a resident buffer
        x = acc
        for _ in range(R_COMP):
            x = jax.lax.dot_general(
                x, a_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16) * 1e-3
        # consume one value from the DMA'd tile so copies can't be elided
        t = slots[slot, 0:8, 0:128].astype(jnp.int32).astype(jnp.float32)
        o_ref[0:8, 0:128] += jnp.sum(t) * 0.0 + x[:, 0:128].astype(jnp.float32) * 0.0
        return x

    o_ref[:] = jnp.zeros_like(o_ref)
    for j in range(NSLOT - 1):
        dma(j, j).start()
    jax.lax.fori_loop(
        0, NBLK, body, jnp.ones((8, 512), jnp.bfloat16), unroll=False
    )


def run(w, a):
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, TN), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NSLOT, TK, TN), jnp.uint8),
            pltpu.SemaphoreType.DMA((NSLOT,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(w.reshape(NBLK, TK, TN), a)


def main():
    w = jnp.array(np.random.randint(0, 255, (NBLK * TK, TN)), jnp.uint8)
    a = jnp.array(np.random.standard_normal((512, 512)), jnp.bfloat16)
    fn = jax.jit(run)

    def go(n):
        r = None
        for _ in range(n):
            r = fn(w, a)
        np.asarray(r)

    go(1)
    ts = {}
    for n in (1, 4):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            go(n)
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    dt = (ts[4] - ts[1]) / 3
    gb = NBLK * TK * TN / 1e9
    print(
        f"comp={R_COMP}: {dt*1e3:.2f} ms -> {gb/dt:.0f} GB/s "
        f"({dt/NBLK*1e6:.2f} us/tile)", flush=True,
    )


if __name__ == "__main__":
    main()
