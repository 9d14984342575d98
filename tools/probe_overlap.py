"""Does manual early-issue DMA overlap compute on this stack?

Streams a ~1.8GB u8 array through VMEM in 1.75MB blocks three ways:
  auto : BlockSpec pipelining, dummy VPU+MXU compute per block
  manual: HBM ref + hand-rolled double buffer, DMA for block i+1 issued
          BEFORE compute of block i
  nocomp: manual, compute ablated (pure DMA floor)
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

TK = 3584
TN = int(os.environ.get("OV_TN", "512"))
NSLOT = int(os.environ.get("OV_SLOTS", "2"))
I8 = os.environ.get("OV_I8", "0") == "1"
NBLK = (1 << 31) // (TK * TN)  # ~2.1GB total


def compute_block(blk_u8, x):
    dims = (((1,), (0,)), ((), ()))
    if I8:
        # nibbles straight to the MXU as int8; scales would apply to
        # per-group partial sums outside (64x less VPU work)
        qi = blk_u8.astype(jnp.int32)
        lo = (qi & 0xF).astype(jnp.int8)
        hi = (qi >> 4).astype(jnp.int8)
        xi = x.astype(jnp.int8)
        ylo = jax.lax.dot_general(xi, lo, dims,
                                  preferred_element_type=jnp.int32)
        yhi = jax.lax.dot_general(xi, hi, dims,
                                  preferred_element_type=jnp.int32)
        return (ylo + yhi).astype(jnp.float32)
    qi = blk_u8.astype(jnp.int32)
    lo = (qi & 0xF).astype(jnp.float32)
    hi = (qi >> 4).astype(jnp.float32)
    w_lo = (lo * 1.5 + 0.1).astype(jnp.bfloat16)
    w_hi = (hi * 1.5 + 0.1).astype(jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)
    ylo = jax.lax.dot_general(xb, w_lo, dims,
                              preferred_element_type=jnp.float32)
    yhi = jax.lax.dot_general(xb, w_hi, dims,
                              preferred_element_type=jnp.float32)
    return ylo + yhi


def auto_kernel(w_ref, x_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += compute_block(w_ref[0], x_ref[:])


def run_auto(w, x):
    return pl.pallas_call(
        auto_kernel,
        grid=(NBLK,),
        in_specs=[
            pl.BlockSpec((1, TK, TN), lambda i: (i, 0, 0)),
            pl.BlockSpec((8, TK), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, TN), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, TN), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(w.reshape(NBLK, TK, TN), x)


def manual_kernel(w_hbm, x_ref, o_ref, slots, sem, *, ablate):
    def dma(i, slot):
        return pltpu.make_async_copy(
            w_hbm.at[i], slots.at[slot], sem.at[slot])

    def body(i, _):
        slot = jax.lax.rem(i, NSLOT)
        nxt = i + NSLOT - 1

        @pl.when(nxt < NBLK)
        def _():
            dma(nxt, jax.lax.rem(nxt, NSLOT)).start()

        dma(i, slot).wait()
        if not ablate:
            o_ref[:] += compute_block(slots[slot, :, :], x_ref[:])
        else:
            z = slots[slot, 0:8, 0:128].astype(jnp.int32).astype(jnp.float32)
            o_ref[0:8, 0:128] += jnp.sum(z) * 0.0
        return 0

    o_ref[:] = jnp.zeros_like(o_ref)
    for j in range(NSLOT - 1):
        dma(j, j).start()
    jax.lax.fori_loop(0, NBLK, body, 0)


def run_manual(w, x, ablate):
    return pl.pallas_call(
        functools.partial(manual_kernel, ablate=ablate),
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
    )(w.reshape(NBLK, TK, TN), x)


def bench(name, fn, *args):
    # axon tunnel: np.asarray is the only reliable sync; time a 1-vs-4
    # iteration difference to cancel dispatch+transfer overhead
    def go(n):
        r = None
        for _ in range(n):
            r = fn(*args)
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
    print(f"{name}: {dt*1e3:.2f} ms -> {gb/dt:.0f} GB/s", flush=True)


def main():
    w = jnp.array(np.random.randint(0, 255, (NBLK * TK, TN)), jnp.uint8)
    x = jnp.array(np.random.standard_normal((8, TK)), jnp.bfloat16)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "auto"):
        bench("auto  ", jax.jit(run_auto), w, x)
    if which in ("all", "manual"):
        bench("manual", jax.jit(functools.partial(run_manual, ablate=False)),
              w, x)
    if which in ("all", "nocomp"):
        bench("nocomp", jax.jit(functools.partial(run_manual, ablate=True)),
              w, x)


if __name__ == "__main__":
    main()
