"""Time per-tile compute variants for the fused decode kernel (no DMA).

Variants (PROBE_VARIANT env):
  bf16   — current _mv math: f32 dequant (scale+bias) -> 2 bf16 dots
  grp    — unrolled per-group bf16 dots (scale+bias applied on outputs)
  i8grp  — unrolled per-group int8 dots with in-kernel per-group activation
           quantization (W4A8), scale on int32 outputs
  i8big  — unpack to i8 + one big int8 dot (no scales) — speed ceiling

Tile: [K=3584, TN=512] u8 (two nibble planes), M=8, g=64.
Kernel loops R times over the SAME VMEM tile; a loop-carried dependency on
the accumulator prevents hoisting.
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

K, TN, M, g = 3584, 512, 8, 64
gt = K // g
R = 64

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


def kern(q_ref, sc_ref, x_ref, o_ref):
    dims = (((1,), (0,)), ((), ()))
    r = pl.program_id(0)

    if True:
        # real per-step dependence so nothing hoists across grid steps:
        # dynamic sublane offset on q, value-changing scale on x
        x = x_ref[:] * (1.0 + 0.001 * r.astype(jnp.float32))  # [M, K] f32
        sc = f16_to_f32(sc_ref[:])         # [gt, 4, TN] f32
        q = q_ref[pl.ds(8 * jax.lax.rem(r, 2), K)]
        qi = q.astype(jnp.int32)
        if VARIANT == "bf16":
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
            lo = (qi & 0xF).astype(jnp.bfloat16)      # [K, TN]
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
                xs = jnp.sum(x[:, sl_], axis=1, keepdims=True)  # [M,1]
                y = (y + zlo * sc[j, 0:1] + zhi * sc[j, 1:2]
                     + xs * (sc[j, 2:3] + sc[j, 3:4]))
        elif VARIANT == "i8grp":
            lo = (qi & 0xF).astype(jnp.int8)
            hi = (qi >> 4).astype(jnp.int8)
            y = jnp.zeros((M, TN), jnp.float32)
            for j in range(gt):
                sl_ = slice(j * g, (j + 1) * g)
                xg = x[:, sl_]                       # [M, g] f32
                ax = jnp.max(jnp.abs(xg), axis=1, keepdims=True)  # [M,1]
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
        else:  # i8big
            lo = (qi & 0xF).astype(jnp.int8)
            hi = (qi >> 4).astype(jnp.int8)
            xq = jnp.round(x * 0.1).astype(jnp.int8)
            zlo = jax.lax.dot_general(xq, lo, dims,
                                      preferred_element_type=jnp.int32)
            zhi = jax.lax.dot_general(xq, hi, dims,
                                      preferred_element_type=jnp.int32)
            y = (zlo + zhi).astype(jnp.float32) * sc[0, 0:1]

    @pl.when(r == 0)
    def _():
        o_ref[:] = jnp.zeros((M, TN), jnp.float32)
    o_ref[:] += y


def main():
    rng = np.random.default_rng(0)
    qn = rng.integers(0, 255, (K + 8, TN)).astype(np.uint8)
    q = jnp.array(qn)
    scf = jnp.array(rng.standard_normal((gt, 4, TN)) * 0.01, jnp.float16)
    sc = jax.lax.bitcast_convert_type(scf, jnp.uint16)
    xn = rng.standard_normal((M, K)).astype(np.float32)
    x = jnp.array(xn)

    fn = pl.pallas_call(
        kern,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((K + 8, TN), lambda r: (0, 0)),
            pl.BlockSpec((gt, 4, TN), lambda r: (0, 0, 0)),
            pl.BlockSpec((M, K), lambda r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, TN), lambda r: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, TN), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    jfn = jax.jit(fn)
    t0 = time.time()
    out = jax.block_until_ready(jfn(q, sc, x))
    print(f"compile {time.time()-t0:.0f}s", flush=True)
    best = float("inf")
    for _ in range(20):
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(q, sc, x))
        best = min(best, time.perf_counter() - t0)
    per_tile = best / R
    nbytes = q.nbytes
    full = 3.67e9 / nbytes * per_tile
    print(f"{VARIANT}: {per_tile*1e6:.1f} us/tile "
          f"-> {nbytes/per_tile/1e9:.0f} GB/s eq; 7B stack {full*1e3:.2f} ms",
          flush=True)

    if False:
        qi = qn.astype(np.int32)
        lo = (qi & 0xF).astype(np.float32).reshape(gt, g, TN)
        hi = (qi >> 4).astype(np.float32).reshape(gt, g, TN)
        scn = np.asarray(scf, np.float32)
        wl = (lo * scn[:, 0:1, :] + scn[:, 2:3, :]).reshape(K, TN)
        wh = (hi * scn[:, 1:2, :] + scn[:, 3:4, :]).reshape(K, TN)
        ref = xn @ wl + xn @ wh
        got = np.asarray(out) / R
        err = np.max(np.abs(got - ref) / (np.abs(ref) + 1e-2))
        print(f"{VARIANT} rel err vs exact affine: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
