"""Tunnel-safe timing of the M-tiled int4 prefill matmul.

Runs the kernel in a data-dependent fori_loop chain over stacked layers
(like a real prefill forward); per-iter cost = slope between 4 and 24
trips, mirroring tools/probe_mm_baseline.py.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from mlx_vlm_tpu.core.quant import quantize, to_int4_grouped
from mlx_vlm_tpu.ops.int4_matvec import int4_matvec, Int4GroupedTensor


def stack_layers(w, L, g=64):
    t = to_int4_grouped(quantize(jnp.asarray(w), bits=4, group_size=g))
    return Int4GroupedTensor(
        qp=jnp.broadcast_to(t.qp, (L, *t.qp.shape)).copy(),
        sl=jnp.broadcast_to(t.sl, (L, *t.sl.shape)).copy(),
        sh=jnp.broadcast_to(t.sh, (L, *t.sh.shape)).copy(),
        bl=jnp.broadcast_to(t.bl, (L, *t.bl.shape)).copy(),
        bh=jnp.broadcast_to(t.bh, (L, *t.bh.shape)).copy(),
        n=t.n, group_size=g, out_dtype=t.out_dtype)


def chain_time(x0, t, back, L, trips=(4, 24)):
    compiled = {}
    for k in trips:
        def f(x, t, back, k=k):
            def body(i, y):
                z = int4_matvec(y, t, i % L)
                return (z @ back) * jnp.bfloat16(0.01)
            return jax.lax.fori_loop(0, k, body, x)
        compiled[k] = jax.jit(f).lower(x0, t, back).compile()
        np.asarray(compiled[k](x0, t, back))
    best = {}
    for k in trips:
        b = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(compiled[k](x0, t, back))
            b = min(b, time.perf_counter() - t0)
        best[k] = b
    return (best[trips[1]] - best[trips[0]]) / (trips[1] - trips[0])


def main():
    D, I = 3584, 18944
    L = 4
    rng = np.random.default_rng(0)
    for M in (512, 1024):
        shapes = {
            "qkv": (D + 512 + 512, D),
            "o": (D, D),
            "gate_up": (2 * I, D),
            "down": (D, I),
        }
        tot = 0.0
        for name, (N, K) in shapes.items():
            w = (rng.standard_normal((N, K)) * 0.02).astype(np.float32)
            t = stack_layers(w, L)
            x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
            back = jnp.asarray(
                rng.standard_normal((N, K)) * 0.001, jnp.bfloat16)
            # back-projection cost measured separately and subtracted
            def g(x, back):
                def body(i, y):
                    return ((y @ back.T) @ back) * jnp.bfloat16(0.01)
                return jax.lax.fori_loop(0, 24, body, x)
            per = chain_time(x, t, back, L)
            flops = 2 * M * N * K
            print(f"M={M} {name:8s} N={N:6d} K={K:6d}  {per*1e3:7.3f} ms "
                  f"({flops/per/1e12:6.1f} TF/s incl back-mm)", flush=True)
            tot += per
        print(f"M={M} per-layer(+back) {tot*1e3:.2f} ms -> x28 "
              f"{tot*28*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
