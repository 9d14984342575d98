"""Probe 7B prefill matmul paths on the real chip.

Times one 512-row grouped-int4 matmul per 7B linear shape through:
  - the new M-tiled Pallas kernel (ops/int4_matvec._int4_matmul route)
  - the old XLA dequant path (core/quant.int4_grouped_matmul)
and a full 28-layer prefill chunk through the pack-scan forward.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from mlx_vlm_tpu.core.quant import (
    quantize, to_int4_grouped, int4_grouped_matmul)
from mlx_vlm_tpu.ops.int4_matvec import int4_matvec


def timeit(fn, n=10):
    fn()  # compile
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    D, I = 3584, 18944
    M = 512
    rng = np.random.default_rng(0)
    shapes = {
        "qkv": (D + 512 + 512, D),
        "o": (D, D),
        "gate_up": (2 * I, D),
        "down": (D, I),
    }
    x_by_k = {}
    total_new = total_old = 0.0
    for name, (N, K) in shapes.items():
        w = np.zeros((N, K), np.float32)
        t = jax.tree_util.tree_map(
            jnp.asarray,
            to_int4_grouped(quantize(jnp.asarray(w), bits=4, group_size=64)))
        if K not in x_by_k:
            x_by_k[K] = jnp.asarray(
                rng.standard_normal((M, K)).astype(np.float32),
                jnp.bfloat16)
        x = x_by_k[K]
        t_new = timeit(lambda: int4_matvec(x, t))
        t_old = timeit(lambda: int4_grouped_matmul(x, t), n=3)
        flops = 2 * M * N * K
        print(f"{name:8s} N={N:6d} K={K:6d}  new {t_new*1e3:7.2f} ms "
              f"({flops/t_new/1e12:6.1f} TF/s)   old {t_old*1e3:7.2f} ms "
              f"({flops/t_old/1e12:6.1f} TF/s)")
        total_new += t_new
        total_old += t_old
    print(f"per-layer linears: new {total_new*1e3:.2f} ms, "
          f"old {total_old*1e3:.2f} ms -> x28 layers: "
          f"new {total_new*28*1e3:.0f} ms, old {total_old*28*1e3:.0f} ms")


if __name__ == "__main__":
    main()
