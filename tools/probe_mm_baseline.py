"""Baseline: plain bf16 XLA matmul timings for 7B prefill shapes.

axon-tunnel safe timing: the matmul chain runs inside ONE jitted
fori_loop (data-dependent, so nothing can be elided or overlapped away),
sync via np.asarray fetch, per-iter cost = slope between 4 and 24 loop
trips.  Weights are jit arguments, not constants (remote-compile payload
limit).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def chain_time(x0, w, w2, trips=(4, 24)):
    def run(k):
        def body(i, y):
            return ((y @ w_) @ w2_) * jnp.bfloat16(0.01)
        return None

    compiled = {}
    for k in trips:
        def f(x, wa, wb, k=k):
            def body(i, y):
                return ((y @ wa) @ wb) * jnp.bfloat16(0.01)
            return jax.lax.fori_loop(0, k, body, x)
        compiled[k] = jax.jit(f).lower(x0, w, w2).compile()
        np.asarray(compiled[k](x0, w, w2))

    best = {}
    for k in trips:
        b = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(compiled[k](x0, w, w2))
            b = min(b, time.perf_counter() - t0)
        best[k] = b
    return (best[trips[1]] - best[trips[0]]) / (trips[1] - trips[0]) / 2


def main():
    D, I = 3584, 18944
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
            x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
            w = jnp.asarray(rng.standard_normal((K, N)) * 0.01, jnp.bfloat16)
            w2 = jnp.asarray(rng.standard_normal((N, K)) * 0.01, jnp.bfloat16)
            t = chain_time(x, w, w2)
            flops = 2 * M * N * K
            print(f"M={M} {name:8s} N={N:6d} K={K:6d}  {t*1e3:7.3f} ms "
                  f"({flops/t/1e12:6.1f} TF/s)", flush=True)
            tot += t
        print(f"M={M} per-layer {tot*1e3:.2f} ms -> x28 {tot*28*1e3:.0f} ms",
              flush=True)


if __name__ == "__main__":
    main()
