"""Does XLA:TPU handle native int4 arrays efficiently in a dequant+matvec?

Compares effective bandwidth of a 7B-layer-sized stack of matvecs:
  u8pack — current unpack-from-uint8 XLA path
  u4     — jnp.uint4 weights, inline astype(bf16) dequant
  i8     — int8 per-channel (the w8chan baseline, 2x bytes)
Timing: lax.scan chain difference (tunnel-safe).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import time
import functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

K, N, L, g = 3584, 4608 + 3584 + 2 * 18944 + 3584, 28, 64  # all linears folded
# treat the whole layer as one [K, N] matvec per layer for bandwidth purposes
gt = K // g

VARIANT = os.environ.get("PROBE_VARIANT", "u4")


def main():
    rng = np.random.default_rng(0)
    if VARIANT == "u8pack":
        qp = jnp.array(rng.integers(0, 255, (L, K, N // 2)), jnp.uint8)
        sc = jnp.array(rng.standard_normal((L, gt, 1, N // 2)) * 0.01,
                       jnp.bfloat16)
        nbytes = qp.nbytes + 2 * sc.nbytes

        def mv(x, l):
            q = qp[l].astype(jnp.int32)
            lo = (q & 0xF).astype(jnp.bfloat16).reshape(K // g, g, N // 2)
            hi = (q >> 4).astype(jnp.bfloat16).reshape(K // g, g, N // 2)
            w = jnp.concatenate(
                [(lo * sc[l]).reshape(K, N // 2),
                 (hi * sc[l]).reshape(K, N // 2)], axis=-1)
            return (x @ w)[:, :K]
    elif VARIANT == "u4":
        w4 = jnp.array(rng.integers(0, 15, (L, K, N)), jnp.uint8
                       ).astype(jnp.uint4)
        sc = jnp.array(rng.standard_normal((L, gt, 1, N)) * 0.01,
                       jnp.bfloat16)
        nbytes = w4.size * L // (2 * L) * 2 // 1 // 1  # 0.5 B/elem
        nbytes = w4.size // 2 + sc.nbytes

        def mv(x, l):
            w = w4[l].astype(jnp.bfloat16).reshape(K // g, g, N)
            w = (w * sc[l]).reshape(K, N)
            return (x @ w)[:, :K]
    else:  # i8
        w8 = jnp.array(rng.integers(-127, 127, (L, K, N)), jnp.int8)
        sc = jnp.array(rng.standard_normal((L, 1, N)) * 0.01, jnp.bfloat16)

        nbytes = w8.nbytes + sc.nbytes

        def mv(x, l):
            w = w8[l].astype(jnp.bfloat16) * sc[l]
            return (x @ w)[:, :K]

    x0 = jnp.array(rng.standard_normal((1, K)), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=0)
    def run(n, x):
        def step(h, _):
            def layer(h, l):
                y = mv(h, l)
                return jnp.tanh(y) * 0.1 + h, None
            h, _ = jax.lax.scan(layer, h, jnp.arange(L))
            return h, None
        h, _ = jax.lax.scan(step, x, None, length=n)
        return h[0, 0]

    def go(n):
        return float(np.asarray(run(n, x0)))

    t0 = time.time(); go(1)
    print(f"compile {time.time()-t0:.0f}s", flush=True)
    ts = {}
    for n in (1, 5):
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter(); go(n)
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    dt = (ts[5] - ts[1]) / 4
    print(f"{VARIANT}: {dt*1e3:.3f} ms/step for {nbytes/1e9:.2f} GB "
          f"-> {nbytes/dt/1e9:.0f} GB/s ({1/dt:.0f} steps/s)", flush=True)


if __name__ == "__main__":
    main()
