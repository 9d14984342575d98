"""Microbenchmark: where does the int4 decode step spend its time?

Times (a) empty Pallas launch, (b) current fused qmm per matmul shape of
Qwen2-VL-2B at M=1, (c) XLA dequant matmul, (d) fused qkv / gate+up shapes.
All timing is done inside one jit program (lax.scan over INNER iterations);
weights are passed as arguments (NOT closure constants — those get baked
into the program and re-shipped per call over the tunnel).

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 580 python tools/bench_qmm.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from mlx_vlm_tpu.core.quant import quantize, dequantize, QuantizedTensor
from mlx_vlm_tpu.ops.qmatmul import quantized_matmul_pallas

INNER = 1000
_FLOOR = [0.0]  # tunnel/program-dispatch floor per run() call, measured once


def _run_once(fn2, x, *ws):
    @jax.jit
    def run(x, *ws):
        def body(carry, _):
            y = fn2(carry, *ws)
            # tanh blocks the reduce-of-dot algebraic rewrite (sum(x@W.T)
            # -> x@sum(W)) that would let XLA hoist the matmul entirely
            carry = carry + (jnp.tanh(y).sum() * 1e-30).astype(carry.dtype)
            return carry, ()

        out, _ = jax.lax.scan(body, x, None, length=INNER)
        return out

    r = run(x, *ws)
    jax.block_until_ready(r)
    np.asarray(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        # bind the result: an anonymous temp can be GC'd and the tunneled
        # axon execution silently skipped -> ~0 us readings
        r = run(x, *ws)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best


def timeit(fn2, x, *ws):
    """fn2(x, *ws) -> y; per-iteration time of INNER chained applications
    inside one jit, with the per-program tunnel floor subtracted."""
    if not _FLOOR[0]:
        z = jnp.zeros((1, 128), jnp.float32)
        _FLOOR[0] = _run_once(lambda c: c * 1.0000001, z)
        print(f"program floor: {_FLOOR[0]*1e3:.2f} ms/call "
              f"({_FLOOR[0]/INNER*1e6:.2f} us/iter)")
    return max(_run_once(fn2, x, *ws) - _FLOOR[0], 0.0) / INNER


def empty_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def bench_empty():
    x = jnp.zeros((8, 128), jnp.float32)

    def f(x):
        return pl.pallas_call(
            empty_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)

    t = timeit(f, x)
    print(f"empty pallas launch: {t*1e6:9.1f} us")


SHAPES = {
    "q_proj": (1536, 1536),
    "kv_proj": (256, 1536),
    "o_proj": (1536, 1536),
    "gate_up_single": (8960, 1536),
    "down": (1536, 8960),
    "qkv_fused": (2048, 1536),
    "gateup_fused": (17920, 1536),
    "lm_head": (151936, 1536),
}


def main():
    print("device:", jax.devices()[0])
    bench_empty()

    rng = np.random.default_rng(0)
    results = {}
    for name, (N, K) in SHAPES.items():
        w = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)
        t4 = quantize(w, bits=4, group_size=64)
        x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)

        def pallas_path(xx, q, s, b):
            t = QuantizedTensor(q=q, scales=s, biases=b, bits=4,
                                group_size=64, out_dtype="bfloat16")
            return quantized_matmul_pallas(xx, t)

        tp = timeit(pallas_path, x, t4.q, t4.scales, t4.biases)

        def xla_path(xx, q, s, b):
            t = QuantizedTensor(q=q, scales=s, biases=b, bits=4,
                                group_size=64, out_dtype="bfloat16")
            wd = dequantize(t, jnp.bfloat16)
            return jax.lax.dot_general(
                xx, wd, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(xx.dtype)

        tx = timeit(xla_path, x, t4.q, t4.scales, t4.biases)

        def bf16_path(xx, ww):
            return jax.lax.dot_general(
                xx, ww, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(xx.dtype)

        tb = timeit(bf16_path, x, w)

        ideal = (N * K / 2) / 819e9  # packed bytes / HBM BW
        results[name] = (tp, tx, tb)
        print(
            f"{name:16s} N={N:6d} K={K:5d}  pallas {tp*1e6:8.1f} us"
            f"  xla-dq {tx*1e6:8.1f} us  bf16 {tb*1e6:8.1f} us"
            f"  ideal-int4 {ideal*1e6:7.1f} us"
        )

    L = 28
    for label, idx in (("pallas", 0), ("xla-dq", 1), ("bf16", 2)):
        per_layer_split = (
            results["q_proj"][idx]
            + 2 * results["kv_proj"][idx]
            + results["o_proj"][idx]
            + 2 * results["gate_up_single"][idx]
            + results["down"][idx]
        )
        per_layer_fused = (
            results["qkv_fused"][idx]
            + results["o_proj"][idx]
            + results["gateup_fused"][idx]
            + results["down"][idx]
        )
        tot_split = L * per_layer_split + results["lm_head"][idx]
        tot_fused = L * per_layer_fused + results["lm_head"][idx]
        print(
            f"model-matmul/token [{label:7s}]: split {tot_split*1e3:7.2f} ms"
            f" ({1/tot_split:6.0f} tok/s cap) | fused {tot_fused*1e3:7.2f} ms"
            f" ({1/tot_fused:6.0f} tok/s cap)"
        )


if __name__ == "__main__":
    main()
