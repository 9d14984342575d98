"""Benchmark harness — prints ONE JSON line with the headline metric.

Runs on whatever the session's real accelerator is (TPU v5e via axon).
Metric: single-stream decode tokens/sec on Qwen2-VL-2B dims (bf16, random
weights — decode throughput is weight-value independent).

Baseline: the reference (mlx-vlm on Apple Silicon M3 Ultra) decodes
Qwen2-VL-2B bf16 at roughly ~100 tok/s single-stream (estimate derived from
README-class numbers in BASELINE.md; the driver's north star is 2x the
reference per chip).  vs_baseline = value / 100.0.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_DECODE_TPS = 100.0
BLOCK = 32


def main():
    from mlx_vlm_tpu.generate.ar import generate_step
    from mlx_vlm_tpu.utils.loader import load_model_from_weights
    from mlx_vlm_tpu.utils.testing import qwen2_vl_2b_config, qwen2_vl_hf_weights

    cfg = qwen2_vl_2b_config()

    t0 = time.time()
    # zero-filled weights materialized on device: same FLOPs/bandwidth as
    # real weights, no multi-GB host->device transfer over the tunnel
    weights = qwen2_vl_hf_weights(cfg, zeros=True)
    model = load_model_from_weights(cfg, weights, jnp.bfloat16, zeros_on_device=True)
    del weights
    build_s = time.time() - t0

    B, S_prompt, n_decode = 1, 128, 320
    D = cfg["hidden_size"]
    embeds = jnp.zeros((B, S_prompt, D), jnp.bfloat16)

    # warmup: compile prefill + decode block (same shapes as the timed run)
    t0 = time.time()
    gen = generate_step(
        embeds, model, max_tokens=2 * BLOCK, prefill_step_size=128, block_size=BLOCK
    )
    for _ in gen:
        pass
    compile_s = time.time() - t0

    # timed prefill
    t0 = time.time()
    gen = generate_step(
        embeds, model, max_tokens=n_decode, prefill_step_size=128, block_size=BLOCK
    )
    first = next(gen)
    prefill_s = time.time() - t0

    # timed decode: steady state = second half (first blocks pay tunnel /
    # donation warmup)
    stamps = [time.time()]
    for _ in gen:
        stamps.append(time.time())
    n = len(stamps) - 1
    half = n // 2
    decode_tps = (n - half) / (stamps[-1] - stamps[half])
    prefill_tps = S_prompt / prefill_s

    result = {
        "metric": "decode_tps_qwen2vl_2b_bf16_b1",
        "value": round(decode_tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(decode_tps / BASELINE_DECODE_TPS, 3),
        "extras": {
            "prefill_tps": round(prefill_tps, 1),
            "compile_s": round(compile_s, 1),
            "build_s": round(build_s, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
