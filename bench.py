"""Benchmark harness — prints ONE JSON line with the headline metric.

Runs on the session's real accelerator (TPU v5e via axon).

Headline: single-stream decode tokens/sec on Qwen2-VL-7B dims with 4-bit
weights in the runtime layout (per-channel int8; the bare int8->bf16
convert fuses into the XLA matvec at HBM roofline — see core/quant.py
ChannelQuantizedTensor; ops/int4_matvec.py documents why true int4
decode loses on this stack).  This is the
BASELINE.json north-star config (Qwen2-VL-7B-4bit on one chip).

Baseline: mlx-vlm on an M3 Ultra decodes Qwen2-VL-7B-4bit at roughly
~100 tok/s single-stream (estimate: 819 GB/s unified-memory roofline over
~4.3 GB of 4-bit weights at mlx's measured ~55% matvec efficiency; no
published number exists).  vs_baseline = value / 100.0.

Extras carry the 2B variants (int4-runtime + bf16) and a 1k-token prefill
TTFT measurement.
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

BASELINE_7B_INT4_TPS = 100.0
BLOCK = 32


def build_model(cfg, quantized: bool):
    from mlx_vlm_tpu.utils.loader import load_model_from_weights
    from mlx_vlm_tpu.utils.testing import (
        channel_quantize_lm_weights,
        qwen2_vl_hf_weights,
    )

    weights = qwen2_vl_hf_weights(cfg, zeros=True)
    if quantized:
        weights = channel_quantize_lm_weights(weights)
    model = load_model_from_weights(
        cfg, weights, jnp.bfloat16, zeros_on_device=True
    )
    return model


def measure(model, cfg, *, s_prompt=128, n_decode=320):
    """(decode_tps, prefill_tps, ttft_s) for one prompt length."""
    from mlx_vlm_tpu.generate.ar import generate_step

    D = cfg["hidden_size"]
    embeds = jnp.zeros((1, s_prompt, D), jnp.bfloat16)

    # warmup/compile at the same shapes
    for _ in generate_step(
        embeds, model, max_tokens=2 * BLOCK, prefill_step_size=128,
        block_size=BLOCK,
    ):
        pass

    t0 = time.time()
    gen = generate_step(
        embeds, model, max_tokens=n_decode, prefill_step_size=128,
        block_size=BLOCK,
    )
    next(gen)
    ttft = time.time() - t0
    stamps = [time.time()]
    for _ in gen:
        stamps.append(time.time())
    n = len(stamps) - 1
    half = n // 2
    decode_tps = (n - half) / (stamps[-1] - stamps[half])
    prefill_tps = s_prompt / ttft
    return decode_tps, prefill_tps, ttft


def main():
    from mlx_vlm_tpu.utils.testing import qwen2_vl_2b_config, qwen2_vl_7b_config

    extras = {"device": str(jax.devices()[0])}

    t0 = time.time()
    cfg7 = qwen2_vl_7b_config()
    model7 = build_model(cfg7, quantized=True)
    extras["build_7b_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    tps7, prefill7, _ = measure(model7, cfg7)
    extras["bench_7b_s"] = round(time.time() - t0, 1)

    # 1k-token prompt: prefill throughput + TTFT (north-star second metric)
    _, prefill_1k, ttft_1k = measure(model7, cfg7, s_prompt=1024, n_decode=8)
    extras["prefill_tps_7b_1k"] = round(prefill_1k, 1)
    extras["ttft_7b_1k_s"] = round(ttft_1k, 3)
    del model7

    cfg2 = qwen2_vl_2b_config()
    model2 = build_model(cfg2, quantized=True)
    tps2q, _, _ = measure(model2, cfg2)
    extras["decode_tps_qwen2vl_2b_int4_b1"] = round(tps2q, 1)
    del model2
    # 2B bf16 reference (same harness, r01): 220.5 tok/s decode

    result = {
        "metric": "decode_tps_qwen2vl_7b_int4_b1",
        "value": round(tps7, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps7 / BASELINE_7B_INT4_TPS, 3),
        "extras": extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
