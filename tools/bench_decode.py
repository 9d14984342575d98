"""Device-side decode-block timing for the 7B north-star config.

Usage: python tools/bench_decode.py [w4grp|w8chan] [2b|7b]

Times the jitted 32-step decode block via slope fitting (immune to the
~6 ms axon dispatch RTT), reports ms/token and tok/s.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
mode = sys.argv[1] if len(sys.argv) > 1 else "w4grp"
size = sys.argv[2] if len(sys.argv) > 2 else "7b"
os.environ["MLX_VLM_TPU_RUNTIME_QUANT"] = mode

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from mlx_vlm_tpu.utils.loader import load_model_from_weights
    from mlx_vlm_tpu.utils.testing import (
        channel_quantize_lm_weights,
        int4_grouped_lm_weights,
        qwen2_vl_2b_config,
        qwen2_vl_7b_config,
    )
    from mlx_vlm_tpu.generate.ar import get_engine, make_cache
    from mlx_vlm_tpu.core.sampling import make_sampler

    cfg = qwen2_vl_7b_config() if size == "7b" else qwen2_vl_2b_config()
    weights = qwen2_vl_hf = None
    from mlx_vlm_tpu.utils.testing import qwen2_vl_hf_weights
    t0 = time.time()
    weights = qwen2_vl_hf_weights(cfg, zeros=True)
    if mode == "w4grp":
        weights = int4_grouped_lm_weights(weights)
    else:
        weights = channel_quantize_lm_weights(weights)
    model = load_model_from_weights(cfg, weights, jnp.bfloat16,
                                    zeros_on_device=True)
    print(f"build: {time.time()-t0:.1f}s", flush=True)

    engine = get_engine(model)
    B, BLOCK = 1, 32
    capacity = 512
    cache = make_cache(model, B, capacity, jnp.bfloat16)
    import dataclasses
    cache = dataclasses.replace(cache, offset=jnp.asarray(128, jnp.int32))
    sampler = make_sampler()
    blk = engine.decode_block_fn(sampler, (), BLOCK)

    params = model.params
    tok = jnp.zeros((B,), jnp.int32)
    deltas = jnp.zeros((B, 1), jnp.int32)
    history = -jnp.ones((B, 64), jnp.int32)
    key = jax.random.PRNGKey(0)

    # blk donates cache+history; rebuild a fresh pair per call.
    def run(n):
        c = dataclasses.replace(
            cache,
            k=jnp.copy(cache.k),
            v=jnp.copy(cache.v),
            left_pad=jnp.copy(cache.left_pad),
            offset=jnp.asarray(128, jnp.int32),
        )
        h = -jnp.ones((B, 64), jnp.int32)
        k, t = key, tok
        for i in range(n):
            if os.environ.get("BD_SYNC"):
                print(f"  call {i}...", flush=True)
            toks, lps, c, h, k = blk(params, c, t, deltas, h, k)
            t = toks[:, -1]
            if os.environ.get("BD_SYNC"):
                jax.block_until_ready(toks)
                print(f"  call {i} ok", flush=True)
        np.asarray(jax.block_until_ready(toks))

    t0 = time.time(); run(1); print(f"compile+run: {time.time()-t0:.1f}s",
                                    flush=True)
    times = {}
    for n in (2, 8):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            run(n)
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per_block = (times[8] - times[2]) / 6
    per_tok = per_block / BLOCK
    print(f"mode={mode} size={size}: {per_tok*1e3:.3f} ms/tok -> "
          f"{1/per_tok:.1f} tok/s (device-side, block={BLOCK})", flush=True)


if __name__ == "__main__":
    main()
