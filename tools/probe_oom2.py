"""Stage-by-stage bisect of the 7B pack-only OOM inside generate_step."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from mlx_vlm_tpu.utils.loader import load_model_from_weights
    from mlx_vlm_tpu.utils.testing import (
        int4_grouped_lm_weights, qwen2_vl_hf_weights, qwen2_vl_7b_config)
    from mlx_vlm_tpu.generate.ar import get_engine, make_cache
    from mlx_vlm_tpu.core.sampling import make_sampler

    cfg = qwen2_vl_7b_config()
    weights = qwen2_vl_hf_weights(cfg, zeros=True)
    weights = int4_grouped_lm_weights(weights)
    model = load_model_from_weights(cfg, weights, jnp.bfloat16,
                                    zeros_on_device=True)
    print("loaded", flush=True)
    engine = get_engine(model)
    D = cfg["hidden_size"]
    B = 1
    capacity = 256
    cache = make_cache(model, B, capacity, jnp.bfloat16, None, 64)
    embeds = jnp.zeros((B, 128, D), jnp.bfloat16)
    pos = jnp.zeros((3, B, 128), jnp.int32)
    t0 = time.time()
    logits, cache = engine._prefill(model.params, cache, embeds, pos, 127)
    jax.block_until_ready(logits)
    print(f"prefill ok {time.time()-t0:.1f}s", flush=True)

    import dataclasses
    cache = dataclasses.replace(cache, offset=jnp.asarray(128, jnp.int32))
    sampler = make_sampler()
    blk_fn = engine.decode_block_fn(sampler, (), 32)
    tok = jnp.zeros((B,), jnp.int32)
    rope_deltas = jnp.zeros((B, 1), jnp.int32)
    history = -jnp.ones((B, 64), jnp.int32)
    key = jax.random.PRNGKey(0)

    # lower+compile to get memory analysis BEFORE running
    t0 = time.time()
    jitted = engine._steps[("block", 32, id(sampler), ())]
    lowered = jitted.lower(model.params, cache, tok, rope_deltas, history, key)
    compiled = lowered.compile()
    print(f"block compile {time.time()-t0:.1f}s", flush=True)
    try:
        ma = compiled.memory_analysis()
        print(f"block memory: args={ma.argument_size_in_bytes/2**30:.2f} "
              f"out={ma.output_size_in_bytes/2**30:.2f} "
              f"temp={ma.temp_size_in_bytes/2**30:.2f} "
              f"alias={ma.alias_size_in_bytes/2**30:.2f}", flush=True)
    except Exception as e:
        print("memory_analysis failed:", e, flush=True)

    t0 = time.time()
    out = compiled(model.params, cache, tok, rope_deltas, history, key)
    jax.block_until_ready(out)
    print(f"block run ok {time.time()-t0:.2f}s", flush=True)
    toks, lps, cache, history, key = out
    # steady state timing
    for _ in range(3):
        t0 = time.time()
        toks, lps, cache, history, key = compiled(
            model.params, cache, toks[:, -1], rope_deltas, history, key)
        jax.block_until_ready(toks)
        dt = time.time() - t0
        print(f"block 32 tok: {dt*1000:.1f} ms = {32/dt:.1f} tok/s",
              flush=True)


if __name__ == "__main__":
    main()
