"""Probe the 7B pack-only OOM: per-phase HBM accounting on the real chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def hbm(tag):
    d = jax.devices()[0]
    try:
        s = d.memory_stats()
        print(f"[{tag}] in_use={s['bytes_in_use']/2**30:.2f}GiB "
              f"peak={s.get('peak_bytes_in_use',0)/2**30:.2f}GiB "
              f"limit={s.get('bytes_limit',0)/2**30:.2f}GiB", flush=True)
    except Exception as e:
        print(f"[{tag}] memory_stats unavailable: {e}", flush=True)


def main():
    from mlx_vlm_tpu.utils.loader import load_model_from_weights
    from mlx_vlm_tpu.utils.testing import (
        int4_grouped_lm_weights, qwen2_vl_hf_weights, qwen2_vl_7b_config)

    hbm("start")
    cfg = qwen2_vl_7b_config()
    weights = qwen2_vl_hf_weights(cfg, zeros=True)
    weights = int4_grouped_lm_weights(weights)
    t0 = time.time()
    model = load_model_from_weights(cfg, weights, jnp.bfloat16,
                                    zeros_on_device=True)
    print(f"load {time.time()-t0:.1f}s", flush=True)
    hbm("after load")
    lp = model.params["language_model"]
    assert "fused_decode" in lp
    assert "layers" not in lp["model"], "expected pack-only"

    # sizes of each top-level param group
    def size(tree):
        return sum(x.nbytes for x in jax.tree_util.tree_leaves(tree)
                   if hasattr(x, "nbytes"))
    for k, v in model.params.items():
        print(f"  params[{k}] = {size(v)/2**30:.2f} GiB", flush=True)
    print(f"  pack = {size(lp['fused_decode'])/2**30:.2f} GiB", flush=True)

    # compile the prefill program and inspect its memory analysis
    from mlx_vlm_tpu.generate.ar import get_engine, make_cache
    engine = get_engine(model)
    D = cfg["hidden_size"]
    B, S = 1, 128
    capacity = 512
    cache = make_cache(model, B, capacity, jnp.bfloat16, None, 64)
    embeds = jnp.zeros((B, S, D), jnp.bfloat16)
    pos = jnp.zeros((3, B, S), jnp.int32)
    hbm("after cache")

    import dataclasses
    prefill_fn = None
    # reach the underlying jitted callable to use lower/compile
    lm = model.language_model
    from functools import partial

    @partial(jax.jit, donate_argnums=(1,))
    def prefill(params, cache, embeds, position_ids, last_idx):
        lm_params = params["language_model"]
        hidden, cache = lm(lm_params, embeds, cache, position_ids)
        h_last = jax.lax.dynamic_slice_in_dim(hidden, last_idx, 1, axis=1)
        logits = lm.logits(lm_params, h_last)[:, 0]
        return logits.astype(jnp.float32), cache

    t0 = time.time()
    lowered = prefill.lower(model.params, cache, embeds, pos, 0)
    compiled = lowered.compile()
    print(f"prefill compile {time.time()-t0:.1f}s", flush=True)
    try:
        ma = compiled.memory_analysis()
        print(f"prefill memory: args={ma.argument_size_in_bytes/2**30:.2f} "
              f"out={ma.output_size_in_bytes/2**30:.2f} "
              f"temp={ma.temp_size_in_bytes/2**30:.2f} "
              f"gen={ma.generated_code_size_in_bytes/2**20:.1f}MiB",
              flush=True)
    except Exception as e:
        print("memory_analysis failed:", e, flush=True)
    hbm("after prefill compile")

    out = compiled(model.params, cache, embeds, pos, 0)
    jax.block_until_ready(out)
    hbm("after prefill run")
    print("PREFILL OK", flush=True)


if __name__ == "__main__":
    main()


def decode_probe():
    """Compile + run the block-decode program and report its memory."""
    from mlx_vlm_tpu.utils.loader import load_model_from_weights
    from mlx_vlm_tpu.utils.testing import (
        int4_grouped_lm_weights, qwen2_vl_hf_weights, qwen2_vl_7b_config)
    from mlx_vlm_tpu.generate.ar import generate_step

    cfg = qwen2_vl_7b_config()
    weights = qwen2_vl_hf_weights(cfg, zeros=True)
    weights = int4_grouped_lm_weights(weights)
    model = load_model_from_weights(cfg, weights, jnp.bfloat16,
                                    zeros_on_device=True)
    D = cfg["hidden_size"]
    embeds = jnp.zeros((1, 128, D), jnp.bfloat16)
    t0 = time.time()
    n = 0
    for _ in generate_step(embeds, model, max_tokens=64,
                           prefill_step_size=128, block_size=32):
        n += 1
        if n == 1:
            print(f"first token {time.time()-t0:.1f}s", flush=True)
    print(f"warmup 64 tok OK {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    n = 0
    for _ in generate_step(embeds, model, max_tokens=320,
                           prefill_step_size=128, block_size=32):
        n += 1
    dt = time.time() - t0
    print(f"320 tok in {dt:.1f}s = {320/dt:.1f} tok/s", flush=True)
