"""Replicate generate_step's exact body with per-stage blocking."""
import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from mlx_vlm_tpu.utils.loader import load_model_from_weights
    from mlx_vlm_tpu.utils.testing import (
        int4_grouped_lm_weights, qwen2_vl_hf_weights, qwen2_vl_7b_config)
    from mlx_vlm_tpu.generate.ar import (
        get_engine, make_cache, round_up, CACHE_BUCKET, HISTORY_SIZE,
        _pad_axis)
    from mlx_vlm_tpu.core.sampling import make_sampler

    cfg = qwen2_vl_7b_config()
    weights = qwen2_vl_hf_weights(cfg, zeros=True)
    weights = int4_grouped_lm_weights(weights)
    model = load_model_from_weights(cfg, weights, jnp.bfloat16,
                                    zeros_on_device=True)
    print("loaded", flush=True)

    inputs_embeds = jnp.zeros((1, 128, cfg["hidden_size"]), jnp.bfloat16)
    max_tokens, prefill_step_size, block_size = 64, 128, 32

    params = model.params
    engine = get_engine(model)
    B, S, _ = inputs_embeds.shape
    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (B, S))
    position_ids = np.broadcast_to(pos[None], (3, B, S))
    rope_deltas = jnp.asarray(np.zeros((B, 1), np.int32))

    block_size = max(1, min(block_size, max_tokens))
    prefix_len = 0
    capacity = round_up(S + max_tokens + block_size + 1, CACHE_BUCKET)
    print("capacity", capacity, flush=True)
    cache = make_cache(model, B, capacity, inputs_embeds.dtype, None, 64)
    jax.block_until_ready(cache.k)
    print("cache ok", flush=True)

    suffix = S - prefix_len
    step_sz = min(prefill_step_size, round_up(suffix, CACHE_BUCKET))
    S_pad = round_up(suffix, step_sz)
    print("step_sz", step_sz, "S_pad", S_pad, flush=True)
    embeds = jnp.asarray(inputs_embeds)[:, prefix_len:]
    if S_pad != suffix:
        embeds = jnp.pad(embeds, ((0, 0), (0, S_pad - suffix), (0, 0)))
    pos_pad = _pad_axis(
        np.asarray(position_ids, np.int32)[:, :, prefix_len:], 2, S_pad)

    logits = None
    last_global = suffix - 1
    for c0 in range(0, S_pad, step_sz):
        chunk = jax.lax.dynamic_slice_in_dim(embeds, c0, step_sz, axis=1)
        pchunk = jnp.asarray(pos_pad[:, :, c0:c0 + step_sz])
        in_chunk = c0 <= last_global < c0 + step_sz
        last_idx = last_global - c0 if in_chunk else 0
        lgts, cache = engine._prefill(params, cache, chunk, pchunk, last_idx)
        if in_chunk:
            logits = lgts
        jax.block_until_ready(lgts)
        print(f"prefill chunk {c0} ok", flush=True)

    cache = dataclasses.replace(cache, offset=jnp.asarray(S, jnp.int32))
    sampler = make_sampler()
    blk_fn = engine.decode_block_fn(sampler, (), block_size)

    key = jax.random.PRNGKey(0)
    history = -jnp.ones((B, HISTORY_SIZE), jnp.int32)

    logprobs0 = jax.nn.log_softmax(logits, axis=-1)
    key, sub = jax.random.split(key)
    tok = sampler(logits, sub)
    jax.block_until_ready(tok)
    print("sample0 ok", flush=True)
    history = jnp.concatenate([history[:, 1:], tok[:, None]], axis=1)
    lp0 = jnp.take_along_axis(logprobs0, tok[:, None], axis=-1)[:, 0]
    print("tok:", np.asarray(tok), "lp:", np.asarray(lp0), flush=True)

    t0 = time.time()
    toks, lps, cache, history, key = blk_fn(
        params, cache, tok, rope_deltas, history, key)
    jax.block_until_ready(toks)
    print(f"block0 ok {time.time()-t0:.1f}s", flush=True)
    for _ in range(3):
        t0 = time.time()
        toks, lps, cache, history, key = blk_fn(
            params, cache, toks[:, -1], rope_deltas, history, key)
        jax.block_until_ready(toks)
        dt = time.time() - t0
        print(f"block 32: {dt*1000:.1f} ms = {32/dt:.1f} tok/s", flush=True)


if __name__ == "__main__":
    main()
