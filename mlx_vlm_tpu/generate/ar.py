"""Autoregressive decode engine.

Role parity: reference `mlx_vlm/generate/ar.py` — generate_step:150 (chunked
prefill + double-buffered decode), `_step` closure:325.

TPU design:
- Prefill and decode are two jit-compiled programs with **static shapes**:
  prompts are padded to `prefill_step_size` multiples, the KV cache is a
  fixed-capacity buffer bucketed by total length, so repeat calls hit the
  XLA compile cache.
- Sampling and logits processing are traced *into* the decode program; the
  host loop only moves one int32 per step.
- Double buffering falls out of JAX async dispatch: the next step is
  enqueued before the previous token is read back (reference achieves this
  with mx.async_eval, ar.py:482-501).
"""

from __future__ import annotations

import dataclasses
import os
import time
import weakref
from functools import partial
from typing import Any, Callable, Generator, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.sampling import make_sampler
from .common import round_up

CACHE_BUCKET = 256
HISTORY_SIZE = 64  # ring of recent tokens for repetition/frequency penalties


def _pad_axis(x: np.ndarray, axis: int, target: int):
    pad = target - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths)


def _strip_fused_pack(params: dict) -> dict:
    """Shallow-copy params without the fused-decode weight pack.

    Only applies when the per-linear layer weights exist alongside the
    pack (MLX_VLM_TPU_KEEP_LAYERS=1 loads): prefill then never reads the
    pack, and keeping it out of the program's input set keeps ~4 GB (at
    7B) off the prefill live-buffer budget.  Pack-only loads (the
    default) MUST keep it — the pack is the only copy of the layer
    weights and prefill reconstructs them from its slices."""
    lp = params.get("language_model") if isinstance(params, dict) else None
    if not isinstance(lp, dict) or "fused_decode" not in lp:
        return params
    mdl = lp.get("model")
    if not (isinstance(mdl, dict) and "layers" in mdl):
        return params  # pack-only load: pack is the weights
    lp = dict(lp)
    lp.pop("fused_decode")
    out = dict(params)
    out["language_model"] = lp
    return out


class DecodeEngine:
    """Holds jitted prefill/decode programs for one model instance."""

    def __init__(self, model):
        # NOTE: no strong ref to `model` — the engine registry is weak-keyed
        self.lm = model.language_model

        @partial(jax.jit, donate_argnums=(1,), static_argnums=())
        def prefill(params, cache, embeds, position_ids, last_idx):
            lm_params = params["language_model"]
            hidden, cache = self.lm(lm_params, embeds, cache, position_ids)
            # logits only at `last_idx` (the final real token of the prompt,
            # which may land mid-chunk after padding)
            h_last = jax.lax.dynamic_slice_in_dim(hidden, last_idx, 1, axis=1)
            logits = self.lm.logits(lm_params, h_last)[:, 0]  # [B, V]
            return logits.astype(jnp.float32), cache

        self._prefill = lambda params, *a: prefill(
            _strip_fused_pack(params), *a)

        @partial(jax.jit, donate_argnums=(1,))
        def prefill_rows(params, cache, embeds, position_ids, last_idx):
            """Batched multi-prompt prefill: per-row last-token logits
            (reference PromptProcessingBatch, ar.py:1530). last_idx: [B]."""
            lm_params = params["language_model"]
            hidden, cache = self.lm(lm_params, embeds, cache, position_ids)
            h_last = jnp.take_along_axis(
                hidden, last_idx[:, None, None].astype(jnp.int32), axis=1
            )  # [B, 1, D]
            logits = self.lm.logits(lm_params, h_last)[:, 0]
            return logits.astype(jnp.float32), cache

        self._prefill_rows = lambda params, *a: prefill_rows(
            _strip_fused_pack(params), *a)
        self._steps = {}

    def decode_step_fn(
        self,
        sampler: Callable,
        processors: Tuple[Callable, ...],
    ):
        key_id = ("single", id(sampler), tuple(id(p) for p in processors))
        if key_id in self._steps:
            return self._steps[key_id]

        lm = self.lm

        @partial(jax.jit, donate_argnums=(1, 4))
        def step(params, cache, tok, rope_deltas, history, key):
            lm_params = params["language_model"]
            embeds = lm.embed(lm_params, tok[:, None])  # [B,1,D]
            B = tok.shape[0]
            pos = cache.offset + rope_deltas.reshape(-1)[:B]  # [B]
            position_ids = jnp.broadcast_to(pos[None, :, None], (3, B, 1))
            hidden, cache = lm(lm_params, embeds, cache, position_ids)
            logits = lm.logits(lm_params, hidden)[:, 0].astype(jnp.float32)
            for proc in processors:
                logits = proc(history, logits)
            logprobs = jax.nn.log_softmax(logits, axis=-1)
            key, sub = jax.random.split(key)
            nxt = sampler(logits, sub)
            history = jnp.concatenate([history[:, 1:], nxt[:, None]], axis=1)
            return nxt, logprobs, cache, history, key

        self._steps[key_id] = step
        return step

    def decode_block_fn(
        self,
        sampler: Callable,
        processors: Tuple[Callable, ...],
        block_size: int,
    ):
        """T decode steps fused into one program (lax.scan over steps).

        One dispatch + one host fetch per T tokens — essential when the chip
        sits behind a high-latency link, and cheaper host-side regardless.
        Returns (tokens [B,T], token_logprobs [B,T], cache, history, key).
        """
        key_id = ("block", block_size, id(sampler), tuple(id(p) for p in processors))
        if key_id in self._steps:
            return self._steps[key_id]

        lm = self.lm

        @partial(jax.jit, donate_argnums=(1, 4))
        def block(params, cache, tok, rope_deltas, history, key):
            lm_params = params["language_model"]
            B = tok.shape[0]
            deltas = rope_deltas.reshape(-1)[:B]

            def body(carry, _):
                cache, tok, history, key = carry
                embeds = lm.embed(lm_params, tok[:, None])
                pos = cache.offset + deltas
                position_ids = jnp.broadcast_to(pos[None, :, None], (3, B, 1))
                hidden, cache = lm(lm_params, embeds, cache, position_ids)
                logits = lm.logits(lm_params, hidden)[:, 0].astype(jnp.float32)
                for proc in processors:
                    logits = proc(history, logits)
                logprobs = jax.nn.log_softmax(logits, axis=-1)
                key, sub = jax.random.split(key)
                nxt = sampler(logits, sub)
                history = jnp.concatenate([history[:, 1:], nxt[:, None]], axis=1)
                chosen_lp = jnp.take_along_axis(logprobs, nxt[:, None], axis=-1)[:, 0]
                return (cache, nxt, history, key), (nxt, chosen_lp)

            (cache, tok, history, key), (toks, lps) = jax.lax.scan(
                body, (cache, tok, history, key), None, length=block_size
            )
            return toks.T, lps.T, cache, history, key  # [B,T]

        self._steps[key_id] = block
        return block


_ENGINES = weakref.WeakKeyDictionary()


def jitted_method(model, name: str):
    """Cached jitted bound method `model.<name>` (one wrapper per model).

    `jax.jit(model.get_input_embeddings)` at a call site retraces EVERY
    call — each attribute access makes a fresh bound method, so the jit
    cache never hits; on a 7B the repeated re-lowering dominated image
    TTFT.  The wrapper lives ON the model (a GC-collectable cycle), not in
    the weak-keyed engine registry, which must hold no strong model refs."""
    cache = getattr(model, "_jit_methods", None)
    if cache is None:
        cache = {}
        model._jit_methods = cache
    fn = cache.get(name)
    if fn is None:
        fn = cache[name] = jax.jit(getattr(model, name))
    return fn


def embed_fn(model):
    """Cached jitted multimodal embed program (see jitted_method)."""
    return jitted_method(model, "get_input_embeddings")


def get_engine(model) -> DecodeEngine:
    """Engine per model instance; weak keys so dropping the model frees its
    params and compiled programs (an id()-keyed dict pinned every model —
    and its HBM weights — for the process lifetime)."""
    eng = _ENGINES.get(model)
    if eng is None:
        eng = _ENGINES[model] = DecodeEngine(model)
    return eng


def make_cache(
    model,
    batch_size: int,
    capacity: int,
    dtype,
    kv_bits: Optional[int] = None,
    kv_group_size: int = 64,
    per_row: bool = False,
):
    """Cache factory (reference ar.py:724 `_make_cache` + kv-quant policy
    common.py:505 `maybe_quantize_kv_cache`)."""
    from ..core import cache as cache_lib

    lm = model.language_model
    if getattr(lm, "owns_cache_factory", False):
        # model-specific cache layouts (e.g. minimax side index-key buffer)
        # construct their own quantized variants
        return lm.init_cache(
            batch_size, capacity, dtype,
            kv_bits=int(kv_bits) if kv_bits else None,
            kv_group_size=kv_group_size,
        )
    if kv_bits and (
        float(kv_bits) != int(kv_bits)
        or os.environ.get("MLX_VLM_TPU_KV_SCHEME") == "turboquant"
    ):
        # explicit turboquant at 4 bits + pow-2 head dim: rotation + the
        # FUSED packed-domain int4 attend (exact orthogonal-rotation
        # identity; core/turboquant.py RotatedInt4KVCache)
        hd = lm.head_dim
        if float(kv_bits) == 4.0 and hd & (hd - 1) == 0:
            from ..core.turboquant import make_rotated_int4_cache

            return make_rotated_int4_cache(
                lm.args.num_hidden_layers, batch_size, lm.n_kv_heads, hd,
                capacity, per_row=per_row,
            )
        # fractional bits -> rotation+codebook cache
        # (reference turboquant_enabled, turboquant.py:3511); the split
        # scheme spends the fraction per CHANNEL instead of K-vs-V
        # (reference _SplitCodec outlier split)
        if (float(kv_bits) != int(kv_bits)
                and os.environ.get("MLX_VLM_TPU_TQ_SCHEME") == "split"):
            from ..core.turboquant import init_turboquant_split_cache

            return init_turboquant_split_cache(
                lm.args.num_hidden_layers, batch_size, lm.n_kv_heads,
                lm.head_dim, capacity, kv_bits=float(kv_bits),
            )
        from ..core.turboquant import init_turboquant_cache

        return init_turboquant_cache(
            lm.args.num_hidden_layers, batch_size, lm.n_kv_heads, lm.head_dim,
            capacity, kv_bits=float(kv_bits),
        )
    if kv_bits == 8 and os.environ.get(
        "MLX_VLM_TPU_KV_SCHEME", "int8"
    ) != "affine":
        # fused integer-domain attend at the int8 bandwidth roofline
        # (group-affine dequant can't fuse; see Int8KVCache docstring)
        return cache_lib.init_int8_cache(
            lm.args.num_hidden_layers, batch_size, lm.n_kv_heads, lm.head_dim,
            capacity, per_row=per_row,
        )
    if kv_bits == 4 and os.environ.get(
        "MLX_VLM_TPU_KV_SCHEME", "int4"
    ) != "affine" and lm.head_dim % 2 == 0:
        # fused packed-domain attend: 4-bit KV halves decode READ traffic
        # (group-affine dequantizes the whole cache per step; see
        # Int4KVCache docstring / ops/int4_kv_attention.py)
        return cache_lib.init_int4_cache(
            lm.args.num_hidden_layers, batch_size, lm.n_kv_heads, lm.head_dim,
            capacity, per_row=per_row,
        )
    if kv_bits:
        return cache_lib.init_quantized_cache(
            lm.args.num_hidden_layers, batch_size, lm.n_kv_heads, lm.head_dim,
            capacity, dtype, bits=kv_bits, group_size=kv_group_size,
            per_row=per_row,
        )
    return lm.init_cache(batch_size, capacity, dtype)


def generate_step(
    inputs_embeds: jax.Array,  # [B, S, D]
    model,
    *,
    position_ids: Optional[np.ndarray] = None,  # [3, B, S]
    rope_deltas: Optional[np.ndarray] = None,  # [B, 1]
    max_tokens: int = 256,
    sampler: Optional[Callable] = None,
    logits_processors: Optional[List[Callable]] = None,
    prefill_step_size: int = 512,
    kv_capacity: Optional[int] = None,
    seed: Optional[int] = None,
    block_size: int = 32,
    kv_bits: Optional[int] = None,
    kv_group_size: int = 64,
    prompt_cache=None,
    prefix_len: int = 0,
    prompt_cache_callback: Optional[Callable] = None,
    prompt_progress_callback: Optional[Callable] = None,
) -> Generator[Tuple[np.ndarray, np.ndarray], None, None]:
    """Yield (token [B] int, chosen-token logprob [B]) pairs.

    Reference: generate_step ar.py:150. The prompt embeddings must already
    contain merged vision features.  `block_size` decode steps are fused into
    a single device program (one dispatch/fetch per block) — the TPU
    equivalent of the reference's async double buffering, sized for
    high-latency links.
    """
    params = model.params
    engine = get_engine(model)
    B, S, _ = inputs_embeds.shape

    if position_ids is None:
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (B, S))
        position_ids = np.broadcast_to(pos[None], (3, B, S))
    if rope_deltas is None:
        rope_deltas = np.zeros((B, 1), np.int32)
    rope_deltas = jnp.asarray(np.asarray(rope_deltas).astype(np.int32))

    block_size = max(1, min(block_size, max_tokens))
    if prompt_cache is not None:
        cache = prompt_cache
        capacity = cache.capacity
    else:
        prefix_len = 0
        capacity = kv_capacity or round_up(
            S + max_tokens + block_size + 1, CACHE_BUCKET
        )
        cache = make_cache(
            model, B, capacity, inputs_embeds.dtype, kv_bits, kv_group_size
        )

    # ---- chunked prefill over the uncached suffix (reference ar.py:420-456;
    # APC warm prefixes land via prompt_cache with offset=prefix_len)
    suffix = S - prefix_len
    if getattr(model, "no_chunked_prefill", False):
        # models whose prefill mask/positions depend on the WHOLE prompt
        # (e.g. falcon_ocr image-block bidirectional mask) run one chunk
        prefill_step_size = max(prefill_step_size, suffix)
    step_sz = min(prefill_step_size, round_up(suffix, CACHE_BUCKET))
    S_pad = round_up(suffix, step_sz)
    # padded writes must fit the buffer past the warm prefix — a clamped
    # dynamic_update_slice would silently overwrite cached rows
    while prefix_len + S_pad > capacity and step_sz > 64:
        step_sz = max(64, step_sz // 2)
        S_pad = round_up(suffix, step_sz)
    if prefix_len + S_pad > capacity:
        raise ValueError(
            f"kv capacity {capacity} too small for prefix {prefix_len} + "
            f"padded suffix {S_pad}"
        )
    embeds = jnp.asarray(inputs_embeds)[:, prefix_len:]
    if S_pad != suffix:
        embeds = jnp.pad(embeds, ((0, 0), (0, S_pad - suffix), (0, 0)))
    pos_pad = _pad_axis(
        np.asarray(position_ids, np.int32)[:, :, prefix_len:], 2, S_pad
    )

    logits = None
    last_global = suffix - 1
    for c0 in range(0, S_pad, step_sz):
        chunk = jax.lax.dynamic_slice_in_dim(embeds, c0, step_sz, axis=1)
        pchunk = jnp.asarray(pos_pad[:, :, c0 : c0 + step_sz])
        in_chunk = c0 <= last_global < c0 + step_sz
        last_idx = last_global - c0 if in_chunk else 0
        lgts, cache = engine._prefill(params, cache, chunk, pchunk, last_idx)
        if in_chunk:
            logits = lgts
        if prompt_progress_callback:
            prompt_progress_callback(prefix_len + min(c0 + step_sz, suffix), S)
    # fix the write cursor to the true prompt length (padding wrote garbage
    # beyond S which stays masked because offset <= true length)
    cache = dataclasses.replace(cache, offset=jnp.asarray(S, jnp.int32))
    if prompt_cache_callback is not None:
        prompt_cache_callback(cache)

    sampler = sampler or make_sampler()
    processors = tuple(logits_processors or ())
    blk_fn = engine.decode_block_fn(sampler, processors, block_size)

    key = jax.random.PRNGKey(seed if seed is not None else int(time.time_ns() % 2**31))
    history = -jnp.ones((B, HISTORY_SIZE), jnp.int32)

    logprobs0 = jax.nn.log_softmax(logits, axis=-1)
    key, sub = jax.random.split(key)
    tok = sampler(logits, sub)
    history = jnp.concatenate([history[:, 1:], tok[:, None]], axis=1)
    lp0 = jnp.take_along_axis(logprobs0, tok[:, None], axis=-1)[:, 0]

    # ---- block-decode loop; dispatch block k+1 before fetching block k
    if max_tokens <= 0:
        return
    n = 1
    yield np.asarray(tok), np.asarray(lp0)
    tok_dev = tok
    prev = None
    remaining = max_tokens - 1
    n_blocks = (remaining + block_size - 1) // block_size
    for b in range(n_blocks + 1):
        if b < n_blocks:
            toks, lps, cache, history, key = blk_fn(
                params, cache, tok_dev, rope_deltas, history, key
            )
            tok_dev = toks[:, -1]
        else:
            toks = None
        if prev is not None:
            p_toks, p_lps = np.asarray(prev[0]), np.asarray(prev[1])
            for i in range(p_toks.shape[1]):
                if n >= max_tokens:
                    return
                yield p_toks[:, i], p_lps[:, i]
                n += 1
        prev = (toks, lps) if toks is not None else None
