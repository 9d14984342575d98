"""Samplers and logits processors (jit-compatible).

Role parity: reference `mlx_vlm/sample_utils.py` — make_sampler:10
(temperature, top-p, min-p, top-k, top-n-sigma, typical-p, xtc),
make_logits_processors:92 (logit bias, repetition/presence/frequency
penalties with context windows), top_p_sampling:478.

TPU design: every sampler is a pure function `(logits[B,V], key) -> [B]`
composed once at setup and traced into the decode-step program, so sampling
runs on-device inside the same compiled step as the forward pass.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "make_sampler", "make_logits_processors", "top_p_sampling",
    "make_batched_sampler", "batched_filter_logits", "batched_filtered_probs",
]

_NEG_INF = -jnp.inf


def _apply_top_k(logits: jax.Array, top_k: int) -> jax.Array:
    vals, _ = jax.lax.top_k(logits, top_k)
    thresh = vals[..., -1:]
    return jnp.where(logits < thresh, _NEG_INF, logits)


def _apply_top_p(logits: jax.Array, top_p: float) -> jax.Array:
    """Nucleus filtering on sorted probabilities (reference sample_utils.py:478)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while cumulative prob (exclusive) < top_p
    keep_sorted = (cum - probs) < top_p
    # threshold = smallest logit kept
    masked = jnp.where(keep_sorted, sorted_logits, jnp.inf)
    thresh = jnp.min(masked, axis=-1, keepdims=True)
    return jnp.where(logits < thresh, _NEG_INF, logits)


def _apply_min_p(logits: jax.Array, min_p: float) -> jax.Array:
    probs = jax.nn.softmax(logits, axis=-1)
    pmax = jnp.max(probs, axis=-1, keepdims=True)
    return jnp.where(probs < min_p * pmax, _NEG_INF, logits)


def _apply_top_n_sigma(logits: jax.Array, n_sigma: float) -> jax.Array:
    mx = jnp.max(logits, axis=-1, keepdims=True)
    finite = jnp.isfinite(logits)
    mean = jnp.mean(jnp.where(finite, logits, 0), axis=-1, keepdims=True)
    std = jnp.std(jnp.where(finite, logits, 0), axis=-1, keepdims=True)
    return jnp.where(logits < mx - n_sigma * std, _NEG_INF, logits)


def _apply_typical_p(logits: jax.Array, typical_p: float) -> jax.Array:
    """Locally-typical sampling: keep tokens whose surprisal is closest to
    the distribution entropy until mass >= typical_p."""
    lp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(lp)
    ent = -jnp.sum(p * jnp.where(jnp.isfinite(lp), lp, 0.0), axis=-1, keepdims=True)
    dev = jnp.abs(-lp - ent)
    order = jnp.argsort(dev, axis=-1)
    p_sorted = jnp.take_along_axis(p, order, axis=-1)
    cum = jnp.cumsum(p_sorted, axis=-1)
    keep_sorted = (cum - p_sorted) < typical_p
    ranks = jnp.argsort(order, axis=-1)
    keep = jnp.take_along_axis(keep_sorted, ranks, axis=-1)
    return jnp.where(keep, logits, _NEG_INF)


def _apply_xtc(logits: jax.Array, probability: float, threshold: float,
               key: jax.Array) -> jax.Array:
    """Exclude-top-choices (reference sample_utils.py:349): with probability
    p, drop every token above `threshold` except the least likely of them."""
    p = jax.nn.softmax(logits, axis=-1)
    above = p >= threshold
    n_above = jnp.sum(above, axis=-1, keepdims=True)
    # least-likely above-threshold token keeps its place
    masked_p = jnp.where(above, p, jnp.inf)
    min_above = jnp.min(masked_p, axis=-1, keepdims=True)
    drop = above & (p > min_above)
    fire = jax.random.uniform(key, (logits.shape[0], 1)) < probability
    drop = drop & fire & (n_above > 1)
    return jnp.where(drop, _NEG_INF, logits)


def make_sampler(
    temp: float = 0.0,
    top_p: float = 0.0,
    min_p: float = 0.0,
    top_k: int = -1,
    top_n_sigma: float = -1.0,
    typical_p: float = 0.0,
    xtc_probability: float = 0.0,
    xtc_threshold: float = 0.1,
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Build `(logprobs[B,V], key) -> tokens[B] int32`.

    Filters compose in the reference's order (sample_utils.py:10): top_k ->
    top_n_sigma -> top_p -> min_p -> typical_p -> xtc, then temperature-
    scaled categorical draw.
    """

    def sample(logits: jax.Array, key: jax.Array) -> jax.Array:
        if temp == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        x = logits.astype(jnp.float32)
        if top_k > 0:
            x = _apply_top_k(x, top_k)
        if top_n_sigma > 0:
            x = _apply_top_n_sigma(x, top_n_sigma)
        if top_p > 0.0 and top_p < 1.0:
            x = _apply_top_p(x, top_p)
        if min_p > 0.0:
            x = _apply_min_p(x, min_p)
        if typical_p > 0.0 and typical_p < 1.0:
            x = _apply_typical_p(x, typical_p)
        if xtc_probability > 0.0:
            key, sub = jax.random.split(key)
            x = _apply_xtc(x, xtc_probability, xtc_threshold, sub)
        return jax.random.categorical(key, x / temp, axis=-1).astype(jnp.int32)

    return sample


def top_p_sampling(logits, top_p, temperature, key):
    return make_sampler(temp=temperature, top_p=top_p)(logits, key)


def make_batched_sampler():
    """Per-row-parameterized sampler for continuous batching.

    Returns `(logits [B,V], params, key) -> tokens [B]` where params is a dict
    of [B] arrays: temp, top_p, min_p, top_k (<=0 disables).  Rows with
    temp==0 decode greedily.  All filters are vectorized over rows so one
    compiled program serves any mix of requests (reference keeps per-request
    samplers host-side, ar.py:87).
    """

    def sample(logits: jax.Array, params: dict, key: jax.Array) -> jax.Array:
        x = logits.astype(jnp.float32)
        filtered = batched_filter_logits(x, params)
        temp = params["temp"].reshape(-1, 1)
        safe_temp = jnp.where(temp > 0, temp, 1.0)
        drawn = jax.random.categorical(key, filtered / safe_temp, axis=-1)
        greedy = jnp.argmax(x, axis=-1)
        return jnp.where(temp.reshape(-1) > 0, drawn, greedy).astype(jnp.int32)

    return sample


def batched_filter_logits(x: jax.Array, params: dict) -> jax.Array:
    """Apply per-row top-k/top-p/min-p filters (no temperature draw).

    x: [B, V] f32 logits; params: dict of [B] arrays as in
    make_batched_sampler.  Returns filtered logits with -inf holes."""
    B, V = x.shape
    top_p = params["top_p"].reshape(B, 1)
    min_p = params["min_p"].reshape(B, 1)
    top_k = params["top_k"].reshape(B, 1)

    order = jnp.argsort(-x, axis=-1)
    sorted_x = jnp.take_along_axis(x, order, axis=-1)
    ranks = jnp.argsort(order, axis=-1)  # rank of each vocab entry

    # top-k: keep rank < k (k<=0 disables)
    keep = (top_k <= 0) | (ranks < top_k)
    # top-p on sorted probs
    probs_sorted = jax.nn.softmax(sorted_x, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    keep_sorted = (cum - probs_sorted) < jnp.where(top_p > 0, top_p, 1.0)
    keep &= jnp.take_along_axis(keep_sorted, ranks, axis=-1)
    # min-p
    probs = jax.nn.softmax(x, axis=-1)
    pmax = probs.max(axis=-1, keepdims=True)
    keep &= (min_p <= 0) | (probs >= min_p * pmax)

    return jnp.where(keep, x, _NEG_INF)


def batched_filtered_probs(logits: jax.Array, params: dict) -> jax.Array:
    """Per-row filtered token distributions for rejection sampling
    (reference speculative/common.py:135 uses the same processed
    distributions on both draft and target sides).

    logits: [B, T, V]; params: dict of [B] arrays.  Rows with temp==0
    return a one-hot argmax distribution, so the speculative rejection
    walk reduces exactly to greedy token matching."""
    B, T, V = logits.shape
    x = logits.astype(jnp.float32).reshape(B * T, V)
    rep = {k: jnp.repeat(v, T) for k, v in params.items()}
    filtered = batched_filter_logits(x, rep)
    temp = rep["temp"].reshape(-1, 1)
    safe_temp = jnp.where(temp > 0, temp, 1.0)
    soft = jax.nn.softmax(filtered / safe_temp, axis=-1)
    onehot = (
        jnp.arange(V, dtype=jnp.int32)[None, :]
        == jnp.argmax(x, axis=-1, keepdims=True)
    ).astype(jnp.float32)
    return jnp.where(temp > 0, soft, onehot).reshape(B, T, V)


def make_logits_processors(
    logit_bias: Optional[dict] = None,
    repetition_penalty: Optional[float] = None,
    repetition_context_size: int = 20,
    presence_penalty: Optional[float] = None,
    frequency_penalty: Optional[float] = None,
):
    """Build jit-compatible processors `(history[B,W] int32, logits[B,V]) -> logits`.

    `history` is a fixed-width ring of the last W generated tokens, padded
    with -1.  Reference: sample_utils.py:92-477.
    """
    processors = []

    if logit_bias:
        ids = jnp.asarray(list(logit_bias.keys()), jnp.int32)
        vals = jnp.asarray(list(logit_bias.values()), jnp.float32)

        def bias_proc(history, logits):
            return logits.at[..., ids].add(vals.astype(logits.dtype))

        processors.append(bias_proc)

    if repetition_penalty and repetition_penalty != 1.0:
        w = repetition_context_size

        def rep_proc(history, logits):
            hist = history[:, -w:]
            valid = hist >= 0
            safe = jnp.where(valid, hist, 0)
            B, V = logits.shape
            onehot = jax.nn.one_hot(safe, V, dtype=jnp.bool_) & valid[..., None]
            seen = jnp.any(onehot, axis=1)  # [B, V]
            lf = logits.astype(jnp.float32)
            penalized = jnp.where(
                lf < 0, lf * repetition_penalty, lf / repetition_penalty
            )
            return jnp.where(seen, penalized, lf).astype(logits.dtype)

        processors.append(rep_proc)

    if presence_penalty or frequency_penalty:
        pp = presence_penalty or 0.0
        fp = frequency_penalty or 0.0

        def freq_proc(history, logits):
            valid = history >= 0
            safe = jnp.where(valid, history, 0)
            B, V = logits.shape
            counts = jnp.zeros((B, V), jnp.float32)
            onehot = jax.nn.one_hot(safe, V, dtype=jnp.float32) * valid[..., None]
            counts = jnp.sum(onehot, axis=1)
            lf = logits.astype(jnp.float32)
            lf = lf - fp * counts - pp * (counts > 0)
            return lf.astype(logits.dtype)

        processors.append(freq_proc)

    return processors
