"""Block-diffusion text generation (iterative demasking).

Role parity: reference mlx_vlm/generate/diffusion.py —
stream_diffusion_generate:539 (canvas decode with confidence-threshold and
count-scheduled transfer), is_diffusion_model:170.

TPU design: one jitted bidirectional forward over the static canvas per
refinement step; the transfer choice (which masked positions to commit) is
computed on device and the canvas is functionally updated — block by block,
left to right, `steps_per_block` refinements each.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Generator, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .common import GenerationResult, device_peak_memory_gb


def is_diffusion_model(model) -> bool:
    """Reference diffusion.py:170."""
    cfg = getattr(model, "config_dict", None) or {}
    if cfg.get("diffusion"):
        return True
    mt = cfg.get("model_type", getattr(model.config, "model_type", ""))
    return mt in ("llada", "llada2_moe", "diffusion_gemma", "nemotron_labs_diffusion")


def entropy_transfer_mask(entropy: jax.Array, open_mask: jax.Array,
                          entropy_bound: float) -> jax.Array:
    """Entropy-bound transfer selection (reference diffusion.py:415
    _diffusion_entropy_transfer_mask): sort open positions by token
    entropy and commit the largest prefix whose cumulative entropy stays
    within entropy_bound of its running maximum — low-entropy (confident)
    positions transfer together, high-entropy ones wait.  Always commits
    at least the minimum-entropy open position."""
    ent = jnp.where(open_mask, entropy, jnp.inf)
    order = jnp.argsort(ent, axis=-1)
    sorted_ent = jnp.take_along_axis(ent, order, axis=-1)
    finite = jnp.isfinite(sorted_ent)
    contrib = jnp.where(finite, sorted_ent, 0.0)
    cum = jnp.cumsum(contrib, axis=-1)
    cummax = jax.lax.associative_scan(jnp.maximum, contrib, axis=-1)
    sel_sorted = ((cum - cummax) <= entropy_bound) & finite
    # force at least one commit while anything is open
    sel_sorted = sel_sorted.at[:, 0].set(
        sel_sorted[:, 0] | jnp.any(open_mask, axis=-1))
    ranks = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(sel_sorted, ranks, axis=-1) & open_mask


def _make_step_fn(model, mask_token_id: int, sampler: str = "confidence",
                  entropy_bound: float = 0.1):
    @jax.jit
    def step(params, canvas, committed, n_transfer):
        """One refinement: predict all positions, then commit either the
        n_transfer most confident open positions (confidence-threshold
        sampler) or the entropy-bound prefix (reference :415)."""
        logits = model.forward_full(params, canvas).astype(jnp.float32)
        lp = jax.nn.log_softmax(logits, axis=-1)
        probs = jnp.exp(lp)
        pred = jnp.argmax(logits, axis=-1).astype(canvas.dtype)  # [B,S]
        masked = ~committed  # [B,S] bool — positions still open in the block
        if sampler == "entropy-bound":
            entropy = -jnp.sum(probs * lp, axis=-1)  # [B,S]
            take = entropy_transfer_mask(entropy, masked, entropy_bound)
        else:
            conf = jnp.max(probs, axis=-1)  # [B,S]
            conf = jnp.where(masked, conf, -jnp.inf)
            # commit the top-n_transfer confident masked positions
            order = jnp.argsort(-conf, axis=-1)
            ranks = jnp.argsort(order, axis=-1)
            take = (ranks < n_transfer) & masked
        canvas = jnp.where(take, pred, canvas)
        committed = committed | take
        return canvas, committed

    return step


def _make_edit_fn(model):
    @jax.jit
    def edit(params, canvas, editable, threshold):
        """Post-fill editing (reference llada2_moe language.py:613 /
        nemotron_labs_diffusion): rewrite already-committed canvas
        positions whose NEW prediction differs and clears the editing
        confidence threshold."""
        logits = model.forward_full(params, canvas).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        pred = jnp.argmax(logits, axis=-1).astype(canvas.dtype)
        conf = jnp.max(probs, axis=-1)
        edit = editable & (pred != canvas) & (conf > threshold)
        return jnp.where(edit, pred, canvas), edit.any()

    return edit


def stream_diffusion_generate(
    model,
    processor,
    prompt,
    max_tokens: int = 128,
    block_size: int = 32,
    steps_per_block: Optional[int] = None,
    mask_token_id: Optional[int] = None,
    diffusion_sampler: str = "confidence-threshold",
    entropy_bound: float = 0.1,
    editing_threshold: Optional[float] = None,
    max_post_steps: int = 4,
    **kwargs,
) -> Generator[GenerationResult, None, None]:
    """Reference diffusion.py:539 — block demasking with either the
    confidence-ranked or the entropy-bound transfer sampler."""
    from ..utils.processing import prepare_inputs
    from ..utils.tokenizer import make_detokenizer

    cfg = getattr(model, "config_dict", {}) or {}
    mask_id = mask_token_id or cfg.get("mask_token_id") or getattr(
        model.config, "mask_token_id", None
    )
    if mask_id is None:
        raise ValueError("diffusion generation needs mask_token_id")

    inputs = prepare_inputs(processor, prompt)
    ids = np.asarray(inputs["input_ids"])
    B, S = ids.shape
    assert B == 1
    steps_per_block = steps_per_block or max(1, block_size // 2)

    total = S + max_tokens
    canvas = np.full((B, total), mask_id, ids.dtype)
    canvas[:, :S] = ids
    canvas = jnp.asarray(canvas)
    sampler = ("entropy-bound"
               if diffusion_sampler in ("entropy-bound", "entropy")
               else "confidence")
    step_fn = _make_step_fn(model, mask_id, sampler=sampler,
                            entropy_bound=entropy_bound)
    edit_fn = (_make_edit_fn(model) if editing_threshold is not None
               else None)

    tic = time.perf_counter()
    tok = getattr(processor, "tokenizer", processor)
    detok = make_detokenizer(tok)
    emitted = 0
    n_blocks = (max_tokens + block_size - 1) // block_size
    for b in range(n_blocks):
        lo = S + b * block_size
        hi = min(lo + block_size, total)
        blk = hi - lo
        # committed = everything outside the open block
        committed = np.ones((B, total), bool)
        committed[:, lo:hi] = False
        committed_dev = jnp.asarray(committed)
        per_step = max(1, blk // steps_per_block)
        remaining = blk
        while remaining > 0:
            canvas, committed_dev = step_fn(
                model.params, canvas, committed_dev,
                jnp.asarray(min(per_step, remaining), jnp.int32)
            )
            if sampler == "entropy-bound":
                remaining = blk - int(
                    np.asarray(committed_dev[:, lo:hi]).sum())
            else:
                remaining -= min(per_step, remaining)
        if edit_fn is not None:
            # post-fill editing: re-open committed block tokens that the
            # model now contradicts with high confidence
            editable = np.zeros((B, total), bool)
            editable[:, lo:hi] = True
            editable_dev = jnp.asarray(editable)
            for _ in range(max_post_steps):
                canvas, changed = edit_fn(
                    model.params, canvas, editable_dev,
                    jnp.float32(editing_threshold))
                if not bool(changed):
                    break
        # emit the finished block
        block_tokens = np.asarray(canvas[0, lo:hi])
        for t in block_tokens:
            detok.add_token(int(t))
            emitted += 1
            now = time.perf_counter()
            yield GenerationResult(
                text=detok.last_segment(),
                token=int(t),
                logprobs=None,
                prompt_tokens=S,
                generation_tokens=emitted,
                prompt_tps=S / max(now - tic, 1e-9),
                generation_tps=emitted / max(now - tic, 1e-9),
                peak_memory=device_peak_memory_gb(),
                finish_reason="length" if emitted >= max_tokens else None,
            )


def diffusion_generate(model, processor, prompt, **kwargs) -> GenerationResult:
    pieces = []
    last = None
    for res in stream_diffusion_generate(model, processor, prompt, **kwargs):
        pieces.append(res.text)
        last = res
    if last is not None:
        last.text = "".join(pieces)
    return last
