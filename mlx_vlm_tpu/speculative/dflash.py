"""DFlash speculative decoding round loop.

Role parity: reference mlx_vlm/speculative/dflash.py — _dflash_rounds:75
(draft -> verify -> walk -> rollback), adaptive block sizing:16, hidden
segment carry:66.

TPU design: draft is ONE non-autoregressive forward (the whole block at
once), verify is the shared captured-forward program, and both cache
rollbacks are cursor rewinds on fixed-capacity buffers (no tensor trims,
no recompiles across rounds; block-size changes select between at most
three cached programs).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Generator, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..generate.ar import CACHE_BUCKET, make_cache
from ..generate.common import round_up
from .drafters.dflash import DFlashDrafter, next_block_size
from .utils import SpecStats


@dataclasses.dataclass
class DFlashStats(SpecStats):
    """SpecStats + the recent (accepted, drafted) window the adaptive
    block-size policy reads (reference accept_lens/draft_lens)."""

    def __post_init__(self):
        self.recent: list = []

    def record(self, accepted: int, drafted: int):
        self.rounds += 1
        self.drafted += drafted
        self.accepted += accepted
        self.recent.append((accepted, drafted))


def dflash_generate_step(
    inputs_embeds: jax.Array,  # [1, S, D]
    model,
    drafter: DFlashDrafter,
    drafter_params: dict,
    *,
    max_tokens: int = 256,
    draft_block_size: Optional[int] = None,
    adaptive: bool = True,
    stats: Optional[DFlashStats] = None,
) -> Generator[Tuple[np.ndarray, np.ndarray], None, None]:
    """Greedy DFlash speculative decoding, B=1 (reference dflash.py:75).

    Lossless: output equals plain greedy decoding of the target model.
    Requires the target's language model to implement `forward_captured`.
    """
    stats = stats if stats is not None else DFlashStats()
    params = model.params
    lm = model.language_model
    B, S, _ = inputs_embeds.shape
    assert B == 1, "dflash path is single-stream"
    ceiling = draft_block_size or drafter.config.block_size
    capacity = round_up(S + max_tokens + ceiling + 2, CACHE_BUCKET)
    cache = make_cache(model, B, capacity, inputs_embeds.dtype)
    d_cache = drafter.init_cache(B, capacity, inputs_embeds.dtype)

    @partial(jax.jit, donate_argnums=(1,))
    def prefill_captured(p, cache, embeds, pos):
        lp = p["language_model"]
        hidden, cache, hiddens = lm.forward_captured(lp, embeds, cache, pos)
        logits = lm.logits(lp, hidden)[:, -1].astype(jnp.float32)
        return logits, cache, drafter.fuse_ctx(hiddens)

    def make_verify(k: int):
        @partial(jax.jit, donate_argnums=(1,))
        def verify(p, cache, prev_tok, draft_toks):
            lp = p["language_model"]
            seq = jnp.concatenate([prev_tok[:, None], draft_toks], axis=1)
            embeds = lm.embed(lp, seq)
            pos = cache.offset + jnp.arange(k + 1)[None, None, :]
            pos = jnp.broadcast_to(pos, (3, B, k + 1)).astype(jnp.int32)
            hidden, cache, hiddens = lm.forward_captured(
                lp, embeds, cache, pos)
            logits = lm.logits(lp, hidden).astype(jnp.float32)
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            match = greedy[:, :k] == draft_toks
            # n_acc in 0..k — full k+1 commit with the bonus token
            n_acc = jnp.argmin(
                jnp.concatenate([match, jnp.zeros((B, 1), bool)],
                                axis=1).astype(jnp.int32), axis=1)
            idx = jnp.arange(k + 1)[None, :]
            out = jnp.where(idx < n_acc[:, None],
                            jnp.pad(draft_toks, ((0, 0), (0, 1))), 0)
            bonus = jnp.take_along_axis(greedy, n_acc[:, None], axis=1)[:, 0]
            out = jnp.where(idx == n_acc[:, None], bonus[:, None], out)
            cache = dataclasses.replace(
                cache, offset=cache.offset - (k + 1) + jnp.max(n_acc) + 1)
            return out, n_acc, drafter.fuse_ctx(hiddens), cache

        return verify

    verify_fns: dict = {}

    # --- target prefill with capture; prompt hiddens seed the drafter ctx
    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, B, S)).copy()
    logits, cache, ctx = prefill_captured(
        params, cache, jnp.asarray(inputs_embeds), jnp.asarray(pos))
    append = drafter.append_fn(S)
    d_cache = append(drafter_params, d_cache, ctx,
                     jnp.asarray(S, jnp.int32))

    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    yield np.asarray(tok), np.zeros((B,), np.float32)
    n = 1

    while n < max_tokens:
        bs = (next_block_size(stats, ceiling, max_tokens - n + 1)
              if adaptive else min(ceiling, max_tokens - n + 1))
        if bs <= 1:
            bs = 2
        k = bs - 1
        draft = drafter.draft_fn(lm, bs)
        if k not in verify_fns:
            verify_fns[k] = make_verify(k)
        d_toks = draft(params, drafter_params, d_cache, tok)
        out, n_acc, feats, cache = verify_fns[k](params, cache, tok, d_toks)
        out_h = np.asarray(out)
        n_acc_h = int(np.asarray(n_acc)[0])
        stats.record(n_acc_h, k)
        committed = out_h[0, : n_acc_h + 1]
        # drafter context: hiddens of [prev_bonus, d1..d_{n_acc}] are the
        # committed-context rows (reference hidden[:, :accepted+1])
        d_cache = drafter.append_fn(k + 1)(
            drafter_params, d_cache, feats,
            jnp.asarray(n_acc_h + 1, jnp.int32))
        for t in committed:
            if n >= max_tokens:
                break
            yield np.asarray([t]), np.zeros((B,), np.float32)
            n += 1
        tok = jnp.asarray([int(committed[-1])], jnp.int32)
