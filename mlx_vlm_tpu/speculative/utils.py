"""Speculative decoding: draft k tokens, verify in one target forward.

Role parity: reference mlx_vlm/speculative/ — run_speculative_rounds
(utils.py:215), rejection walks (common.py:135), drafter loading
(drafters/__init__.py), engine hookup (generate/ar.py:465-480).

TPU design:
- Draft + verify are two jit programs with static block size; the whole
  round (k draft steps, one [k+1]-token target forward, acceptance walk,
  cursor rollback) runs on device, returning (tokens, n_accepted).
- Rollback is free: fixed-capacity caches rewind by moving the write cursor
  back — stale K/V past the cursor is masked (keep j <= offset+i) and gets
  overwritten by the next round.  The reference must trim/rollback cache
  tensors explicitly (mtp.py:430, turboquant.py:3845).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable, Generator, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..generate.ar import CACHE_BUCKET, get_engine, make_cache
from ..generate.common import round_up


def run_speculative_rounds(*args, **kwargs):
    """Alias for the generator API (reference speculative/utils.py:215)."""
    return speculative_generate_step(*args, **kwargs)


def eagle3_generate_step(
    inputs_embeds: jax.Array,  # [1, S, D]
    model,
    drafter,  # drafters.eagle3.Eagle3Drafter
    drafter_params: dict,
    *,
    max_tokens: int = 256,
    num_draft: int = 4,
    stats=None,
):
    """EAGLE-3-style speculative decoding (reference eagle3.py:344).

    The target runs `forward_captured` so every verify forward also yields
    the layer stack; the drafter consumes the fused capture at the last
    committed position and autoregresses its own single layer.  Greedy and
    lossless (the verify walk only commits target-greedy tokens).  v1 keeps
    the drafter cache cold at prompt start (no drafter prompt prefill) —
    acceptance ramps over the first rounds.
    """
    from ..generate.common import round_up

    stats = stats if stats is not None else SpecStats()
    params = model.params
    lm = model.language_model
    B, S, _ = inputs_embeds.shape
    assert B == 1
    k = num_draft
    capacity = round_up(S + max_tokens + k + 2, CACHE_BUCKET)
    cache = make_cache(model, B, capacity, inputs_embeds.dtype)
    d_cache = drafter.init_cache(B, capacity, inputs_embeds.dtype)

    @partial(jax.jit, donate_argnums=(1,))
    def prefill_captured(p, cache, embeds, pos):
        lp = p["language_model"]
        hidden, cache, hiddens = lm.forward_captured(lp, embeds, cache, pos)
        logits = lm.logits(lp, hidden)[:, -1].astype(jnp.float32)
        return logits, cache, hiddens

    @partial(jax.jit, donate_argnums=(1,))
    def verify_captured(p, cache, prev_tok, draft_toks):
        lp = p["language_model"]
        seq = jnp.concatenate([prev_tok[:, None], draft_toks], axis=1)
        embeds = lm.embed(lp, seq)
        pos = cache.offset + jnp.arange(k + 1)[None, None, :]
        pos = jnp.broadcast_to(pos, (3, B, k + 1)).astype(jnp.int32)
        hidden, cache, hiddens = lm.forward_captured(lp, embeds, cache, pos)
        logits = lm.logits(lp, hidden).astype(jnp.float32)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        match = greedy[:, :k] == draft_toks
        n_acc = jnp.argmin(
            jnp.concatenate([match, jnp.zeros((B, 1), bool)], 1).astype(jnp.int32),
            axis=1,
        )
        n_acc = jnp.minimum(n_acc, k - 1)
        idx = jnp.arange(k + 1)[None, :]
        out = jnp.where(
            idx < n_acc[:, None], jnp.pad(draft_toks, ((0, 0), (0, 1))), 0
        )
        bonus = jnp.take_along_axis(greedy, n_acc[:, None], axis=1)[:, 0]
        out = jnp.where(idx == n_acc[:, None], bonus[:, None], out)
        # feature for the next round: fused capture at the last accepted pos
        feats = drafter.fuse_features(drafter_params, hiddens)  # [B, k+1, D]
        feat = jnp.take_along_axis(
            feats, n_acc[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        cache = dataclasses.replace(
            cache, offset=cache.offset - (k + 1) + jnp.max(n_acc) + 1
        )
        return out, n_acc, feat, cache

    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, B, S)).copy()
    logits, cache, hiddens = prefill_captured(
        params, cache, jnp.asarray(inputs_embeds), jnp.asarray(pos)
    )
    feat = drafter.fuse_features(drafter_params, hiddens)[:, -1]  # [B, D]
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    yield np.asarray(tok), np.zeros((B,), np.float32)
    n = 1
    draft = drafter.draft_fn(k)
    d_off = 0  # host mirror of the drafter cursor (avoids aliasing the
    # donated cache.offset buffer as a second argument)
    while n < max_tokens:
        start = jnp.asarray(d_off, jnp.int32)
        d_toks, d_cache = draft(drafter_params, d_cache, tok, feat, start)
        out, n_acc, feat, cache = verify_captured(params, cache, tok, d_toks)
        out_h = np.asarray(out)
        n_acc_h = int(np.asarray(n_acc)[0])
        stats.rounds += 1
        stats.drafted += k
        stats.accepted += n_acc_h
        committed = out_h[0, : n_acc_h + 1]
        # drafter rollback: keep only the accepted prefix of its K writes
        d_off += n_acc_h + 1
        d_cache = dataclasses.replace(
            d_cache, offset=jnp.asarray(d_off, jnp.int32)
        )
        for t in committed:
            if n >= max_tokens:
                break
            yield np.asarray([t]), np.zeros((B,), np.float32)
            n += 1
        tok = jnp.asarray([int(committed[-1])], jnp.int32)


def load_drafter(path_or_repo: str, dtype=jnp.bfloat16, kind: str = "vanilla"):
    """Load a draft model (reference drafters/__init__.py:load_drafter).

    v1 supports `vanilla` (independent smaller LM sharing the tokenizer);
    EAGLE-3 / MTP target-coupled drafters follow the same verify loop and
    plug in here.
    """
    from ..utils.loader import load_model

    return load_model(path_or_repo, dtype=dtype)


def validate_drafter_compatibility(model, drafter):
    """Vocab-size check (reference drafters/__init__.py:37)."""
    tv = model.config_dict.get("vocab_size") or model.config_dict.get(
        "text_config", {}
    ).get("vocab_size")
    dv = drafter.config_dict.get("vocab_size")
    if tv and dv and tv != dv:
        raise ValueError(f"drafter vocab {dv} != target vocab {tv}")


def rejection_walk(pt, pd, draft_toks, key):
    """Speculative rejection-sampling walk (reference common.py:135).

    pt [B,k+1,V]: filtered target probs at each draft position (+1 bonus);
    pd [B,k,V]: filtered draft probs; draft_toks [B,k] sampled from pd.
    Returns (out [B,k+1], n_acc [B]) where out[:, :n_acc+1] are committed —
    accepted drafts followed by one residual-corrected token.  Guarantees
    every committed token is marginally distributed as pt (Leviathan et al.;
    with one-hot probs it reduces to greedy matching).
    """
    B, k = draft_toks.shape
    dsel = jnp.take_along_axis(pd, draft_toks[..., None], axis=-1)[..., 0]
    tsel = jnp.take_along_axis(
        pt[:, :k], draft_toks[..., None], axis=-1)[..., 0]
    key, sub = jax.random.split(key)
    u = jax.random.uniform(sub, (B, k))
    accept = u * jnp.maximum(dsel, 1e-20) <= tsel
    n_acc = jnp.argmin(
        jnp.concatenate([accept, jnp.zeros((B, 1), bool)], axis=1).astype(
            jnp.int32),
        axis=1,
    )  # first rejection position == number accepted
    # correction/bonus: residual draw at the first rejected position
    # (p_d = 0 past k, so a full accept samples the bonus straight from p_t)
    pt_n = jnp.take_along_axis(pt, n_acc[:, None, None], axis=1)[:, 0]
    V = pt.shape[-1]
    pd_pad = jnp.concatenate([pd, jnp.zeros((B, 1, V), pd.dtype)], axis=1)
    pd_n = jnp.take_along_axis(pd_pad, n_acc[:, None, None], axis=1)[:, 0]
    residual = jnp.maximum(pt_n - pd_n, 0.0)
    key, sub = jax.random.split(key)
    corr = jax.random.categorical(
        sub, jnp.log(residual + 1e-30), axis=-1).astype(jnp.int32)
    idx = jnp.arange(k + 1)[None, :]
    out = jnp.where(
        idx < n_acc[:, None], jnp.pad(draft_toks, ((0, 0), (0, 1))), 0)
    out = jnp.where(idx == n_acc[:, None], corr[:, None], out)
    return out, n_acc


class SpeculativeEngine:
    """Jitted draft/verify programs for a (target, drafter) pair.

    Temperature-aware: draft/verify carry per-row sampling params `sp`
    (dict of [B] arrays) and a PRNG key; rows with temp==0 reduce exactly
    to greedy token matching because `batched_filtered_probs` returns
    one-hot argmax distributions for them (reference runs the same
    RNG-state-preserving rejection walk everywhere, common.py:46,135)."""

    def __init__(self, model, drafter, num_draft: int = 4):
        self.model = model
        self.drafter = drafter
        self.k = num_draft
        self._draft_fn = None
        self._verify_fn = None

    def draft_fn(self):
        if self._draft_fn is not None:
            return self._draft_fn
        from ..core.sampling import make_batched_sampler

        lm = self.drafter.language_model
        k = self.k
        sampler = make_batched_sampler()

        @partial(jax.jit, donate_argnums=(1,))
        def draft(params, cache, tok, sp, key):
            B = tok.shape[0]

            def body(carry, _):
                cache, tok, key = carry
                embeds = lm.embed(params["language_model"], tok[:, None])
                pos = jnp.broadcast_to(cache.offset[None, None], (3, B, 1))
                hidden, cache = lm(params["language_model"], embeds, cache, pos)
                logits = lm.logits(params["language_model"], hidden)[:, 0]
                logits = logits.astype(jnp.float32)
                key, sub = jax.random.split(key)
                nxt = sampler(logits, sp, sub)
                return (cache, nxt, key), (nxt, logits)

            (cache, _, _), (toks, lgs) = jax.lax.scan(
                body, (cache, tok, key), None, length=k)
            # [B, k] tokens + [B, k, V] draft logits for the rejection walk
            return toks.T, jnp.moveaxis(lgs, 0, 1), cache

        self._draft_fn = draft
        return draft

    def sync_fn(self):
        """One drafter forward writing a single token's KV (used after a
        full-accept round, where the draft scan stopped one token short)."""
        if getattr(self, "_sync_fn", None) is not None:
            return self._sync_fn
        lm = self.drafter.language_model

        @partial(jax.jit, donate_argnums=(1,))
        def sync(params, cache, tok):
            B = tok.shape[0]
            embeds = lm.embed(params["language_model"], tok[:, None])
            pos = jnp.broadcast_to(cache.offset[None, None], (3, B, 1))
            _, cache = lm(params["language_model"], embeds, cache, pos)
            return cache

        self._sync_fn = sync
        return sync

    def verify_fn(self):
        if self._verify_fn is not None:
            return self._verify_fn
        from ..core.sampling import batched_filtered_probs

        lm = self.model.language_model
        k = self.k

        @partial(jax.jit, donate_argnums=(1,))
        def verify(params, cache, prev_tok, draft_toks, d_logits,
                   rope_delta, sp, key):
            """One target forward over [prev, d1..dk]; rejection-sampling
            acceptance walk (reference common.py:135).

            Returns (out_toks [B, k+1], n_accepted [B], cache-with-rewound-
            cursor).  out_toks[:, :n_acc+1] are the committed tokens; the
            token at n_acc is the residual correction draw (== target
            greedy when temp==0, since both distributions are one-hot).
            """
            B = prev_tok.shape[0]
            seq = jnp.concatenate([prev_tok[:, None], draft_toks], axis=1)  # [B,k+1]
            lp = params["language_model"]
            embeds = lm.embed(lp, seq)
            base = cache.offset + rope_delta.reshape(-1)[:B]
            pos = base[None, :, None] + jnp.arange(k + 1)[None, None, :]
            # full [3, B, k+1] so M-RoPE models gather valid streams
            pos = jnp.broadcast_to(pos, (3, B, k + 1))
            hidden, cache = lm(lp, embeds, cache, pos.astype(jnp.int32))
            logits = lm.logits(lp, hidden).astype(jnp.float32)  # [B,k+1,V]
            pt = batched_filtered_probs(logits, sp)             # [B,k+1,V]
            pd = batched_filtered_probs(d_logits, sp)           # [B,k,V]
            out, n_acc = rejection_walk(pt, pd, draft_toks, key)
            # rewind: the forward advanced offset by k+1; commit only n_acc+1
            cache = dataclasses.replace(
                cache,
                offset=cache.offset - (k + 1) + jnp.max(n_acc) + 1,
            )
            return out, n_acc, cache

        self._verify_fn = verify
        return verify


@dataclasses.dataclass
class SpecStats:
    rounds: int = 0
    drafted: int = 0
    accepted: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / max(self.drafted, 1)


def speculative_generate_step(
    inputs_embeds: jax.Array,  # [1, S, D] (target embeddings)
    model,
    drafter,
    input_ids: Optional[np.ndarray] = None,  # [1, S] for drafter prefill
    *,
    position_ids: Optional[np.ndarray] = None,
    rope_deltas: Optional[np.ndarray] = None,
    max_tokens: int = 256,
    num_draft: int = 4,
    prefill_step_size: int = 512,
    stats: Optional[SpecStats] = None,
    temperature: float = 0.0,
    top_p: float = 0.0,
    min_p: float = 0.0,
    top_k: int = -1,
    seed: Optional[int] = None,
) -> Generator[Tuple[np.ndarray, np.ndarray], None, None]:
    """Speculative decoding, B=1 (reference utils.py:215).

    Distribution-preserving at any temperature via the rejection-sampling
    walk (reference common.py:135); at temperature=0 the walk reduces to
    greedy matching, so output equals plain greedy target decoding.
    """
    assert inputs_embeds.shape[0] == 1, "speculative path is single-stream"
    params = model.params
    engine = get_engine(model)
    spec = SpeculativeEngine(model, drafter, num_draft)
    stats = stats if stats is not None else SpecStats()
    B, S, _ = inputs_embeds.shape
    k = num_draft

    if position_ids is None:
        p = np.broadcast_to(np.arange(S, dtype=np.int32), (B, S))
        position_ids = np.broadcast_to(p[None], (3, B, S))
    if rope_deltas is None:
        rope_deltas = np.zeros((B, 1), np.int32)
    rope_deltas = jnp.asarray(np.asarray(rope_deltas, np.int32))

    capacity = round_up(S + max_tokens + k + 2, CACHE_BUCKET)
    cache = make_cache(model, B, capacity, inputs_embeds.dtype)

    # --- target prefill (shared chunked program)
    step_sz = min(prefill_step_size, round_up(S, CACHE_BUCKET))
    S_pad = round_up(S, step_sz)
    embeds = jnp.asarray(inputs_embeds)
    if S_pad != S:
        embeds = jnp.pad(embeds, ((0, 0), (0, S_pad - S), (0, 0)))
    pos_pad = np.zeros((3, B, S_pad), np.int32)
    pos_pad[:, :, :S] = position_ids
    logits = None
    for c0 in range(0, S_pad, step_sz):
        chunk = jax.lax.dynamic_slice_in_dim(embeds, c0, step_sz, axis=1)
        in_chunk = c0 <= S - 1 < c0 + step_sz
        lgts, cache = engine._prefill(
            params, cache, chunk, jnp.asarray(pos_pad[:, :, c0 : c0 + step_sz]),
            S - 1 - c0 if in_chunk else 0,
        )
        if in_chunk:
            logits = lgts
    cache = dataclasses.replace(cache, offset=jnp.asarray(S, jnp.int32))

    # --- drafter prefill on token ids
    d_engine = get_engine(drafter)
    dlm = drafter.language_model
    d_capacity = capacity
    d_cache = make_cache(drafter, B, d_capacity, inputs_embeds.dtype)
    ids = np.asarray(input_ids) if input_ids is not None else None
    if ids is None:
        raise ValueError("speculative decoding needs input_ids for the drafter")
    d_embeds = dlm.embed(drafter.params["language_model"], jnp.asarray(ids))
    d_pad = jnp.pad(d_embeds, ((0, 0), (0, S_pad - S), (0, 0)))
    for c0 in range(0, S_pad, step_sz):
        chunk = jax.lax.dynamic_slice_in_dim(d_pad, c0, step_sz, axis=1)
        _, d_cache = d_engine._prefill(
            drafter.params, d_cache, chunk,
            jnp.asarray(pos_pad[:, :, c0 : c0 + step_sz]), 0,
        )
    d_cache = dataclasses.replace(d_cache, offset=jnp.asarray(S, jnp.int32))

    from ..core.sampling import make_batched_sampler

    sp = {
        "temp": jnp.full((B,), temperature, jnp.float32),
        "top_p": jnp.full((B,), top_p, jnp.float32),
        "min_p": jnp.full((B,), min_p, jnp.float32),
        "top_k": jnp.full((B,), top_k, jnp.int32),
    }
    key = jax.random.PRNGKey(
        seed if seed is not None else int(time.time_ns() % 2**31))
    key, sub = jax.random.split(key)
    tok = make_batched_sampler()(
        logits.astype(jnp.float32), sp, sub)  # first token
    yield np.asarray(tok), np.zeros((B,), np.float32)
    n = 1

    draft = spec.draft_fn()
    verify = spec.verify_fn()
    sync = spec.sync_fn()
    # `cur` = sequence position of the last emitted token (target cache's
    # write cursor; the last token's own KV is written by the next round)
    while n < max_tokens:
        key, dk, vk = jax.random.split(key, 3)
        d_toks, d_logits, d_cache = draft(drafter.params, d_cache, tok, sp, dk)
        out, n_acc, cache = verify(
            params, cache, tok, d_toks, d_logits, rope_deltas, sp, vk)
        out_h = np.asarray(out)
        n_acc_h = int(np.asarray(n_acc)[0])
        stats.rounds += 1
        stats.drafted += k
        stats.accepted += n_acc_h
        committed = out_h[0, : n_acc_h + 1]
        # drafter cursor: its scan wrote [tok, d1..d_{k-1}] starting at the
        # old cursor; rewind to old + (n_acc + 1) so it points at the bonus
        # token's position (stale rows masked/overwritten).  On a full
        # accept the scan stopped one token short (d_k's KV): write it with
        # a one-token sync forward, then the cursor lands on the bonus.
        if n_acc_h == k:
            d_cache = dataclasses.replace(
                d_cache, offset=jnp.asarray(S + n - 1 + k, jnp.int32)
            )
            d_cache = sync(
                drafter.params, d_cache, jnp.asarray(out_h[:, k - 1])
            )
        else:
            d_cache = dataclasses.replace(
                d_cache,
                offset=jnp.asarray(S + n - 1 + n_acc_h + 1, jnp.int32),
            )
        for t in committed:
            if n >= max_tokens:
                break
            yield np.asarray([t]), np.zeros((B,), np.float32)
            n += 1
        tok = jnp.asarray([int(committed[-1])], jnp.int32)
