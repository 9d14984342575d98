"""Batched speculative decoding for serving.

Role parity: reference mlx_vlm/generate/ar.py:1342
(SpeculativeGenerationBatch) and speculative/utils.py:118
(run_speculative_server_rounds) — draft/verify rounds over the whole
continuous-batching slot set, with the rejection-sampling walk of
speculative/common.py:135 for temperature>0 rows.

TPU design: one jitted round program serves every mix of requests.

- The drafter holds its own fixed-slot BatchKVCache.  Instead of
  tracking per-row full/partial-accept drafter states host-side (the
  reference rolls back drafter cache tensors per row), each round begins
  with a *catch-up* forward: the tokens committed by the previous round
  (1..k+1 of them, right-padded to k+1) run through the drafter at
  per-row positions, rewriting exactly the committed tokens' KV.  Rows
  that accepted fewer tokens simply leave stale KV beyond their cursor —
  masked by the per-row causal mask and overwritten next round.  The
  catch-up logits at each row's last valid token give draft token #1 for
  free; k-1 single-token drafter steps produce the rest.
- Verify is one target forward over [B, k+1] tokens at per-row offsets
  (BatchKVCache cursors are already per-row [B] arrays), followed by an
  on-device rejection walk: accept draft i while u_i * p_draft(d_i) <=
  p_target(d_i) under the row's OWN sampling params (temp==0 rows get
  one-hot target distributions, so the walk reduces to exact greedy
  matching); the first rejected position samples from the residual
  max(p_t - p_d, 0), a full accept samples the bonus token from p_t.
- Rollback is a per-row cursor rewind (offset - (k+1) + n_acc + 1);
  stale KV past the cursor is masked and overwritten by later rounds.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core import cache as cache_lib
from ..core.sampling import batched_filtered_probs
from ..generate.ar import get_engine, make_cache
from ..generate.batch import BatchGenerator, BatchRequest
from ..generate.common import round_up
from .utils import SpecStats, validate_drafter_compatibility


class SpeculativeBatchGenerator(BatchGenerator):
    """Continuous batching with per-round batched draft/verify."""

    def __init__(self, model, drafter, num_draft: int = 4, **kwargs):
        # block margin: a verify round writes k+1 positions past the cursor
        kwargs["block_size"] = max(kwargs.get("block_size", 0), num_draft + 1)
        super().__init__(model, **kwargs)
        validate_drafter_compatibility(model, drafter)
        self.drafter = drafter
        self.dlm = drafter.language_model
        self.k = num_draft
        self.d_engine = get_engine(drafter)
        self.d_cache = cache_lib.init_batch_cache(
            self.dlm.args.num_hidden_layers, self.B, self.dlm.n_kv_heads,
            self.dlm.head_dim, self.capacity, self.dtype,
        )
        B, kp1 = self.B, num_draft + 1
        self.pending = np.zeros((B, kp1), np.int32)
        self.pend_len = np.zeros((B,), np.int32)
        self.stats = SpecStats()
        self.uid_stats: Dict[Any, SpecStats] = {}
        self._removed_stats: Dict[Any, SpecStats] = {}
        self._round_fn = None

    # ----------------------------------------------------------- admission
    def _register(self, slot_idx: int, req: BatchRequest, first_tok: int,
                  S: int):
        super()._register(slot_idx, req, first_tok, S)
        if req.input_ids is None:
            raise ValueError(
                "speculative serving needs BatchRequest.input_ids for the "
                "drafter prompt prefill"
            )
        self._drafter_admit(slot_idx, np.asarray(req.input_ids))
        self.pending[slot_idx] = 0
        self.pending[slot_idx, 0] = first_tok
        self.pend_len[slot_idx] = 1
        self.uid_stats[req.uid] = SpecStats()

    def _drafter_admit(self, slot_idx: int, ids: np.ndarray):
        """Chunked drafter prompt prefill -> insert into the drafter
        batch cache (mirrors BatchGenerator._admit_one's target prefill)."""
        S = ids.shape[1]
        step = min(self.prefill_step, round_up(S, 256))
        S_pad = round_up(S, step)
        cap = round_up(S_pad, 256)
        row = make_cache(self.drafter, 1, cap, self.dtype)
        emb = self.dlm.embed(
            self.drafter.params["language_model"], jnp.asarray(ids)
        )
        if S_pad != S:
            emb = jnp.pad(emb, ((0, 0), (0, S_pad - S), (0, 0)))
        pos = np.zeros((3, 1, S_pad), np.int32)
        pos[:, :, :S] = np.broadcast_to(
            np.arange(S, dtype=np.int32), (3, 1, S)
        )
        for c0 in range(0, S_pad, step):
            chunk = jax.lax.dynamic_slice_in_dim(emb, c0, step, axis=1)
            _, row = self.d_engine._prefill(
                self.drafter.params, row, chunk,
                jnp.asarray(pos[:, :, c0:c0 + step]), 0,
            )
        row = dataclasses.replace(row, offset=jnp.asarray(S, jnp.int32))
        self.d_cache = cache_lib.insert_row(
            self.d_cache, row, jnp.asarray(slot_idx, jnp.int32),
            jnp.asarray(S, jnp.int32),
        )

    def remove(self, uid):
        super().remove(uid)
        st = self.uid_stats.pop(uid, None)
        if st is not None:
            # stash for pop_stats — the server records metrics after remove()
            self._removed_stats[uid] = st
            while len(self._removed_stats) > 4 * self.B:
                self._removed_stats.pop(next(iter(self._removed_stats)))

    def pop_stats(self, uid) -> Optional[SpecStats]:
        """One-shot per-request acceptance stats (server metrics hook)."""
        st = self.uid_stats.pop(uid, None)
        return st if st is not None else self._removed_stats.pop(uid, None)

    # -------------------------------------------------------- round program
    def _get_round_fn(self):
        if self._round_fn is not None:
            return self._round_fn
        lm = self.lm
        dlm = self.dlm
        k = self.k
        kp1 = k + 1
        sampler = self._sampler

        @partial(jax.jit, donate_argnums=(2, 3))
        def rnd(params, d_params, cache, d_cache, pending, pend_len,
                deltas, active, sp, key):
            B = pending.shape[0]
            act_i = active.astype(jnp.int32)
            lp = params["language_model"]
            dlp = d_params["language_model"]

            # ---- 1. drafter catch-up over the tokens committed last round
            d_off0 = d_cache.offset
            emb = dlm.embed(dlp, pending)                    # [B, kp1, Dd]
            dpos = d_off0[:, None] + jnp.arange(kp1, dtype=jnp.int32)[None]
            dpos3 = jnp.broadcast_to(dpos[None], (3, B, kp1)).astype(
                jnp.int32)
            hid, d_cache = dlm(dlp, emb, d_cache, dpos3)
            d_log_cu = dlm.logits(dlp, hid).astype(jnp.float32)  # [B,kp1,V]
            d_next_off = d_off0 + pend_len * act_i
            d_cache = dataclasses.replace(d_cache, offset=d_next_off)
            idx = jnp.maximum(pend_len - 1, 0)
            dlog1 = jnp.take_along_axis(
                d_log_cu, idx[:, None, None], axis=1)[:, 0]  # [B, V]
            key, sub = jax.random.split(key)
            d1 = sampler(dlog1, sp, sub)

            # ---- 2. k-1 single-token drafter steps
            def dbody(carry, _):
                d_cache, tok, key = carry
                e = dlm.embed(dlp, tok[:, None])
                pos = jnp.broadcast_to(
                    d_cache.offset[None, :, None], (3, B, 1)
                ).astype(jnp.int32)
                h, d_cache2 = dlm(dlp, e, d_cache, pos)
                d_cache2 = dataclasses.replace(
                    d_cache2, offset=d_cache.offset + act_i)
                lg = dlm.logits(dlp, h)[:, 0].astype(jnp.float32)
                key, sub = jax.random.split(key)
                nxt = sampler(lg, sp, sub)
                return (d_cache2, nxt, key), (nxt, lg)

            (d_cache, _, key), (dnext, dlgs) = jax.lax.scan(
                dbody, (d_cache, d1, key), None, length=k - 1)
            # rollback the drafter cursor: stale scan KV is rewritten by
            # the next round's catch-up
            d_cache = dataclasses.replace(d_cache, offset=d_next_off)
            draft_toks = jnp.concatenate(
                [d1[:, None], dnext.T], axis=1)              # [B, k]
            d_logits = jnp.concatenate(
                [dlog1[:, None], jnp.moveaxis(dlgs, 0, 1)], axis=1)

            # ---- 3. target verify over [prev, d1..dk]
            prev = jnp.take_along_axis(pending, idx[:, None], axis=1)[:, 0]
            seq = jnp.concatenate([prev[:, None], draft_toks], axis=1)
            emb_t = lm.embed(lp, seq)
            off0 = cache.offset
            base = off0 + deltas
            tpos = base[:, None] + jnp.arange(kp1, dtype=jnp.int32)[None]
            tpos3 = jnp.broadcast_to(tpos[None], (3, B, kp1)).astype(
                jnp.int32)
            hidden, cache = lm(lp, emb_t, cache, tpos3)
            t_logits = lm.logits(lp, hidden).astype(jnp.float32)

            # ---- 4. rejection walk (reference common.py:135)
            pt = batched_filtered_probs(t_logits, sp)        # [B, kp1, V]
            pd = batched_filtered_probs(d_logits, sp)        # [B, k, V]
            dsel = jnp.take_along_axis(
                pd, draft_toks[..., None], axis=-1)[..., 0]  # [B, k]
            tsel = jnp.take_along_axis(
                pt[:, :k], draft_toks[..., None], axis=-1)[..., 0]
            key, sub = jax.random.split(key)
            u = jax.random.uniform(sub, (B, k))
            accept = u * jnp.maximum(dsel, 1e-20) <= tsel
            n_acc = jnp.argmin(
                jnp.concatenate(
                    [accept, jnp.zeros((B, 1), bool)], axis=1
                ).astype(jnp.int32), axis=1)                 # [B]
            # correction/bonus: residual at the first rejected position
            # (p_d = 0 past k, so a full accept samples the bonus from p_t)
            pt_n = jnp.take_along_axis(
                pt, n_acc[:, None, None], axis=1)[:, 0]      # [B, V]
            V = pt.shape[-1]
            pd_pad = jnp.concatenate(
                [pd, jnp.zeros((B, 1, V), pd.dtype)], axis=1)
            pd_n = jnp.take_along_axis(
                pd_pad, n_acc[:, None, None], axis=1)[:, 0]
            residual = jnp.maximum(pt_n - pd_n, 0.0)
            key, sub = jax.random.split(key)
            corr = jax.random.categorical(
                sub, jnp.log(residual + 1e-30), axis=-1).astype(jnp.int32)
            ids_ = jnp.arange(kp1, dtype=jnp.int32)[None, :]
            out = jnp.where(
                ids_ < n_acc[:, None],
                jnp.pad(draft_toks, ((0, 0), (0, 1))), 0)
            out = jnp.where(ids_ == n_acc[:, None], corr[:, None], out)
            lp_out = jnp.log(jnp.maximum(jnp.take_along_axis(
                pt, out[..., None], axis=-1)[..., 0], 1e-30))

            # ---- 5. per-row cursor rollback (free: stale KV is masked)
            cache = dataclasses.replace(
                cache, offset=off0 + (n_acc + 1) * act_i)
            return out, n_acc, lp_out, cache, d_cache, key

        self._round_fn = rnd
        return rnd

    # ------------------------------------------------------------ scheduling
    def next(self) -> Dict[Any, List[Tuple[int, float]]]:
        out = self._admit_and_first()
        if not self.active.any():
            return out

        rnd = self._get_round_fn()
        sp = {
            "temp": jnp.asarray(self.temp),
            "top_p": jnp.asarray(self.top_p),
            "min_p": jnp.asarray(self.min_p),
            "top_k": jnp.asarray(self.top_k),
        }
        toks, n_acc, lps, self.cache, self.d_cache, self.key = rnd(
            self.model.params, self.drafter.params, self.cache, self.d_cache,
            jnp.asarray(self.pending), jnp.asarray(self.pend_len),
            jnp.asarray(self.deltas), jnp.asarray(self.active), sp, self.key,
        )
        toks_h = np.asarray(toks)      # [B, k+1]
        n_acc_h = np.asarray(n_acc)    # [B]
        lps_h = np.asarray(lps)
        for i, s in enumerate(self.slots):
            if s is None or not self.active[i]:
                continue
            uid = s.req.uid
            n_commit = int(n_acc_h[i]) + 1
            self.stats.rounds += 1
            self.stats.drafted += self.k
            self.stats.accepted += int(n_acc_h[i])
            st = self.uid_stats.get(uid)
            if st is not None:
                st.rounds += 1
                st.drafted += self.k
                st.accepted += int(n_acc_h[i])
            committed = toks_h[i, :n_commit]
            for t_idx, tok in enumerate(committed):
                tok = int(tok)
                out.setdefault(uid, []).append((tok, float(lps_h[i, t_idx])))
                s.generated += 1
                self._offsets[i] += 1
                if tok in s.req.eos_ids or s.generated >= s.req.max_tokens:
                    s.done = True
                    break
            if s.done:
                self.slots[i] = None
                self.active[i] = False
            else:
                self.pending[i] = 0
                self.pending[i, :n_commit] = committed
                self.pend_len[i] = n_commit
        return out
