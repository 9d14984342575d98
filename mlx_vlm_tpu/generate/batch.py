"""Continuous batching engine.

Role parity: reference mlx_vlm/generate/ar.py — GenerationBatch:878,
PromptProcessingBatch:1530, BatchGenerator:2109, batch_generate:2796.

TPU design (SURVEY.md §7.6): FIXED batch slots + fixed-capacity per-row
caches.  Insert/remove never change tensor shapes — a new request is one
`dynamic_update_slice` of its prefilled KV rows into a free slot, a finished
request just frees the slot — so the decode program compiles once.  Per-row
sampling parameters are [B] arrays traced into the program; inactive rows
compute garbage that is masked on the host.  Decode-first scheduling: admit
up to `prefill_batch_size` queued requests when slots are free, otherwise run
one fused decode block.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core import cache as cache_lib
from ..core.sampling import make_batched_sampler
from .ar import embed_fn, get_engine
from .common import round_up

DEFAULT_SLOTS = 8
DEFAULT_CAPACITY = 4096
DEFAULT_BLOCK = 8


@dataclasses.dataclass
class SamplingParams:
    temp: float = 0.0
    top_p: float = 0.0
    min_p: float = 0.0
    top_k: int = -1


@dataclasses.dataclass
class BatchRequest:
    uid: Any
    inputs_embeds: Any  # [1, S, D]
    max_tokens: int = 256
    position_ids: Optional[np.ndarray] = None  # [3, 1, S]
    rope_delta: int = 0
    sampling: SamplingParams = dataclasses.field(default_factory=SamplingParams)
    eos_ids: Tuple[int, ...] = ()
    # APC warm admission (reference mixed warm/cold prefill, ar.py:2287)
    prompt_cache: Any = None  # prefilled row cache with offset=prefix_len
    prefix_len: int = 0
    prompt_cache_callback: Optional[Callable] = None  # harvest hook
    # token ids [1, S] — needed by drafter prefill in speculative serving
    input_ids: Optional[np.ndarray] = None


@dataclasses.dataclass
class _Slot:
    req: BatchRequest
    generated: int = 0
    prompt_len: int = 0
    done: bool = False


class BatchGenerator:
    """Fixed-slot continuous batching scheduler (reference ar.py:2109)."""

    def __init__(
        self,
        model,
        num_slots: int = DEFAULT_SLOTS,
        capacity: int = DEFAULT_CAPACITY,
        block_size: int = DEFAULT_BLOCK,
        prefill_step_size: int = 512,
        dtype=jnp.bfloat16,
        kv_bits: Optional[int] = None,
        kv_group_size: int = 64,
    ):
        from .ar import make_cache

        self.model = model
        self.lm = model.language_model
        self.B = num_slots
        self.capacity = capacity
        self.block = block_size
        self.prefill_step = prefill_step_size
        self.dtype = dtype
        self.kv_bits = kv_bits
        self.kv_group_size = kv_group_size
        self.engine = get_engine(model)
        self._sampler = make_batched_sampler()

        B = num_slots
        if kv_bits:
            self.cache = make_cache(
                model, B, capacity, dtype, kv_bits, kv_group_size, per_row=True
            )
        else:
            self.cache = cache_lib.init_batch_cache(
                self.lm.args.num_hidden_layers, B, self.lm.n_kv_heads,
                self.lm.head_dim, capacity, dtype,
            )
        from .ar import HISTORY_SIZE

        self.history = -jnp.ones((B, HISTORY_SIZE), jnp.int32)
        self.toks = jnp.zeros((B,), jnp.int32)
        self.key = jax.random.PRNGKey(0)
        self.slots: List[Optional[_Slot]] = [None] * B
        self.queue: List[BatchRequest] = []
        # host mirrors of per-row params
        self.temp = np.zeros(B, np.float32)
        self.top_p = np.zeros(B, np.float32)
        self.min_p = np.zeros(B, np.float32)
        self.top_k = -np.ones(B, np.int32)
        self.deltas = np.zeros(B, np.int32)
        self.active = np.zeros(B, bool)
        self._offsets = np.zeros(B, np.int64)  # host mirror of cache.offset
        self._block_fn = None
        self._insert_fns = {}

    # ------------------------------------------------------------- programs
    def _get_block_fn(self) -> Callable:
        if self._block_fn is not None:
            return self._block_fn
        lm = self.lm
        sampler = self._sampler
        T = self.block

        @partial(jax.jit, donate_argnums=(1, 5))
        def block(params, cache, toks, deltas, active, history, sp, key):
            lm_params = params["language_model"]
            B = toks.shape[0]
            act_i = active.astype(jnp.int32)

            def body(carry, _):
                cache, toks, history, key = carry
                embeds = lm.embed(lm_params, toks[:, None])
                pos = cache.offset + deltas
                position_ids = jnp.broadcast_to(pos[None, :, None], (3, B, 1))
                hidden, cache2 = lm(lm_params, embeds, cache, position_ids)
                # gate cursor advance on row activity
                cache2 = dataclasses.replace(cache2, offset=cache.offset + act_i)
                logits = lm.logits(lm_params, hidden)[:, 0].astype(jnp.float32)
                logprobs = jax.nn.log_softmax(logits, axis=-1)
                key, sub = jax.random.split(key)
                nxt = sampler(logits, sp, sub)
                nxt = jnp.where(active, nxt, toks)
                history = jnp.concatenate([history[:, 1:], nxt[:, None]], axis=1)
                lp = jnp.take_along_axis(logprobs, nxt[:, None], axis=-1)[:, 0]
                return (cache2, nxt, history, key), (nxt, lp)

            (cache, toks, history, key), (ts, lps) = jax.lax.scan(
                body, (cache, toks, history, key), None, length=T
            )
            return ts.T, lps.T, cache, toks, history, key

        self._block_fn = block
        return block

    def _get_insert_fn(self, cp: int, src_row: int = 0) -> Callable:
        key = (cp, src_row)
        fn = self._insert_fns.get(key)
        if fn is None:

            @partial(jax.jit, donate_argnums=(0,))
            def insert(batch_cache, row_cache, slot, prompt_len):
                return cache_lib.insert_row(
                    batch_cache, row_cache, slot, prompt_len, src_row=src_row
                )

            fn = self._insert_fns[key] = insert
        return fn

    # ------------------------------------------------------------ lifecycle
    def insert(self, req: BatchRequest):
        self.queue.append(req)

    def _admit_one(self) -> bool:
        free = [i for i, s in enumerate(self.slots) if s is None]
        if not free or not self.queue:
            return False
        slot_idx = free[0]
        req = self.queue.pop(0)
        embeds = jnp.asarray(req.inputs_embeds, self.dtype)
        S = embeds.shape[1]
        if S + req.max_tokens + self.block + 1 > self.capacity:
            req.max_tokens = max(0, self.capacity - S - self.block - 1)

        # --- single-row chunked prefill over the uncached suffix (reuses the
        # streaming engine program; APC warm rows start at prefix_len)
        pos = req.position_ids
        if pos is None:
            p = np.broadcast_to(np.arange(S, dtype=np.int32), (1, S))
            pos = np.broadcast_to(p[None], (3, 1, S))
        from .ar import make_cache

        prefix = req.prefix_len if req.prompt_cache is not None else 0
        suffix = S - prefix
        step = min(self.prefill_step, round_up(suffix, 256))
        S_pad = round_up(suffix, step)
        if req.prompt_cache is not None:
            row_cache = req.prompt_cache
            row_capacity = row_cache.capacity
            while prefix + S_pad > row_capacity and step > 64:
                step = max(64, step // 2)
                S_pad = round_up(suffix, step)
            if prefix + S_pad > row_capacity:
                # would overwrite the warm prefix KV (ar.py raises the same
                # way); fall back to a cold prefill in a fresh buffer
                prefix, suffix = 0, S
                step = min(self.prefill_step, round_up(suffix, 256))
                S_pad = round_up(suffix, step)
                row_capacity = round_up(S_pad, 256)
                row_cache = make_cache(
                    self.model, 1, row_capacity, self.dtype, self.kv_bits,
                    self.kv_group_size,
                )
        else:
            row_capacity = round_up(S_pad, 256)
            row_cache = make_cache(
                self.model, 1, row_capacity, self.dtype, self.kv_bits,
                self.kv_group_size,
            )
        embeds_sfx = embeds[:, prefix:]
        if S_pad != suffix:
            embeds_sfx = jnp.pad(embeds_sfx, ((0, 0), (0, S_pad - suffix), (0, 0)))
        pos_pad = np.zeros((3, 1, S_pad), np.int32)
        pos_pad[:, :, :suffix] = np.asarray(pos, np.int32)[:, :, prefix:]
        logits = None
        last = suffix - 1
        for c0 in range(0, S_pad, step):
            chunk = jax.lax.dynamic_slice_in_dim(embeds_sfx, c0, step, axis=1)
            pchunk = jnp.asarray(pos_pad[:, :, c0 : c0 + step])
            in_chunk = c0 <= last < c0 + step
            lgts, row_cache = self.engine._prefill(
                self.model.params, row_cache, chunk, pchunk,
                last - c0 if in_chunk else 0,
            )
            if in_chunk:
                logits = lgts
        row_cache = dataclasses.replace(
            row_cache, offset=jnp.asarray(S, jnp.int32)
        )
        if req.prompt_cache_callback is not None:
            req.prompt_cache_callback(row_cache)

        # first token with this row's sampling params
        sp1 = {
            "temp": jnp.asarray([req.sampling.temp], jnp.float32),
            "top_p": jnp.asarray([req.sampling.top_p], jnp.float32),
            "min_p": jnp.asarray([req.sampling.min_p], jnp.float32),
            "top_k": jnp.asarray([req.sampling.top_k], jnp.int32),
        }
        self.key, sub = jax.random.split(self.key)
        first_tok = self._sampler(logits, sp1, sub)

        ins = self._get_insert_fn(row_capacity)
        self.cache = ins(
            self.cache, row_cache,
            jnp.asarray(slot_idx, jnp.int32), jnp.asarray(S, jnp.int32),
        )
        self._register(slot_idx, req, int(np.asarray(first_tok)[0]), S)
        return True

    def _register(self, slot_idx: int, req: BatchRequest, first_tok: int, S: int):
        """Shared post-prefill bookkeeping for a newly admitted row."""
        self.toks = self.toks.at[slot_idx].set(first_tok)
        self.history = self.history.at[slot_idx].set(-1)
        self.history = self.history.at[slot_idx, -1].set(first_tok)
        sp = req.sampling
        self.temp[slot_idx] = sp.temp
        self.top_p[slot_idx] = sp.top_p
        self.min_p[slot_idx] = sp.min_p
        self.top_k[slot_idx] = sp.top_k
        self.deltas[slot_idx] = req.rope_delta
        self.active[slot_idx] = True
        self._offsets[slot_idx] = S
        self.slots[slot_idx] = _Slot(req=req, prompt_len=S, generated=1)
        # the first token counts as generated output
        self._first_tokens = getattr(self, "_first_tokens", {})
        self._first_tokens[req.uid] = first_tok

    def _admit_batch(self) -> bool:
        """Batched multi-prompt admission (reference PromptProcessingBatch
        ar.py:1530): right-pad cold prompts to a shared length and prefill
        them in ONE program, then insert row by row."""
        free = [i for i, s in enumerate(self.slots) if s is None]
        cold = [r for r in self.queue if r.prompt_cache is None]
        if len(free) < 2 or len(cold) < 2:
            return False
        from .ar import make_cache

        reqs = cold[: min(len(free), 8)]
        lens = [jnp.asarray(r.inputs_embeds).shape[1] for r in reqs]
        S_max = max(lens)
        S_pad = round_up(S_max, 64)
        step = min(self.prefill_step, S_pad)
        S_pad = round_up(S_pad, step)  # chunked batched prefill for mixed
        # lengths (round-1 fell back to serial admission past prefill_step)
        if S_pad > self.capacity:
            return False  # pathological prompt; single-row path raises
        n = len(reqs)
        n_pad = 1 << (n - 1).bit_length()  # pow2 bucket limits recompiles
        D = jnp.asarray(reqs[0].inputs_embeds).shape[2]
        embeds = np.zeros((n_pad, S_pad, D), np.float32)
        pos = np.zeros((3, n_pad, S_pad), np.int32)
        for i, r in enumerate(reqs):
            e = np.asarray(r.inputs_embeds, np.float32)
            embeds[i, : lens[i]] = e[0]
            p = r.position_ids
            if p is None:
                p = np.broadcast_to(
                    np.arange(lens[i], dtype=np.int32), (3, 1, lens[i])
                )
            pos[:, i, : lens[i]] = np.asarray(p, np.int32)[:, 0]
        cap = round_up(S_pad, 256)
        cache = make_cache(
            self.model, n_pad, cap, self.dtype, self.kv_bits, self.kv_group_size
        )
        last_idx = np.zeros(n_pad, np.int32)
        last_idx[:n] = np.asarray(lens) - 1
        embeds_dev = jnp.asarray(embeds, self.dtype)
        pos_dev = jnp.asarray(pos)
        chunk_logits = []
        for c0 in range(0, S_pad, step):
            in_chunk = np.where(
                (last_idx >= c0) & (last_idx < c0 + step), last_idx - c0, 0
            ).astype(np.int32)
            lgts, cache = self.engine._prefill_rows(
                self.model.params, cache,
                jax.lax.dynamic_slice_in_dim(embeds_dev, c0, step, axis=1),
                jax.lax.dynamic_slice_in_dim(pos_dev, c0, step, axis=2),
                jnp.asarray(in_chunk),
            )
            chunk_logits.append((c0, lgts))
        # per-row logits come from the chunk containing that row's last token
        parts = []
        for i in range(n_pad):
            c_sel = (last_idx[i] // step) * step
            parts.append([lg for c0, lg in chunk_logits if c0 == c_sel][0][i])
        logits = jnp.stack(parts)
        sp = {
            "temp": jnp.asarray(
                [r.sampling.temp for r in reqs] + [0.0] * (n_pad - n), jnp.float32
            ),
            "top_p": jnp.asarray(
                [r.sampling.top_p for r in reqs] + [0.0] * (n_pad - n), jnp.float32
            ),
            "min_p": jnp.asarray(
                [r.sampling.min_p for r in reqs] + [0.0] * (n_pad - n), jnp.float32
            ),
            "top_k": jnp.asarray(
                [r.sampling.top_k for r in reqs] + [-1] * (n_pad - n), jnp.int32
            ),
        }
        self.key, sub = jax.random.split(self.key)
        first_toks = np.asarray(self._sampler(logits, sp, sub))
        for i, r in enumerate(reqs):
            self.queue.remove(r)
            slot_idx = [j for j, s in enumerate(self.slots) if s is None][0]
            S = lens[i]
            if S + r.max_tokens + self.block + 1 > self.capacity:
                r.max_tokens = max(0, self.capacity - S - self.block - 1)
            if r.prompt_cache_callback is not None:
                # single-row view for the APC harvest hook
                arrs = tuple(a[:, i : i + 1] for a in cache.scan_arrays())
                view = cache.with_arrays(arrs, 0)
                view = dataclasses.replace(view, offset=jnp.asarray(S, jnp.int32))
                r.prompt_cache_callback(view)
            ins = self._get_insert_fn(cap, src_row=i)
            self.cache = ins(
                self.cache, cache, jnp.asarray(slot_idx, jnp.int32),
                jnp.asarray(S, jnp.int32),
            )
            self._register(slot_idx, r, int(first_toks[i]), S)
        return True

    def remove(self, uid):
        for i, s in enumerate(self.slots):
            if s is not None and s.req.uid == uid:
                self.slots[i] = None
                self.active[i] = False
        self.queue = [r for r in self.queue if r.uid != uid]

    @property
    def num_active(self) -> int:
        return sum(s is not None for s in self.slots)

    def _admit_and_first(self) -> Dict[Any, List[Tuple[int, float]]]:
        """Admission phase: admit queued requests, return their first
        sampled tokens and free any slots finished by them."""
        out: Dict[Any, List[Tuple[int, float]]] = {}
        # admit as many as fit (prefill phase): cold prompts in one batched
        # program when >=2 are waiting, the rest one at a time
        while self._admit_batch():
            pass
        while self._admit_one():
            pass
        first = getattr(self, "_first_tokens", {})
        for uid, t in first.items():
            out.setdefault(uid, []).append((t, 0.0))
        self._first_tokens = {}
        # check finishes from first tokens
        for i, s in enumerate(self.slots):
            if s and not s.done:
                last_tok = out.get(s.req.uid, [(None, 0)])[-1][0]
                if last_tok is not None and (
                    last_tok in s.req.eos_ids or s.generated >= s.req.max_tokens
                ):
                    s.done = True
                    self.slots[i] = None
                    self.active[i] = False
        return out

    def next(self) -> Dict[Any, List[Tuple[int, float]]]:
        """One scheduling cycle -> {uid: [(token, logprob), ...]} newly
        produced (includes the prompt's first sampled token on admission)."""
        out = self._admit_and_first()
        if not self.active.any():
            return out

        blk = self._get_block_fn()
        sp = {
            "temp": jnp.asarray(self.temp),
            "top_p": jnp.asarray(self.top_p),
            "min_p": jnp.asarray(self.min_p),
            "top_k": jnp.asarray(self.top_k),
        }
        toks, lps, self.cache, self.toks, self.history, self.key = blk(
            self.model.params, self.cache, self.toks,
            jnp.asarray(self.deltas), jnp.asarray(self.active),
            self.history, sp, self.key,
        )
        toks_h = np.asarray(toks)  # [B, T]
        lps_h = np.asarray(lps)
        for i, s in enumerate(self.slots):
            if s is None or not self.active[i]:
                continue
            uid = s.req.uid
            for t in range(toks_h.shape[1]):
                if s.generated >= s.req.max_tokens or s.done:
                    break
                tok = int(toks_h[i, t])
                out.setdefault(uid, []).append((tok, float(lps_h[i, t])))
                s.generated += 1
                self._offsets[i] += 1
                if tok in s.req.eos_ids or s.generated >= s.req.max_tokens:
                    s.done = True
            if s.done:
                self.slots[i] = None
                self.active[i] = False
        return out


@dataclasses.dataclass
class BatchResponse:
    texts: List[str]
    stats: dict


def batch_generate(
    model,
    processor,
    prompts: List[str],
    images: Optional[List[Any]] = None,
    max_tokens: int = 256,
    temperature: float = 0.0,
    top_p: float = 0.0,
    num_slots: int = DEFAULT_SLOTS,
    capacity: int = DEFAULT_CAPACITY,
    verbose: bool = False,
    **kwargs,
) -> BatchResponse:
    """Offline batched generation (reference ar.py:2796).

    Each prompt is preprocessed independently and streamed through the
    continuous-batching engine; outputs are restored to input order.
    """
    from ..utils.processing import prepare_inputs
    from ..utils.tokenizer import make_detokenizer
    from .dispatch import _get_eos_ids

    t_start = time.perf_counter()
    eos = tuple(_get_eos_ids(model, processor))
    dtype = next(
        (
            l.dtype
            for l in jax.tree_util.tree_leaves(model.params)
            if jnp.issubdtype(l.dtype, jnp.floating)
        ),
        jnp.bfloat16,
    )
    gen = BatchGenerator(
        model, num_slots=num_slots, capacity=capacity, dtype=dtype
    )
    n_prompts = len(prompts)
    imgs = images if images is not None else [None] * n_prompts
    total_prompt_tokens = 0
    for uid, (prompt, image) in enumerate(zip(prompts, imgs)):
        inputs = prepare_inputs(processor, prompt, images=image)
        ids = np.asarray(inputs["input_ids"])
        total_prompt_tokens += ids.shape[1]
        pixel_values = inputs.get("pixel_values")
        grid = inputs.get("image_grid_thw")
        if pixel_values is not None:
            aux = model.vision_aux_inputs(np.asarray(grid))
            embeds = embed_fn(model)(
                model.params, jnp.asarray(ids), jnp.asarray(pixel_values),
                **{k: jnp.asarray(v) for k, v in aux.items()},
            )
        else:
            embeds = embed_fn(model)(
                model.params, jnp.asarray(ids)
            )
        pos, deltas = model.prepare_position_ids(
            ids, grid if pixel_values is not None else None
        )
        gen.insert(
            BatchRequest(
                uid=uid,
                inputs_embeds=embeds,
                max_tokens=max_tokens,
                position_ids=pos,
                rope_delta=int(deltas[0, 0]),
                sampling=SamplingParams(temp=temperature, top_p=top_p),
                eos_ids=eos,
            )
        )

    token_lists: Dict[int, List[int]] = {u: [] for u in range(n_prompts)}
    while gen.num_active or gen.queue:
        for uid, toks in gen.next().items():
            token_lists[uid].extend(t for t, _ in toks)

    tok = getattr(processor, "tokenizer", processor)
    texts = []
    total_gen = 0
    for uid in range(n_prompts):
        ids = token_lists[uid]
        total_gen += len(ids)
        ids = [t for t in ids if t not in eos]
        detok = make_detokenizer(tok)
        for t in ids:
            detok.add_token(t)
            detok.last_segment()
        texts.append(detok.text + detok.finalize())
    wall = time.perf_counter() - t_start
    return BatchResponse(
        texts=texts,
        stats={
            "prompt_tokens": total_prompt_tokens,
            "generation_tokens": total_gen,
            "generation_tps": total_gen / max(wall, 1e-9),
            "wall_s": wall,
        },
    )
