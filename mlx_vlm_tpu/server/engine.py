"""Server generation engine: single TPU-owner thread over the batch engine.

Role parity: reference mlx_vlm/server/generation.py — ResponseGenerator:1014
(dedicated GPU thread, queue-fed), StreamingToken per-request queues,
GenerationArguments:669, ServerMetricsStore:407, context-budget
validation:2282 (PromptTooLongError:60).
"""

from __future__ import annotations

import dataclasses
import logging
import queue
import threading
import time
import uuid
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

logger = logging.getLogger("mlx_vlm_tpu.server")


class PromptTooLongError(ValueError):
    pass


@dataclasses.dataclass
class GenerationArguments:
    """Normalized request (reference generation.py:669)."""

    prompt: str = ""
    images: List[Any] = dataclasses.field(default_factory=list)
    audios: List[Any] = dataclasses.field(default_factory=list)
    max_tokens: int = 512
    temperature: float = 0.0
    top_p: float = 0.0
    min_p: float = 0.0
    top_k: int = -1
    stop: List[str] = dataclasses.field(default_factory=list)
    seed: Optional[int] = None
    # OpenAI response_format: {"type": "json_object"} or
    # {"type": "json_schema", "json_schema": {"schema": {...}}}
    response_format: Optional[dict] = None
    request_id: str = ""

    def __post_init__(self):
        if not self.request_id:
            self.request_id = uuid.uuid4().hex


@dataclasses.dataclass
class StreamingToken:
    token: Optional[int]
    text: str = ""
    logprob: float = 0.0
    finish_reason: Optional[str] = None
    error: Optional[str] = None


class ServerMetricsStore:
    """Rolling request metrics (reference generation.py:407)."""

    def __init__(self, history: int = 256):
        self.lock = threading.Lock()
        self.requests: List[dict] = []
        self.history = history
        self.started = time.time()
        self.total_prompt_tokens = 0
        self.total_generation_tokens = 0

    def record(self, env: dict):
        with self.lock:
            self.requests.append(env)
            self.total_prompt_tokens += env.get("prompt_tokens", 0)
            self.total_generation_tokens += env.get("generation_tokens", 0)
            if len(self.requests) > self.history:
                self.requests = self.requests[-self.history :]

    def snapshot(self) -> dict:
        with self.lock:
            recent = self.requests[-20:]
            return {
                "uptime_s": time.time() - self.started,
                "requests_total": len(self.requests),
                "total_prompt_tokens": self.total_prompt_tokens,
                "total_generation_tokens": self.total_generation_tokens,
                "recent": recent,
            }


class ResponseGenerator:
    """Owns the accelerator; all device work happens on this one thread."""

    def __init__(
        self,
        model,
        processor,
        num_slots: int = 8,
        capacity: int = 4096,
        block_size: int = 8,
        max_context: Optional[int] = None,
        token_queue_timeout: float = 600.0,
        apc=None,
        vision_cache=None,
        draft_model=None,
        num_draft: int = 4,
        kv_bits: Optional[int] = None,
        kv_group_size: int = 64,
    ):
        from ..generate.batch import BatchGenerator
        from ..generate.dispatch import _get_eos_ids

        self.model = model
        self.processor = processor
        self.apc = apc
        self.vision_cache = vision_cache
        # speculative serving (reference --draft-model +
        # run_speculative_server_rounds, speculative/utils.py:118): with a
        # draft model the whole slot set advances through shared batched
        # draft/verify rounds — concurrent requests at any temperature,
        # nothing blocks the batch loop
        self.draft_model = draft_model
        self.num_draft = num_draft
        self.eos_ids = tuple(_get_eos_ids(model, processor))
        self.max_context = max_context or capacity
        self.capacity = capacity
        self.token_queue_timeout = token_queue_timeout
        dtype = next(
            (
                l.dtype
                for l in jax.tree_util.tree_leaves(model.params)
                if jnp.issubdtype(l.dtype, jnp.floating)
            ),
            jnp.bfloat16,
        )
        if draft_model is not None:
            from ..speculative.batch import SpeculativeBatchGenerator

            if kv_bits:
                logger.warning(
                    "--kv-bits is not supported with --draft-model yet; "
                    "serving with full-precision KV")
            self.batch = SpeculativeBatchGenerator(
                model, draft_model, num_draft=num_draft,
                num_slots=num_slots, capacity=capacity,
                block_size=block_size, dtype=dtype,
            )
        else:
            # quantized serving KV (reference BatchQuantizedKVCache,
            # cache.py:1646): kv_bits 4/8 selects the fused integer-domain
            # batch caches — 2-4x less KV decode traffic at long contexts
            self.batch = BatchGenerator(
                model, num_slots=num_slots, capacity=capacity,
                block_size=block_size, dtype=dtype,
                kv_bits=kv_bits, kv_group_size=kv_group_size,
            )
        self.metrics = ServerMetricsStore()
        self._requests: "queue.Queue" = queue.Queue()
        self._cancel: set = set()
        self._cancel_lock = threading.Lock()
        self._queues: Dict[str, "queue.Queue[StreamingToken]"] = {}
        self._meta: Dict[str, dict] = {}
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True, name="tpu-owner")
        self._thread.start()

    # ------------------------------------------------------------ user side
    def generate(self, args: GenerationArguments):
        """Enqueue; returns an iterator of StreamingToken."""
        q: "queue.Queue[StreamingToken]" = queue.Queue()
        self._queues[args.request_id] = q
        self._requests.put(args)

        timeout = self.token_queue_timeout

        def it():
            try:
                while True:
                    try:
                        tok = q.get(timeout=timeout)
                    except queue.Empty:
                        yield StreamingToken(
                            token=None, finish_reason="error",
                            error="token queue timeout",
                        )
                        return
                    yield tok
                    if tok.finish_reason is not None or tok.error:
                        return
            finally:
                self._queues.pop(args.request_id, None)

        return it()

    def cancel(self, request_id: str):
        with self._cancel_lock:
            self._cancel.add(request_id)

    def shutdown(self):
        self._stop.set()
        self._thread.join(timeout=10)

    # ------------------------------------------------------------ TPU thread
    def _prepare(self, args: GenerationArguments):
        from ..generate.ar import embed_fn, jitted_method
        from ..generate.batch import BatchRequest, SamplingParams
        from ..utils.processing import prepare_inputs

        inputs = prepare_inputs(
            self.processor, args.prompt, images=args.images or None,
            audios=args.audios or None,
        )
        ids = np.asarray(inputs["input_ids"])
        if ids.shape[1] + args.max_tokens > self.max_context:
            if ids.shape[1] >= self.max_context:
                raise PromptTooLongError(
                    f"prompt has {ids.shape[1]} tokens; context budget is "
                    f"{self.max_context}"
                )
            args.max_tokens = self.max_context - ids.shape[1]
        # audio features -> model aux plan (qwen omni thinker path)
        audio_kw = {}
        feats_in = inputs.get("input_features")
        if feats_in is not None and hasattr(self.model, "audio_aux_inputs"):
            fmask = inputs.get("feature_attention_mask")
            fa = np.asarray(feats_in)
            lens = (
                [int(m.sum()) for m in np.asarray(fmask)]
                if fmask is not None
                else [fa.shape[-1]] * (fa.shape[0] if fa.ndim == 3 else 1)
            )
            audio_kw = {
                k: jnp.asarray(v)
                for k, v in self.model.audio_aux_inputs(fa, lens).items()
            }

        pixel_values = inputs.get("pixel_values")
        grid = inputs.get("image_grid_thw")
        if pixel_values is not None:
            aux = self.model.vision_aux_inputs(np.asarray(grid))
            aux_dev = {k: jnp.asarray(v) for k, v in aux.items()}
            feats = None
            if self.vision_cache is not None and hasattr(self.model, "vision_features"):
                ckey = self.vision_cache.key(pixel_values, grid)
                feats = self.vision_cache.get(ckey)
                if feats is None:
                    feats = jitted_method(self.model, "vision_features")(
                        self.model.params, jnp.asarray(pixel_values), **aux_dev
                    )
                    self.vision_cache.put(ckey, feats)
            if feats is not None:
                embeds = embed_fn(self.model)(
                    self.model.params, jnp.asarray(ids), image_features=feats,
                    **audio_kw,
                )
            else:
                embeds = embed_fn(self.model)(
                    self.model.params, jnp.asarray(ids), jnp.asarray(pixel_values),
                    **aux_dev, **audio_kw,
                )
        else:
            embeds = embed_fn(self.model)(
                self.model.params, jnp.asarray(ids), **audio_kw
            )
        pos, deltas = self.model.prepare_position_ids(
            ids, grid if pixel_values is not None else None
        )

        # --- APC: reuse the longest cached media-safe prefix
        prompt_cache = None
        prefix_len = 0
        harvest = None
        if self.apc is not None:
            from ..apc import semantic_extra_hash
            from ..generate.common import round_up as _ru

            tokens = ids[0].tolist()
            extra = semantic_extra_hash(
                model_key=str(
                    getattr(self.model, "config_dict", {}).get("model_type", "")
                ),
                images=[np.asarray(pixel_values)]
                if pixel_values is not None
                else None,
            )
            prefix_len, blocks = self.apc.lookup(tokens, extra)
            cap = _ru(ids.shape[1] + 65, 256)
            try:
                prompt_cache = self.apc.make_warm_cache(
                    blocks, self.model, cap, embeds.dtype
                )
            finally:
                self.apc.release(blocks)  # unpin once device copy is done

            def harvest(cache, _t=tokens, _e=extra, _s=int(ids.shape[1])):
                self.apc.commit(_t, cache, _e, upto=_s)

        self._meta[args.request_id] = {
            "prompt_tokens": int(ids.shape[1]),
            "t_submit": time.time(),
            "t_first": None,
            "generated": 0,
            "detok": self._make_detok(),
            "stop": args.stop,
            "tail": "",
        }
        return BatchRequest(
            uid=args.request_id,
            inputs_embeds=embeds,
            max_tokens=args.max_tokens,
            position_ids=pos,
            rope_delta=int(deltas[0, 0]),
            sampling=SamplingParams(
                temp=args.temperature, top_p=args.top_p,
                min_p=args.min_p, top_k=args.top_k,
            ),
            eos_ids=self.eos_ids,
            prompt_cache=prompt_cache,
            prefix_len=prefix_len,
            prompt_cache_callback=harvest,
            input_ids=ids,
        )

    def _make_detok(self):
        from ..utils.tokenizer import make_detokenizer

        tok = getattr(self.processor, "tokenizer", self.processor)
        return make_detokenizer(tok, skip_special_tokens=True)

    def _run_constrained(self, args: GenerationArguments):
        """Schema-constrained generation for one request (OpenAI
        response_format json_object / json_schema): host-stepped
        generate_step with the automaton sampler (structured.py), tokens
        streamed into the request queue like any batch row."""
        from ..generate.ar import embed_fn, generate_step
        from ..structured import (build_json_schema_logits_processor,
                                  make_constrained_sampler)
        from ..utils.processing import prepare_inputs
        from ..utils.tokenizer import make_detokenizer

        rf = args.response_format or {}
        # json_object still means "a JSON OBJECT" (OpenAI semantics), so the
        # schema-less mode gets an object root rather than any JSON value
        schema = {"type": "object"}
        if rf.get("type") == "json_schema":
            js = rf.get("json_schema") or {}
            schema = js.get("schema") or js or schema
        tok = getattr(self.processor, "tokenizer", self.processor)
        proc = build_json_schema_logits_processor(schema, tok)
        sampler = make_constrained_sampler(proc)
        q = self._queues.get(args.request_id)
        inputs = prepare_inputs(self.processor, args.prompt,
                                images=args.images or None)
        ids = np.asarray(inputs["input_ids"])
        if ids.shape[1] + args.max_tokens > self.max_context:
            args.max_tokens = max(1, self.max_context - ids.shape[1])
        if inputs.get("pixel_values") is not None:
            aux = self.model.vision_aux_inputs(
                np.asarray(inputs.get("image_grid_thw")))
            embeds = embed_fn(self.model)(
                self.model.params, jnp.asarray(ids),
                jnp.asarray(inputs["pixel_values"]),
                **{k: jnp.asarray(v) for k, v in aux.items()})
        else:
            embeds = embed_fn(self.model)(self.model.params, jnp.asarray(ids))
        n = 0
        sent = 0
        finish = "length"
        from ..structured import _openness

        # the automaton's text is the authoritative constrained output;
        # generate_step pipelines one block ahead of its yields, so the
        # emitted stream tracks proc.text diffs, not the detokenizer
        for t, lp in generate_step(embeds, self.model,
                                   max_tokens=args.max_tokens,
                                   sampler=sampler, block_size=1):
            tid = int(np.asarray(t).reshape(-1)[0])
            n += 1
            # flip the automaton into close-out mode once the remaining
            # budget barely covers closing the open structures (each level
            # can cost a few byte-level tokens, plus key->value detours)
            if (proc.close_after is None
                    and args.max_tokens - n
                    <= 4 * _openness(proc.text) + 4):
                proc.close_after = 0
            if tid in self.eos_ids:
                finish = "stop"
                break
            if q:
                new = proc.text[sent:]
                sent += len(new)
                q.put(StreamingToken(token=tid, text=new))
            if proc.done:
                finish = "stop"
                break
        tail = ""
        from ..structured import (force_complete, json_complete,
                                  schema_complete)

        final_text = proc.text
        if not proc.done:
            # run ended mid-document (length budget, or an EOS the deadlock
            # guard let through): append the grammar-forced completion
            # (structured.force_complete) so the client always receives one
            # valid schema-satisfying document
            final_text = force_complete(proc.text, schema)
            if (schema_complete(final_text, schema) if schema
                    else json_complete(final_text)):
                finish = "stop"
        tail = final_text[sent:]
        if q:
            q.put(StreamingToken(token=None, text=tail,
                                 finish_reason=finish))
        self.metrics.record({"prompt_tokens": int(ids.shape[1]),
                             "generation_tokens": n,
                             "constrained": True})

    def _run(self):
        while not self._stop.is_set():
            # admit queued HTTP requests
            try:
                args = self._requests.get(
                    timeout=0.005 if self.batch.num_active or self.batch.queue else 0.2
                )
            except queue.Empty:
                args = None
            if args is not None:
                with self._cancel_lock:
                    cancelled = args.request_id in self._cancel
                    self._cancel.discard(args.request_id)
                if cancelled:
                    continue
                rf = args.response_format or {}
                if str(rf.get("type", "")).startswith("json"):
                    # structured outputs run a dedicated host-stepped
                    # constrained loop on the owner thread (the batched
                    # block scan has no per-token host hook); concurrent
                    # rows resume after — correctness over throughput for
                    # the rare schema-constrained request
                    try:
                        self._run_constrained(args)
                    except Exception as e:  # noqa: BLE001
                        logger.exception("constrained generate failed")
                        q = self._queues.get(args.request_id)
                        if q:
                            q.put(StreamingToken(
                                token=None, finish_reason="error",
                                error=str(e)))
                    continue
                try:
                    req = self._prepare(args)
                    self.batch.insert(req)
                except Exception as e:  # noqa: BLE001
                    logger.exception("prepare failed")
                    q = self._queues.get(args.request_id)
                    if q:
                        q.put(StreamingToken(token=None, finish_reason="error",
                                             error=str(e)))
                continue  # admit any further queued requests before decoding

            # drain cancellations
            with self._cancel_lock:
                for rid in list(self._cancel):
                    self.batch.remove(rid)
                    self._meta.pop(rid, None)
                    self._cancel.clear()

            if not (self.batch.num_active or self.batch.queue):
                continue
            try:
                produced = self.batch.next()
            except Exception as e:  # noqa: BLE001
                logger.exception("batch step failed")
                for rid, q in list(self._queues.items()):
                    q.put(StreamingToken(token=None, finish_reason="error",
                                         error=str(e)))
                continue
            now = time.time()
            for rid, toks in produced.items():
                meta = self._meta.get(rid)
                q = self._queues.get(rid)
                if meta is None:
                    continue
                if meta["t_first"] is None:
                    meta["t_first"] = now
                finished = False
                for tok, lp in toks:
                    meta["generated"] += 1
                    is_eos = tok in self.eos_ids
                    text = ""
                    if not is_eos:
                        meta["detok"].add_token(tok)
                        text = meta["detok"].last_segment()
                    # stop-sequence scan (host-side): trim emitted text at
                    # the match point; keep enough tail history for stop
                    # strings that straddle segment boundaries.
                    stop_hit = None
                    if meta["stop"] and text:
                        prev_tail = meta["tail"]
                        combined = prev_tail + text
                        for s in meta["stop"]:
                            idx = combined.find(s)
                            if idx != -1:
                                stop_hit = s
                                text = text[: max(0, idx - len(prev_tail))]
                                break
                        keep = max(len(s) for s in meta["stop"]) - 1
                        meta["tail"] = combined[len(combined) - keep:] if keep > 0 else ""
                    finish = None
                    if is_eos:
                        finish = "stop"
                    elif stop_hit:
                        finish = "stop"
                        self.batch.remove(rid)
                    if q:
                        q.put(StreamingToken(token=None if is_eos else tok,
                                             text=text, logprob=lp,
                                             finish_reason=finish))
                    if finish:
                        finished = True
                        break
                still_active = any(
                    s is not None and s.req.uid == rid for s in self.batch.slots
                ) or any(r.uid == rid for r in self.batch.queue)
                if not finished and not still_active:
                    # length exhausted
                    if q:
                        tail = meta["detok"].finalize()
                        q.put(StreamingToken(token=None, text=tail,
                                             finish_reason="length"))
                    finished = True
                if finished:
                    decode_s = now - (meta["t_first"] or now)
                    env = {
                        "request_id": rid,
                        "prompt_tokens": meta["prompt_tokens"],
                        "generation_tokens": meta["generated"],
                        "ttft_s": (meta["t_first"] or now) - meta["t_submit"],
                        # tokens after the first, over decode wall time; 0 when
                        # everything landed in a single scheduler cycle
                        "generation_tps": (
                            (meta["generated"] - 1) / decode_s
                            if decode_s > 1e-6
                            else 0.0
                        ),
                    }
                    pop_stats = getattr(self.batch, "pop_stats", None)
                    st = pop_stats(rid) if pop_stats is not None else None
                    if st is not None and st.rounds:
                        env["speculative"] = {
                            "rounds": st.rounds,
                            "drafted": st.drafted,
                            "accepted": st.accepted,
                            "acceptance_rate": round(st.acceptance_rate, 4),
                        }
                    self.metrics.record(env)
                    self._meta.pop(rid, None)
