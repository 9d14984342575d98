"""High-level generate / stream_generate APIs.

Role parity: reference `mlx_vlm/generate/dispatch.py` — stream_generate:700,
generate:1110, main:1233 (CLI).
"""

from __future__ import annotations

import os
import time
from typing import Any, Generator, List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ..core.sampling import make_logits_processors, make_sampler
from ..utils.processing import prepare_inputs
from .ar import embed_fn, generate_step, get_engine, jitted_method
from .common import GenerationResult, device_peak_memory_gb

__all__ = ["stream_generate", "generate"]


def _get_eos_ids(model, processor) -> set:
    eos = set()
    cfg = getattr(model, "config_dict", {}) or {}
    v = cfg.get("eos_token_id")
    if v is None and isinstance(cfg.get("text_config"), dict):
        v = cfg["text_config"].get("eos_token_id")
    if isinstance(v, int):
        eos.add(v)
    elif isinstance(v, (list, tuple)):
        eos.update(v)
    tok = getattr(processor, "tokenizer", processor)
    tid = getattr(tok, "eos_token_id", None)
    if tid is not None:
        eos.add(int(tid))
    return eos


def stream_generate(
    model,
    processor,
    prompt: Union[str, List[int], np.ndarray],
    image: Optional[Any] = None,
    audio: Optional[Any] = None,
    video: Optional[Any] = None,
    *,
    max_tokens: int = 256,
    temperature: float = 0.0,
    top_p: float = 0.0,
    min_p: float = 0.0,
    top_k: int = -1,
    repetition_penalty: Optional[float] = None,
    repetition_context_size: int = 20,
    logit_bias: Optional[dict] = None,
    seed: Optional[int] = None,
    prefill_step_size: int = 512,
    block_size: int = 32,
    kv_bits: Optional[int] = None,
    kv_group_size: int = 64,
    apc=None,
    vision_cache=None,
    **kwargs,
) -> Generator[GenerationResult, None, None]:
    """Stream GenerationResult chunks (reference dispatch.py:700).

    `apc` is an mlx_vlm_tpu.apc.APCManager for automatic prefix caching;
    `vision_cache` an mlx_vlm_tpu.vision_cache.VisionFeatureCache.
    """
    from .diffusion import is_diffusion_model, stream_diffusion_generate
    from .encdec import is_encdec_model, stream_encdec_generate

    if is_diffusion_model(model):
        # diffusion-LM dispatch (reference dispatch.py:~780 routes to the
        # canvas decoder before the AR path)
        yield from stream_diffusion_generate(
            model, processor, prompt, max_tokens=max_tokens, **kwargs
        )
        return
    if is_encdec_model(model):
        # encoder-decoder dispatch (florence2-class)
        yield from stream_encdec_generate(
            model, processor, prompt, image=image, max_tokens=max_tokens,
            **kwargs
        )
        return

    inputs = prepare_inputs(
        processor, prompt, images=image, videos=video, audios=audio
    )
    input_ids = inputs["input_ids"]
    pixel_values = inputs.get("pixel_values")
    grid_thw = inputs.get("image_grid_thw")
    if grid_thw is None:
        grid_thw = inputs.get("video_grid_thw")
    attention_mask = inputs.get("attention_mask")

    # --- audio tower aux (omni-style models)
    audio_aux_dev = {}
    input_features = inputs.get("input_features")
    if input_features is not None and hasattr(model, "audio_aux_inputs"):
        feats_np = np.asarray(input_features)
        fam = inputs.get("feature_attention_mask")
        if fam is not None:
            lens = np.asarray(fam).sum(axis=-1).astype(int).tolist()
        elif feats_np.ndim == 3:
            lens = [feats_np.shape[-1]] * feats_np.shape[0]
        else:
            lens = [feats_np.shape[-1]]
        audio_aux_dev = {
            k: jnp.asarray(v)
            for k, v in model.audio_aux_inputs(feats_np, lens).items()
        }

    tic = time.perf_counter()
    # --- embed (vision tower + merge) on device
    ids_dev = jnp.asarray(input_ids)
    if audio_aux_dev and pixel_values is None:
        embeds = embed_fn(model)(
            model.params, ids_dev, **audio_aux_dev
        )
    elif pixel_values is not None:
        aux = model.vision_aux_inputs(np.asarray(grid_thw))
        aux_dev = {k: jnp.asarray(v) for k, v in aux.items()}
        feats = None
        if vision_cache is not None and hasattr(model, "vision_features"):
            ckey = vision_cache.key(pixel_values, grid_thw)
            feats = vision_cache.get(ckey)
            if feats is None:
                feats = jitted_method(model, "vision_features")(
                    model.params, jnp.asarray(pixel_values), **aux_dev
                )
                vision_cache.put(ckey, feats)
            embeds = embed_fn(model)(
                model.params, ids_dev, image_features=feats
            )
        else:
            embeds = embed_fn(model)(
                model.params, ids_dev, jnp.asarray(pixel_values),
                **aux_dev, **audio_aux_dev,
            )
    else:
        embeds = embed_fn(model)(model.params, ids_dev)

    # --- APC lookup: reuse the longest cached, media-safe prefix
    prompt_cache = None
    prefix_len = 0
    prompt_cache_callback = None
    if apc is not None:
        from ..apc import media_safe_prefix_min, semantic_extra_hash
        from ..apc_adapters import model_apc_mode
        from .common import round_up as _round_up

        tokens = np.asarray(input_ids)[0].tolist()
        extra = semantic_extra_hash(
            model_key=str(getattr(model, "config_dict", {}).get("model_type", "")),
            images=[np.asarray(pixel_values)] if pixel_values is not None else None,
        )
        S = int(np.asarray(input_ids).shape[1])
        capacity = _round_up(S + max_tokens + block_size + 65, 256)
        mode = model_apc_mode(model, kv_bits=kv_bits,
                              kv_group_size=kv_group_size)
        if mode == "exact":
            # hybrid SSM/quantized layouts: whole-prefix snapshot reuse at
            # a guarded boundary (reference apc_lookup_plan exact branch +
            # exact_cache_guard_tokens:2864)
            guard = max(1, int(os.environ.get(
                "APC_EXACT_PREFIX_GUARD_TOKENS", "16")))
            prefix_len, prompt_cache = apc.lookup_exact(
                tokens, extra,
                min_prefix_tokens=media_safe_prefix_min(
                    tokens, apc.media_token_ids),
                max_prefix_tokens=S - guard,
                min_capacity=capacity,
            )

            def prompt_cache_callback(cache, _tokens=tokens, _extra=extra,
                                      _cap=capacity):
                apc.store_exact(_tokens, cache, _extra, capacity=_cap)

        elif mode == "block":
            prefix_len, blocks = apc.lookup(tokens, extra)
            try:
                prompt_cache = apc.make_warm_cache(blocks, model, capacity,
                                                   embeds.dtype)
            finally:
                apc.release(blocks)

            def prompt_cache_callback(cache, _tokens=tokens, _extra=extra,
                                      _S=S):
                apc.commit(_tokens, cache, _extra, upto=_S)

    position_ids, rope_deltas = model.prepare_position_ids(
        np.asarray(input_ids),
        None if pixel_values is None else np.asarray(inputs.get("image_grid_thw"))
        if inputs.get("image_grid_thw") is not None
        else None,
        np.asarray(inputs["video_grid_thw"])
        if inputs.get("video_grid_thw") is not None
        else None,
        attention_mask,
    )

    sampler = make_sampler(temperature, top_p, min_p, top_k)
    processors = make_logits_processors(
        logit_bias, repetition_penalty, repetition_context_size
    )

    eos_ids = _get_eos_ids(model, processor)
    tok = getattr(processor, "tokenizer", processor)
    from ..utils.tokenizer import make_detokenizer

    detok = make_detokenizer(tok)

    prompt_tokens = int(np.asarray(input_ids).shape[1])
    prompt_time = None
    gen_start = None
    n = 0
    finish_reason = "length"
    draft_model = kwargs.get("draft_model")
    if draft_model is not None:
        # speculative decoding (reference --draft-model, dispatch.py:700):
        # distribution-preserving at any temperature via the rejection walk
        # (reference common.py:46,135); greedy (temp=0) stays lossless
        from ..speculative.utils import speculative_generate_step

        token_iter = speculative_generate_step(
            embeds, model, draft_model,
            input_ids=np.asarray(input_ids),
            position_ids=position_ids,
            rope_deltas=rope_deltas,
            max_tokens=max_tokens,
            num_draft=int(kwargs.get("num_draft_tokens", 4)),
            prefill_step_size=prefill_step_size,
            temperature=temperature, top_p=top_p, min_p=min_p, top_k=top_k,
            seed=seed,
        )
    else:
        token_iter = generate_step(
            embeds,
            model,
            position_ids=position_ids,
            rope_deltas=rope_deltas,
            max_tokens=max_tokens,
            sampler=sampler,
            logits_processors=processors,
            prefill_step_size=prefill_step_size,
            block_size=block_size,
            kv_bits=kv_bits,
            kv_group_size=kv_group_size,
            prompt_cache=prompt_cache,
            prefix_len=prefix_len,
            prompt_cache_callback=prompt_cache_callback,
            seed=seed,
        )
    from ..utils.profiling import annotate, global_phases

    phases = global_phases()
    while True:
        # first pull runs the prefill program; the rest are decode steps —
        # both show up as named regions in an XLA trace (utils/profiling)
        with annotate("prefill" if prompt_time is None else "decode",
                      phases):
            try:
                token, logprobs = next(token_iter)
            except StopIteration:
                break
        now = time.perf_counter()
        if prompt_time is None:
            prompt_time = now - tic
            gen_start = now
        t = int(np.asarray(token).reshape(-1)[0])
        n += 1
        if t in eos_ids:
            finish_reason = "stop"
            yield GenerationResult(
                text="",
                token=t,
                logprobs=logprobs,
                prompt_tokens=prompt_tokens,
                generation_tokens=n,
                prompt_tps=prompt_tokens / max(prompt_time, 1e-9),
                generation_tps=(n - 1) / max(now - gen_start, 1e-9),
                peak_memory=device_peak_memory_gb(),
                finish_reason=finish_reason,
            )
            return
        detok.add_token(t)
        is_last = n >= max_tokens
        text = detok.last_segment()
        if is_last:
            text += detok.finalize()
        yield GenerationResult(
            text=text,
            token=t,
            logprobs=logprobs,
            prompt_tokens=prompt_tokens,
            generation_tokens=n,
            prompt_tps=prompt_tokens / max(prompt_time, 1e-9),
            generation_tps=(n - 1) / max(now - gen_start, 1e-9) if n > 1 else 0.0,
            peak_memory=device_peak_memory_gb(),
            finish_reason="length" if is_last else None,
        )


def generate(
    model,
    processor,
    prompt: Union[str, List[int]],
    image: Optional[Any] = None,
    audio: Optional[Any] = None,
    video: Optional[Any] = None,
    verbose: bool = False,
    **kwargs,
) -> GenerationResult:
    """Blocking generate (reference dispatch.py:1110)."""
    pieces: List[str] = []
    last: Optional[GenerationResult] = None
    for res in stream_generate(model, processor, prompt, image, audio, video, **kwargs):
        pieces.append(res.text)
        last = res
        if verbose and res.text:
            print(res.text, end="", flush=True)
    if verbose:
        print()
        if last:
            print(
                f"Prompt: {last.prompt_tokens} tokens, {last.prompt_tps:.3f} tokens-per-sec"
            )
            print(
                f"Generation: {last.generation_tokens} tokens, "
                f"{last.generation_tps:.3f} tokens-per-sec"
            )
            print(f"Peak memory: {last.peak_memory:.3f} GB")
    text = "".join(pieces)
    if last is None:
        return GenerationResult(
            text="", token=None, logprobs=None, prompt_tokens=0,
            generation_tokens=0, prompt_tps=0.0, generation_tps=0.0,
            peak_memory=0.0, finish_reason="length",
        )
    last.text = text
    return last
