"""Encoder-decoder (Florence-2-class) text generation.

Role parity: reference generate path for encoder-decoder models —
florence2/language.py LanguageModel.__call__ (encoder runs once, its output
rides along as cross_attention_states; decode consumes one token at a time
with self+cross KV caches).

TPU design: the encoder is ONE jitted forward; every layer's cross-attn K/V
is precomputed at cache init; decode steps are a single jitted program with
a cursor-written self-attn cache (free rollback, no concat growth).
"""

from __future__ import annotations

import time
from typing import Generator, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .ar import embed_fn
from .common import GenerationResult, device_peak_memory_gb, round_up


def is_encdec_model(model) -> bool:
    return bool(getattr(model, "is_encoder_decoder", False))


def encdec_generate_step(
    model,
    inputs_embeds: jax.Array,  # [B, S_enc, D] encoder input stream
    *,
    enc_mask: Optional[jax.Array] = None,
    max_tokens: int = 128,
) -> Generator[np.ndarray, None, None]:
    """Greedy decoder loop over a once-encoded input."""
    params = model.params
    tc = model.config.text_config
    B = inputs_embeds.shape[0]
    capacity = round_up(max_tokens + 2, 128)

    encode = jax.jit(model.encode)
    enc_hidden = encode(params, inputs_embeds, enc_mask)
    cache = model.init_decode_cache(params, enc_hidden, enc_mask, capacity,
                                    inputs_embeds.dtype)

    @jax.jit
    def step(params, cache, tok):
        logits, cache = model.decode(params, cache, tok[:, None])
        nxt = jnp.argmax(logits[:, -1].astype(jnp.float32), axis=-1)
        return nxt.astype(jnp.int32), cache

    tok = jnp.full((B,), tc.decoder_start_token_id, jnp.int32)
    for _ in range(max_tokens):
        tok, cache = step(params, cache, tok)
        yield np.asarray(tok)


def stream_encdec_generate(
    model,
    processor,
    prompt,
    image=None,
    max_tokens: int = 128,
    **kwargs,
) -> Generator[GenerationResult, None, None]:
    """Florence-2-style generation: bare task prompt + optional image."""
    from ..utils.processing import prepare_inputs
    from ..utils.tokenizer import make_detokenizer

    inputs = prepare_inputs(processor, prompt, images=image)
    ids = np.asarray(inputs["input_ids"])
    pixel_values = inputs.get("pixel_values")
    if pixel_values is not None:
        pv = np.asarray(pixel_values)
        if pv.ndim == 4 and pv.shape[1] in (1, 3) and pv.shape[-1] not in (
                1, 3):
            pv = pv.transpose(0, 2, 3, 1)  # NCHW -> NHWC
        pixel_values = jnp.asarray(pv)
    # strip image placeholder ids (reference get_input_embeddings:267 —
    # florence2 embeds the bare task prompt; image tokens ride separately)
    img_id = getattr(model.config, "image_token_id", None)
    if img_id is not None:
        keep = ids[0] != img_id
        ids = ids[:, keep] if keep.ndim == 1 else ids

    tic = time.perf_counter()
    embeds = embed_fn(model)(
        model.params, jnp.asarray(ids), pixel_values)

    tok_owner = getattr(processor, "tokenizer", processor)
    detok = make_detokenizer(tok_owner)
    eos = {model.config.text_config.eos_token_id}
    prompt_tokens = int(embeds.shape[1])
    prompt_time = None
    gen_start = None
    n = 0
    for tok in encdec_generate_step(model, embeds, max_tokens=max_tokens):
        now = time.perf_counter()
        if prompt_time is None:
            prompt_time = now - tic
            gen_start = now
        t = int(tok.reshape(-1)[0])
        n += 1
        finish = None
        if t in eos:
            finish = "stop"
        elif n >= max_tokens:
            finish = "length"
        text = ""
        if finish != "stop":
            detok.add_token(t)
            text = detok.last_segment()
            if finish == "length":
                text += detok.finalize()
        yield GenerationResult(
            text=text,
            token=t,
            logprobs=None,
            prompt_tokens=prompt_tokens,
            generation_tokens=n,
            prompt_tps=prompt_tokens / max(prompt_time, 1e-9),
            generation_tps=(n - 1) / max(now - gen_start, 1e-9) if n > 1
            else 0.0,
            peak_memory=device_peak_memory_gb(),
            finish_reason=finish,
        )
        if finish is not None:
            return
