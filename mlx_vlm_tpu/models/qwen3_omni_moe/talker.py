"""Qwen3-Omni talker: codec-token generator + residual code predictor.

Role parity: reference mlx_vlm/models/qwen3_omni_moe/talker.py — the
Talker MoE decoder (Qwen3-MoE block with shared expert over the codec
vocabulary), text/hidden resize MLPs bridging thinker width, the codec
head, and the CodePredictor that autoregressively emits the 15 residual
codebook groups per talker step.

TPU design: reuses the scan-stacked MoE decoder (qwen2_moe) and dense
decoder (llama) substrates with fixed-capacity caches.  One jitted
talker step per codec token; the WHOLE code-predictor round (2-token
prefill + 14 single-token steps with per-group embeddings/heads indexed
by `lax.scan`) is one jitted program — not 15 dispatches.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import linear
from ..llama.language import LanguageModel as _DenseLM
from ..qwen2_moe.language import MoELanguageModel as _MoELM
from .config import TalkerConfig


def resize_mlp(p: dict, x: jax.Array) -> jax.Array:
    """TalkerResizeMlp: fc2(silu(fc1(x))) bridging thinker width."""
    return linear(p["linear_fc2"], jax.nn.silu(linear(p["linear_fc1"], x)))


def _top_p_sample(logits: jax.Array, key, temp: float, top_p: float
                  ) -> jax.Array:
    if temp <= 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    x = logits.astype(jnp.float32) / temp
    if 0 < top_p < 1.0:
        order = jnp.argsort(-x, axis=-1)
        sx = jnp.take_along_axis(x, order, axis=-1)
        probs = jax.nn.softmax(sx, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep_sorted = (cum - probs) < top_p
        ranks = jnp.argsort(order, axis=-1)
        keep = jnp.take_along_axis(keep_sorted, ranks, axis=-1)
        x = jnp.where(keep, x, -jnp.inf)
    return jax.random.categorical(key, x, axis=-1).astype(jnp.int32)


class Talker:
    """Functional talker over params["talker"]."""

    def __init__(self, config: TalkerConfig):
        self.config = config
        self.lm = _MoELM(config.text_config)
        self.cp = _DenseLM(config.code_predictor_config)
        self._step_fn = None
        self._cp_fn = None
        self._prefill_fn = None

    # ------------------------------------------------------------- programs
    def _get_prefill(self):
        if self._prefill_fn is None:

            @partial(jax.jit, donate_argnums=(2,), static_argnums=())
            def prefill(tp, embeds, cache):
                pos = jnp.arange(embeds.shape[1], dtype=jnp.int32)[None]
                hidden, cache = self.lm(tp["language_model"], embeds, cache, pos)
                logits = linear(tp["codec_head"], hidden[:, -1])
                return logits, hidden[:, -1:], cache

            self._prefill_fn = prefill
        return self._prefill_fn

    def _get_step(self):
        if self._step_fn is None:

            @partial(jax.jit, donate_argnums=(2,))
            def step(tp, embeds, cache):
                pos = jnp.broadcast_to(cache.offset[None, None],
                                       (1, 1)).astype(jnp.int32)
                hidden, cache = self.lm(tp["language_model"], embeds, cache, pos)
                logits = linear(tp["codec_head"], hidden[:, -1])
                return logits, hidden[:, -1:], cache

            self._step_fn = step
        return self._step_fn

    def _get_cp_round(self):
        """One jitted program: full residual-code round for one talker
        token (reference prepare_inputs_for_generation)."""
        if self._cp_fn is not None:
            return self._cp_fn
        cpc = self.config.code_predictor_config
        G = self.config.num_code_groups
        cp = self.cp

        @partial(jax.jit, static_argnums=(4, 5))
        def cp_round(tp, past_hidden, token, key, temp, top_p):
            cpp = tp["code_predictor"]
            last_id_hidden = tp["codec_embedding"]["weight"][token][:, None]
            cache = cp.init_cache(1, 16, last_id_hidden.dtype)
            emb2 = jnp.concatenate([past_hidden, last_id_hidden], axis=1)
            pos = jnp.arange(2, dtype=jnp.int32)[None]
            hidden, cache = cp(cpp, emb2, cache, pos)
            heads = tp["cp_heads"]            # [G-1, V, Dcp] stacked
            embs = tp["cp_embeds"]            # [G-1, V, Dcp] stacked
            logits = hidden[:, -1] @ heads[0].T
            key, sub = jax.random.split(key)
            tok = _top_p_sample(logits, sub, temp, top_p)

            def body(carry, i):
                cache, tok, key = carry
                e = embs[i - 1][tok][:, None]          # [1, 1, Dcp]
                pos = jnp.broadcast_to(cache.offset[None, None], (1, 1))
                h, cache = cp(cpp, e, cache, pos + jnp.zeros((1, 1),
                                                             jnp.int32))
                lg = h[:, -1] @ heads[i].T
                key, sub = jax.random.split(key)
                nxt = _top_p_sample(lg, sub, temp, top_p)
                return (cache, nxt, key), (nxt, e[:, 0])

            (cache, tok_last, key), (toks, mids) = jax.lax.scan(
                body, (cache, tok, key), jnp.arange(1, G - 1))
            last_res_hidden = embs[G - 2][tok_last][:, None]
            # codec hidden sum: last_id + mid residual embeds + last
            mid_sum = mids.sum(axis=0)[:, None]
            emb_next = last_id_hidden + mid_sum + last_res_hidden
            codes = jnp.concatenate(
                [token[:, None], tok[:, None], toks.T], axis=1)  # [1, G]
            return emb_next, codes, key

        self._cp_fn = cp_round
        return cp_round

    # ------------------------------------------------------------- generate
    def generate_codes(self, tp: dict, inputs_embeds: jax.Array,
                       trailing_text_hidden: jax.Array,
                       tts_pad_embed: jax.Array,
                       max_new_tokens: int = 2048,
                       temperature: float = 0.9, top_p: float = 1.0,
                       seed: int = 0) -> np.ndarray:
        """-> codes [1, num_code_groups, T] (reference Talker.generate)."""
        cfg = self.config
        S = inputs_embeds.shape[1]
        cap = -(-(S + max_new_tokens + 1) // 256) * 256
        cache = self.lm.init_cache(1, cap, inputs_embeds.dtype)
        prefill = self._get_prefill()
        step = self._get_step()
        cp_round = self._get_cp_round()

        logits, past_hidden, cache = prefill(tp, inputs_embeds, cache)
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        token = _top_p_sample(logits, sub, temperature, top_p)

        all_codes = []
        trail_len = trailing_text_hidden.shape[1]
        for gstep in range(max_new_tokens):
            if int(token[0]) == cfg.codec_eos_token_id:
                break
            emb_next, codes, key = cp_round(
                tp, past_hidden, token, key, float(temperature), 0.8)
            if gstep < trail_len:
                emb_next = emb_next + trailing_text_hidden[:, gstep][:, None]
            else:
                emb_next = emb_next + tts_pad_embed
            all_codes.append(np.asarray(codes))
            logits, past_hidden, cache = step(tp, emb_next, cache)
            key, sub = jax.random.split(key)
            token = _top_p_sample(logits, sub, temperature, top_p)
        if not all_codes:
            return np.zeros((1, cfg.num_code_groups, 0), np.int32)
        return np.stack(all_codes, axis=2)  # [1, G, T] from T x [1, G]
