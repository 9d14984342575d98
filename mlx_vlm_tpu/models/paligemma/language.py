"""Gemma-1 / Gemma-2 decoder for PaliGemma.

Role parity: reference mlx_vlm/models/paligemma/language.py — RMSNorm(1+w):36,
gemma vs gemma2 scale/head_dim:49-58, attn logit softcapping:109-111, gemma
post-attention block vs gemma2 sandwich norms:189-199, sqrt(D) embed
normalizer:227, bidirectional prefix attention:233-241, final logit
softcapping:272-274.

TPU design: one lax.scan over stacked layers.  PaliGemma's bidirectional
prefix is handled by mask choice: q_len > 1 is a prefill (all prompt tokens
see each other — reference passes mask=None, i.e. full attention, whenever
use_bidirectional); q_len == 1 decode uses the causal cache mask, which is
identical for a single trailing query.  gemma2's sliding/full alternation is
a scanned per-layer flag selecting between two precomputed masks (same
pattern as gemma3).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import embedding, embedding_as_linear, linear, rms_norm
from ...core.mask import causal_cache_mask, full_valid_mask
from ...core.rope import apply_rope, default_inv_freq, rope_cos_sin
from ...ops.attention import sdpa
from .config import TextConfig


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        if args.model_type not in ("gemma", "gemma2"):
            raise ValueError(f"PaliGemma text model {args.model_type!r} unsupported")
        self.args = args
        self.config = config or args
        self.is_gemma2 = args.model_type == "gemma2"
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.head_dim
        if self.is_gemma2 and args.query_pre_attn_scalar:
            self.scale = args.query_pre_attn_scalar**-0.5
        else:
            self.scale = self.head_dim**-0.5
        self.inv_freq = jnp.asarray(
            default_inv_freq(self.head_dim, args.rope_theta), jnp.float32
        )
        layer_types = args.layer_types or ["full_attention"] * args.num_hidden_layers
        self.is_full = np.asarray([t == "full_attention" for t in layer_types])
        self.any_sliding = not all(self.is_full)
        self.bidirectional = bool(args.use_bidirectional_attention)

    def _masks(self, cache, B, S):
        """(full-attention mask, sliding mask) for this call."""
        args = self.args
        if cache is None:
            zero, lp0 = jnp.zeros((), jnp.int32), jnp.zeros((B,), jnp.int32)
            off, lp, cap = zero, lp0, S
        else:
            off, lp, cap = cache.offset, cache.left_pad, cache.capacity
        if self.bidirectional and S > 1:
            total = (off if off.ndim == 0 else off[:, None]) + S
            m = full_valid_mask(lp, total, cap)[:, None, None, :]
            mask_g = jnp.broadcast_to(m, (B, 1, S, cap))
            return mask_g, mask_g  # window ignored within the prefix
        mask_g = causal_cache_mask(off, lp, S, cap)
        if not self.any_sliding:
            return mask_g, mask_g
        return mask_g, causal_cache_mask(off, lp, S, cap, window=args.sliding_window)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        args = self.args
        B, S, _ = inputs_embeds.shape
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos, sin = rope_cos_sin(position_ids, self.inv_freq)
        h = inputs_embeds * jnp.asarray(args.hidden_size**0.5, inputs_embeds.dtype)
        mp = params["model"]
        eps = args.rms_norm_eps
        mask_g, mask_l = self._masks(cache, B, S)
        flags = jnp.asarray(self.is_full)
        softcap = args.attn_logit_softcapping if self.is_gemma2 else None

        def layer(h, xs):
            if cache is None:
                lp, is_full = xs
                cxs = None
            else:
                lp, cxs, is_full = xs
            mask = jnp.where(is_full, mask_g, mask_l)
            x = rms_norm(lp["input_layernorm"], h, eps, offset=1.0)
            q, k, v = self._qkv(lp["self_attn"], x)
            q, k = apply_rope(q, k, cos, sin)
            if cache is None:
                attn = sdpa(q, k, v, self.scale, mask, logit_softcap=softcap)
            else:
                attn, cxs = cache.attend(
                    cxs, q, k, v, self.scale, mask,
                    flash_ok=False, logit_softcap=softcap,
                )
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
            attn = linear(lp["self_attn"]["o_proj"], attn)
            if self.is_gemma2:
                # sandwich norms (reference language.py:195-199)
                h = h + rms_norm(lp["post_attention_layernorm"], attn, eps, offset=1.0)
                x = rms_norm(lp["pre_feedforward_layernorm"], h, eps, offset=1.0)
                r = self._mlp(lp["mlp"], x)
                h = h + rms_norm(lp["post_feedforward_layernorm"], r, eps, offset=1.0)
            else:
                h = h + attn
                x = rms_norm(lp["post_attention_layernorm"], h, eps, offset=1.0)
                h = h + self._mlp(lp["mlp"], x)
            return h, cxs

        if cache is None:
            h, _ = jax.lax.scan(layer, h, (mp["layers"], flags))
            return rms_norm(mp["norm"], h, eps, offset=1.0), None
        h, cys = jax.lax.scan(layer, h, (mp["layers"], cache.scan_arrays(), flags))
        h = rms_norm(mp["norm"], h, eps, offset=1.0)
        return h, cache.with_arrays(cys, S)

    def _mlp(self, p, x):
        g = linear(p["gate_proj"], x)
        u = linear(p["up_proj"], x)
        return linear(p["down_proj"], jax.nn.gelu(g, approximate=True) * u)

    def _qkv(self, p, x):
        B, S, _ = x.shape
        q = linear(p["q_proj"], x).reshape(B, S, self.n_heads, self.head_dim)
        k = linear(p["k_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        v = linear(p["v_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        return q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)

    def logits(self, params, hidden):
        out = embedding_as_linear(params["model"]["embed_tokens"], hidden)
        cap = self.args.final_logit_softcapping
        if self.is_gemma2 and cap:
            out = jnp.tanh(out / cap) * cap
        return out

    def embed(self, params, input_ids):
        return embedding(params["model"]["embed_tokens"], input_ids)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16, left_pad=None):
        return cache_lib.init_cache(
            self.args.num_hidden_layers, batch_size, self.n_kv_heads,
            self.head_dim, capacity, dtype, left_pad,
        )
