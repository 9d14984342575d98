"""GPT-OSS decoder: attention sinks + alternating sliding/full layers +
clipped-SwiGLU MoE with expert biases.

Role parity: reference mlx_vlm/models/gpt_oss/language.py — per-head sink
logits in the softmax denominator:59,101; sliding/full layer_types
alternation:176-204; clipped swiglu (alpha 1.702, limit 7, (up+1)*glu):28-37;
topk-then-softmax router with bias:126-137; fused gate_up_proj interleaved
checkpoint tensors (sanitize:225-262).

TPU design: one lax.scan over stacked layers; the sliding/full choice is a
scanned boolean selecting between two precomputed masks (gemma3 pattern),
sinks ride the scan as a stacked [L, n_heads] leaf and enter the fp32
softmax as one extra column.  Routing math: softmax over the selected
logits == renormalised softmax, computed with biased router logits.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import embedding, embedding_as_linear, linear, rms_norm
from ...core.mask import causal_cache_mask
from ...core.moe import switch_glu
from ...core.rope import apply_rope, make_rope
from ...ops.attention import sdpa
from .config import TextConfig

ALPHA = 1.702
LIMIT = 7.0


def clipped_swiglu(g, u):
    """(up+1) * gate*sigmoid(alpha*gate), both paths clipped (reference
    gpt_oss/language.py:28)."""
    g = jnp.clip(g, None, LIMIT)
    u = jnp.clip(u, -LIMIT, LIMIT)
    glu = g * jax.nn.sigmoid(ALPHA * g.astype(jnp.float32)).astype(g.dtype)
    return (u + 1.0) * glu


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.head_dim
        self.scale = self.head_dim**-0.5
        self.top_k = args.num_experts_per_tok
        self.rope = make_rope(
            self.head_dim, args.rope_theta, args.rope_scaling,
            args.max_position_embeddings,
        )
        lt = args.layer_types or (
            ["sliding_attention", "full_attention"]
            * (args.num_hidden_layers // 2 + 1)
        )[: args.num_hidden_layers]
        self.is_full = np.asarray([t == "full_attention" for t in lt])

    def __call__(self, params, inputs_embeds, cache, position_ids, causal=True):
        args = self.args
        B, S, _ = inputs_embeds.shape
        cos, sin = self.rope.cos_sin(position_ids)
        h = inputs_embeds
        mp = params["model"]
        eps = args.rms_norm_eps

        if cache is None:
            zero = jnp.zeros((), jnp.int32)
            lp0 = jnp.zeros((B,), jnp.int32)
            mask_f = causal_cache_mask(zero, lp0, S, S)
            mask_s = causal_cache_mask(zero, lp0, S, S,
                                       window=args.sliding_window)
        else:
            mask_f = causal_cache_mask(cache.offset, cache.left_pad, S,
                                       cache.capacity)
            mask_s = causal_cache_mask(cache.offset, cache.left_pad, S,
                                       cache.capacity,
                                       window=args.sliding_window)

        flags = jnp.asarray(self.is_full)

        def layer(h, xs):
            if cache is None:
                lp, full = xs
            else:
                lp, cxs, full = xs
            mask = jnp.where(full, mask_f, mask_s)
            x = rms_norm(lp["input_layernorm"], h, eps)
            q, k, v = self._qkv(lp["self_attn"], x)
            q, k = apply_rope(q, k, cos, sin)
            sinks = lp["self_attn"]["sinks"]
            if cache is None:
                attn = sdpa(q, k, v, self.scale, mask, sinks=sinks)
            else:
                # flash path can't see the traced mask select or sinks
                attn, cxs = cache.attend(
                    cxs, q, k, v, self.scale, mask, flash_ok=False,
                    sinks=sinks,
                )
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
            h = h + linear(lp["self_attn"]["o_proj"], attn)
            x = rms_norm(lp["post_attention_layernorm"], h, eps)
            h = h + self._moe(lp["mlp"], x)
            if cache is None:
                return h, None
            return h, cxs

        if cache is None:
            h, _ = jax.lax.scan(layer, h, (mp["layers"], flags))
            return rms_norm(mp["norm"], h, eps), None

        h, cys = jax.lax.scan(layer, h, (mp["layers"], cache.scan_arrays(), flags))
        h = rms_norm(mp["norm"], h, eps)
        return h, cache.with_arrays(cys, S)

    def _qkv(self, p, x):
        B, S, _ = x.shape
        q = linear(p["q_proj"], x).reshape(B, S, self.n_heads, self.head_dim)
        k = linear(p["k_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        v = linear(p["v_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        return (q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3))

    def _moe(self, p, x):
        B, S, D = x.shape
        flat = x.reshape(B * S, D)
        logits = linear(p["router"], flat).astype(jnp.float32)
        vals, indices = jax.lax.top_k(logits, self.top_k)
        weights = jax.nn.softmax(vals, axis=-1)
        ex = p["experts"]
        out = switch_glu(
            flat,
            ex["gate_proj"]["weight"], ex["up_proj"]["weight"],
            ex["down_proj"]["weight"],
            indices, weights,
            act2=clipped_swiglu,
            biases=(ex["gate_proj"]["bias"], ex["up_proj"]["bias"],
                    ex["down_proj"]["bias"]),
        )
        return out.reshape(B, S, D)

    def logits(self, params, hidden):
        if self.args.tie_word_embeddings:
            return embedding_as_linear(params["model"]["embed_tokens"], hidden)
        return linear(params["lm_head"], hidden)

    def embed(self, params, input_ids):
        return embedding(params["model"]["embed_tokens"], input_ids)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16, left_pad=None):
        return cache_lib.init_cache(
            self.args.num_hidden_layers, batch_size, self.n_kv_heads,
            self.head_dim, capacity, dtype, left_pad=left_pad,
        )
