"""Llama-style decoder (shared by llama / mistral / qwen2 text models).

Role parity: reference mlx_vlm/models/llama/language.py (and mlx-lm's llama).
Same scan-stacked, fixed-capacity-cache design as qwen2_vl/language.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import embedding, embedding_as_linear, linear, rms_norm, swiglu_mlp
from ...core.quant_scan import scan_layers
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, make_rope
from ...ops.attention import sdpa
from .config import TextConfig


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.head_dim or args.hidden_size // args.num_attention_heads
        self.scale = self.head_dim**-0.5
        # residual-branch multiplier (1.0 for llama; minicpm scales by
        # scale_depth / sqrt(num_layers))
        self.residual_scale = 1.0
        # block-norm hook: phimoe-style LayerNorm decoders override
        self._norm = rms_norm
        # per-layer rematerialization for training (trades FLOPs for HBM:
        # activations are recomputed in the backward scan step)
        self.remat = False
        # partial rotary (phi-4-mini style): rope built at the rotated
        # sub-dim; apply_rope passes the tail lanes through untouched
        rot = int(self.head_dim * getattr(args, "partial_rotary_factor",
                                          1.0))
        self.rope = make_rope(
            rot,
            args.rope_theta,
            args.rope_scaling,
            args.max_position_embeddings,
        )

    def __call__(self, params, inputs_embeds, cache, position_ids, causal=True):
        B, S, _ = inputs_embeds.shape
        cos, sin = self.rope.cos_sin(position_ids)
        h = inputs_embeds
        mp = params["model"]

        if cache is None:
            zero = jnp.zeros((), jnp.int32)
            if causal:
                mask = causal_cache_mask(zero, jnp.zeros((B,), jnp.int32), S, S)
            else:
                # bidirectional full-sequence attention (diffusion LMs)
                mask = jnp.ones((B, 1, S, S), bool)

            def layer_nc(h, lp):
                x = self._norm(lp["input_layernorm"], h, self.args.rms_norm_eps)
                h = h + self.residual_scale * self._attention_nc(lp["self_attn"], x, cos, sin, mask)
                x = self._norm(lp["post_attention_layernorm"], h, self.args.rms_norm_eps)
                h = h + self.residual_scale * self._mlp(lp["mlp"], x)
                return h, None

            h, _ = scan_layers(layer_nc, h, mp["layers"],
                               remat=self.remat)
            return self._norm(mp["norm"], h, self.args.rms_norm_eps), None

        mask = causal_cache_mask(cache.offset, cache.left_pad, S, cache.capacity)

        def layer(h, lp, cxs):
            x = self._norm(lp["input_layernorm"], h, self.args.rms_norm_eps)
            attn, cxs = self._attention(lp["self_attn"], x, cos, sin, mask, cache, cxs)
            h = h + self.residual_scale * attn
            x = self._norm(lp["post_attention_layernorm"], h, self.args.rms_norm_eps)
            h = h + self.residual_scale * self._mlp(lp["mlp"], x)
            return h, cxs

        h, cys = scan_layers(layer, h, mp["layers"], cache.scan_arrays())
        h = self._norm(mp["norm"], h, self.args.rms_norm_eps)
        return h, cache.with_arrays(cys, S)

    def forward_captured(self, params, inputs_embeds, cache, position_ids):
        """Cached forward that also returns every layer's output hidden
        states [L, B, S, D] — feeds EAGLE-3-style drafters (the reference
        captures 3 target layers, speculative/eagle3.py:334)."""
        B, S, _ = inputs_embeds.shape
        cos, sin = self.rope.cos_sin(position_ids)
        mask = causal_cache_mask(cache.offset, cache.left_pad, S, cache.capacity)
        h = inputs_embeds
        mp = params["model"]

        def layer(h, lp, cxs):
            x = self._norm(lp["input_layernorm"], h, self.args.rms_norm_eps)
            attn, cxs = self._attention(lp["self_attn"], x, cos, sin, mask, cache, cxs)
            h = h + self.residual_scale * attn
            x = self._norm(lp["post_attention_layernorm"], h, self.args.rms_norm_eps)
            h = h + self.residual_scale * self._mlp(lp["mlp"], x)
            return h, (cxs, h)

        h, (cys, hiddens) = scan_layers(
            layer, h, mp["layers"], cache.scan_arrays()
        )
        h = self._norm(mp["norm"], h, self.args.rms_norm_eps)
        return h, cache.with_arrays(cys, S), hiddens

    def forward_masked(self, params, inputs_embeds, cache, position_ids,
                       block_mask):
        """Read-only forward with a CUSTOM in-block attention mask.

        Tree-verified speculative decoding (speculative/ddtree.py): the S
        new tokens attend to the cache below the cursor plus the given
        [S, S] ancestor mask; their K/V are used in-flight and never
        written, so no rollback is needed.
        """
        B, S, _ = inputs_embeds.shape
        cos, sin = self.rope.cos_sin(position_ids)
        C = cache.capacity
        cache_part = (jnp.arange(C) < cache.offset)[None, None, None, :]
        mask = jnp.concatenate(
            [jnp.broadcast_to(cache_part, (B, 1, S, C)),
             jnp.broadcast_to(block_mask[None, None], (B, 1, S, S))],
            axis=-1)
        h = inputs_embeds
        mp = params["model"]

        def layer(h, lp, cxs):
            x = self._norm(lp["input_layernorm"], h, self.args.rms_norm_eps)
            q, k, v = self._qkv(lp["self_attn"], x)
            q, k = apply_rope(q, k, cos, sin)
            from ...ops.attention import sdpa

            keys = jnp.concatenate([cxs[0], k.astype(cxs[0].dtype)], axis=2)
            vals = jnp.concatenate([cxs[1], v.astype(cxs[1].dtype)], axis=2)
            o = sdpa(q, keys, vals, self.scale, mask)
            o = o.transpose(0, 2, 1, 3).reshape(B, S, -1)
            h = h + self.residual_scale * linear(lp["self_attn"]["o_proj"],
                                                o)
            x = self._norm(lp["post_attention_layernorm"], h,
                           self.args.rms_norm_eps)
            h = h + self.residual_scale * self._mlp(lp["mlp"], x)
            return h, None

        h, _ = scan_layers(layer, h, mp["layers"], cache.scan_arrays())
        return self._norm(mp["norm"], h, self.args.rms_norm_eps), None

    def _mlp(self, p, x):
        return swiglu_mlp(p, x)

    def _qkv(self, p, x):
        B, S, _ = x.shape
        q = linear(p["q_proj"], x).reshape(B, S, self.n_heads, self.head_dim)
        k = linear(p["k_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        v = linear(p["v_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        # qwen3-style per-head-dim q/k norms when the checkpoint carries them
        if "q_norm" in p:
            q = rms_norm(p["q_norm"], q, self.args.rms_norm_eps)
        if "k_norm" in p:
            k = rms_norm(p["k_norm"], k, self.args.rms_norm_eps)
        return q, k, v

    def _attention(self, p, x, cos, sin, mask, cache, cxs):
        B, S, _ = x.shape
        q, k, v = self._qkv(p, x)
        q, k = apply_rope(q, k, cos, sin)
        out, cxs = cache.attend(cxs, q, k, v, self.scale, mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, -1)
        return linear(p["o_proj"], out), cxs

    def _attention_nc(self, p, x, cos, sin, mask):
        B, S, _ = x.shape
        q, k, v = self._qkv(p, x)
        q, k = apply_rope(q, k, cos, sin)
        out = sdpa(q, k, v, self.scale, mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, -1)
        return linear(p["o_proj"], out)

    def logits(self, params, hidden):
        if self.args.tie_word_embeddings:
            return embedding_as_linear(params["model"]["embed_tokens"], hidden)
        return linear(params["lm_head"], hidden)

    def embed(self, params, input_ids):
        return embedding(params["model"]["embed_tokens"], input_ids)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16, left_pad=None):
        return cache_lib.init_cache(
            self.args.num_hidden_layers,
            batch_size,
            self.n_kv_heads,
            self.head_dim,
            capacity,
            dtype,
            left_pad,
        )
