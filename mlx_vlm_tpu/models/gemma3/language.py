"""Gemma 3 decoder.

Role parity: reference mlx_vlm/models/gemma3/language.py — RMSNorm(1+w):17,
q/k norms:44-45, local/global rope bases:49, sandwich norms:128-140,
embed scaling sqrt(D):191, sliding-window pattern (every Nth layer is
global):214-228, make_cache with RotatingKVCache for local layers:272.

TPU design: one scan over stacked layers; the per-layer local/global choice
is a scanned boolean selecting between two precomputed (cos,sin) pairs and
two masks.  For long contexts the cache is a MixedWindowCache: local
layers get an O(window) ring buffer (reference RotatingKVCache parity,
cache.py:373) carried through the scan and updated via lax.cond at traced
slot ids; short contexts and kv-quant runs keep the full-capacity cache
with window masks.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import embedding, embedding_as_linear, linear, rms_norm
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, default_inv_freq, rope_cos_sin
from ...ops.attention import sdpa
from .config import TextConfig


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.head_dim
        self.scale = args.query_pre_attn_scalar**-0.5
        self.inv_freq_local = jnp.asarray(
            default_inv_freq(args.head_dim, args.rope_local_base_freq), jnp.float32
        )
        self.inv_freq_global = jnp.asarray(
            default_inv_freq(args.head_dim, args.rope_global_base_freq), jnp.float32
        )
        # rope_scaling {"factor": 8.0} linear-scales the *global* rope
        if args.rope_scaling:
            factor = args.rope_scaling.get("factor", 1.0)
            self.inv_freq_global = self.inv_freq_global / factor
        pattern = args.sliding_window_pattern
        self.is_global = np.asarray(
            [(i + 1) % pattern == 0 for i in range(args.num_hidden_layers)]
        )

    def __call__(self, params, inputs_embeds, cache, position_ids):
        args = self.args
        B, S, _ = inputs_embeds.shape
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos_l, sin_l = rope_cos_sin(position_ids, self.inv_freq_local)
        cos_g, sin_g = rope_cos_sin(position_ids, self.inv_freq_global)

        h = inputs_embeds * jnp.asarray(
            args.hidden_size**0.5, jnp.bfloat16
        ).astype(inputs_embeds.dtype)
        mp = params["model"]
        eps = args.rms_norm_eps

        if isinstance(cache, cache_lib.MixedWindowCache):
            return self._call_mixed(mp, h, cache, cos_l, sin_l, cos_g, sin_g)
        if cache is None:
            zero = jnp.zeros((), jnp.int32)
            lp0 = jnp.zeros((B,), jnp.int32)
            mask_g = causal_cache_mask(zero, lp0, S, S)
            mask_l = causal_cache_mask(zero, lp0, S, S, window=args.sliding_window)
            offset = None
        else:
            mask_g = causal_cache_mask(cache.offset, cache.left_pad, S, cache.capacity)
            mask_l = causal_cache_mask(
                cache.offset, cache.left_pad, S, cache.capacity,
                window=args.sliding_window,
            )
            offset = cache.offset

        flags = jnp.asarray(self.is_global)

        def layer(h, xs):
            if cache is None:
                lp, is_g = xs
            else:
                lp, cxs, is_g = xs
            cos = jnp.where(is_g, cos_g, cos_l)
            sin = jnp.where(is_g, sin_g, sin_l)
            mask = jnp.where(is_g, mask_g, mask_l)

            x = rms_norm(lp["input_layernorm"], h, eps, offset=1.0)
            q, k, v = self._qkv(lp["self_attn"], x)
            q = rms_norm(lp["self_attn"]["q_norm"], q, eps, offset=1.0)
            k = rms_norm(lp["self_attn"]["k_norm"], k, eps, offset=1.0)
            q, k = apply_rope(q, k, cos, sin)
            if cache is None:
                attn = sdpa(q, k, v, self.scale, mask)
            else:
                # flash path disabled: the local/global mask is selected per
                # layer by a traced flag, which the kernel can't see
                attn, cxs = cache.attend(
                    cxs, q, k, v, self.scale, mask, flash_ok=False
                )
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
            attn = linear(lp["self_attn"]["o_proj"], attn)
            # sandwich norms (reference language.py:128-140)
            h = h + rms_norm(lp["post_attention_layernorm"], attn, eps, offset=1.0)
            x = rms_norm(lp["pre_feedforward_layernorm"], h, eps, offset=1.0)
            g = linear(lp["mlp"]["gate_proj"], x)
            u = linear(lp["mlp"]["up_proj"], x)
            r = linear(lp["mlp"]["down_proj"], jax.nn.gelu(g, approximate=True) * u)
            h = h + rms_norm(lp["post_feedforward_layernorm"], r, eps, offset=1.0)
            if cache is None:
                return h, None
            return h, cxs

        if cache is None:
            h, _ = jax.lax.scan(layer, h, (mp["layers"], flags))
            return rms_norm(mp["norm"], h, eps, offset=1.0), None

        h, cys = jax.lax.scan(
            layer, h, (mp["layers"], cache.scan_arrays(), flags)
        )
        h = rms_norm(mp["norm"], h, eps, offset=1.0)
        return h, cache.with_arrays(cys, S)

    # ------------------------------------------------------- ring-cache path
    def _call_mixed(self, mp, h, cache, cos_l, sin_l, cos_g, sin_g):
        """Scan with the heterogeneous cache as carry: global layers write
        full [C] buffers, local layers an O(window) ring."""
        args = self.args
        B, S, _ = h.shape
        eps = args.rms_norm_eps
        cw = cache.ring_capacity
        if S > cw - args.sliding_window:
            raise ValueError(
                f"prefill chunk {S} exceeds the ring margin "
                f"{cw - args.sliding_window}; lower prefill_step_size"
            )
        mask_g = causal_cache_mask(
            cache.offset, cache.left_pad, S, cache.capacity
        )
        mask_l = cache_lib.ring_slot_mask(
            cache.offset, cache.left_pad, S, cw, args.sliding_window
        )
        offset = cache.offset
        ring_idx = (offset + jnp.arange(S, dtype=jnp.int32)) % cw
        gidx = np.cumsum(self.is_global) - 1
        lidx = np.cumsum(~self.is_global) - 1

        def layer(carry, xs):
            h, kg, vg, kl, vl = carry
            lp, is_g, gi, li = xs
            cos = jnp.where(is_g, cos_g, cos_l)
            sin = jnp.where(is_g, sin_g, sin_l)
            x = rms_norm(lp["input_layernorm"], h, eps, offset=1.0)
            q, k, v = self._qkv(lp["self_attn"], x)
            q = rms_norm(lp["self_attn"]["q_norm"], q, eps, offset=1.0)
            k = rms_norm(lp["self_attn"]["k_norm"], k, eps, offset=1.0)
            q, k = apply_rope(q, k, cos, sin)

            def g_branch(kg, vg, kl, vl):
                kb = jax.lax.dynamic_index_in_dim(kg, gi, 0, keepdims=False)
                vb = jax.lax.dynamic_index_in_dim(vg, gi, 0, keepdims=False)
                kb, vb = cache_lib.update_layer(kb, vb, k, v, offset)
                attn = sdpa(q, kb, vb, self.scale, mask_g)
                kg = jax.lax.dynamic_update_index_in_dim(kg, kb, gi, 0)
                vg = jax.lax.dynamic_update_index_in_dim(vg, vb, gi, 0)
                return attn, kg, vg, kl, vl

            def l_branch(kg, vg, kl, vl):
                kb = jax.lax.dynamic_index_in_dim(kl, li, 0, keepdims=False)
                vb = jax.lax.dynamic_index_in_dim(vl, li, 0, keepdims=False)
                kb = kb.at[:, :, ring_idx].set(k.astype(kb.dtype))
                vb = vb.at[:, :, ring_idx].set(v.astype(vb.dtype))
                attn = sdpa(q, kb, vb, self.scale, mask_l)
                kl = jax.lax.dynamic_update_index_in_dim(kl, kb, li, 0)
                vl = jax.lax.dynamic_update_index_in_dim(vl, vb, li, 0)
                return attn, kg, vg, kl, vl

            attn, kg, vg, kl, vl = jax.lax.cond(
                is_g, g_branch, l_branch, kg, vg, kl, vl
            )
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
            attn = linear(lp["self_attn"]["o_proj"], attn)
            h = h + rms_norm(lp["post_attention_layernorm"], attn, eps, offset=1.0)
            x = rms_norm(lp["pre_feedforward_layernorm"], h, eps, offset=1.0)
            g = linear(lp["mlp"]["gate_proj"], x)
            u = linear(lp["mlp"]["up_proj"], x)
            r = linear(lp["mlp"]["down_proj"], jax.nn.gelu(g, approximate=True) * u)
            h = h + rms_norm(lp["post_feedforward_layernorm"], r, eps, offset=1.0)
            return (h, kg, vg, kl, vl), None

        (h, kg, vg, kl, vl), _ = jax.lax.scan(
            layer,
            (h, cache.k_g, cache.v_g, cache.k_l, cache.v_l),
            (
                mp["layers"],
                jnp.asarray(self.is_global),
                jnp.asarray(gidx, jnp.int32),
                jnp.asarray(lidx, jnp.int32),
            ),
        )
        h = rms_norm(mp["norm"], h, eps, offset=1.0)
        import dataclasses as _dc

        new_cache = _dc.replace(
            cache, k_g=kg, v_g=vg, k_l=kl, v_l=vl, offset=cache.offset + S
        )
        return h, new_cache

    def _qkv(self, p, x):
        B, S, _ = x.shape
        q = linear(p["q_proj"], x).reshape(B, S, self.n_heads, self.head_dim)
        k = linear(p["k_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        v = linear(p["v_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        return (
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
        )

    def logits(self, params, hidden):
        if "lm_head" in params:
            return linear(params["lm_head"], hidden)
        return embedding_as_linear(params["model"]["embed_tokens"], hidden)

    def embed(self, params, input_ids):
        return embedding(params["model"]["embed_tokens"], input_ids)

    # the engine defers cache construction (O(window) ring for local layers
    # at long context)
    owns_cache_factory = True

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None, kv_bits=None, kv_group_size=64,
                   ring_margin=None):
        args = self.args
        if kv_bits:
            # quantized KV keeps the full-capacity cache + window masks
            return cache_lib.init_quantized_cache(
                args.num_hidden_layers, batch_size, self.n_kv_heads,
                self.head_dim, capacity, dtype, bits=kv_bits,
                group_size=kv_group_size, left_pad=left_pad,
            )
        w = args.sliding_window
        margin = ring_margin or min(2048, max(256, w))
        if capacity > w + margin:
            return cache_lib.init_mixed_window_cache(
                self.is_global, batch_size, self.n_kv_heads, self.head_dim,
                capacity, w, dtype, chunk_margin=margin, left_pad=left_pad,
            )
        return cache_lib.init_cache(
            args.num_hidden_layers,
            batch_size,
            self.n_kv_heads,
            self.head_dim,
            capacity,
            dtype,
            left_pad,
        )
