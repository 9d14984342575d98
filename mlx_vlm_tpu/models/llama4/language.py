"""Llama-4 decoder: iRoPE (3 chunked-rope layers : 1 global NoPE layer),
sigmoid-routed MoE with shared expert, query temperature tuning.

Role parity: reference mlx_vlm/models/llama4/language.py — use_rope =
(i+1)%4 != 0 :26, weightless qk norm after rope:80-81, attn temperature
tuning on NoPE layers:83-98, chunked attention mask:205-230, MoE (sigmoid
scores scale the INPUT, top-k, + shared expert):131-152, per-layer MoE
interleave `i % step == step-1`:162-164.

TPU design: layers are grouped into period-4 SUPER-BLOCKS.  Each of the 4
positions in the period ("roles") has static flags (rope/chunked vs NoPE,
MoE vs dense), so sanitize splits the stack into 4 role arrays and the
super-block scan runs role bodies back to back — any (num_layers % 4 == 0,
step | 4) pattern compiles to 4 scan bodies regardless of depth.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import embedding, embedding_as_linear, linear, rms_norm, swiglu_mlp
from ...core.mask import causal_cache_mask
from ...core.moe import switch_glu
from ...core.rope import apply_rope_traditional, make_rope
from ...ops.attention import sdpa
from .config import ModelConfig, TextConfig

PERIOD = 4


def _weightless_rms(x, eps=1e-6):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class LanguageModel:
    def __init__(self, args: TextConfig, config: Optional[ModelConfig] = None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.head_dim
        self.scale = args.head_dim**-0.5
        self.rope = make_rope(
            args.head_dim, args.rope_theta, args.rope_scaling,
            args.max_position_embeddings,
        )
        step = args.interleave_moe_layer_step
        self.role_is_moe = [
            (r % step) == (step - 1) for r in range(PERIOD)
        ]
        self.role_use_rope = [(r + 1) % PERIOD != 0 for r in range(PERIOD)]
        self.blocks = args.num_hidden_layers // PERIOD

    def __call__(self, params, inputs_embeds, cache, position_ids):
        args = self.args
        B, S, _ = inputs_embeds.shape
        eps = args.rms_norm_eps
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        pos_row = jnp.broadcast_to(
            position_ids if position_ids.ndim == 2 else position_ids[None],
            (B, S),
        )
        cos, sin = self.rope.cos_sin(position_ids)
        # NoPE-layer query temperature (reference language.py:83-98)
        attn_scales = (
            jnp.log(
                jnp.floor((pos_row.astype(jnp.float32) + 1.0) / args.floor_scale)
                + 1.0
            ) * args.attn_scale + 1.0
        )[:, None, :, None]  # [B, 1, S, 1]

        h = inputs_embeds
        mp = params["model"]
        made_cache = cache is None
        if made_cache:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask_g = causal_cache_mask(cache.offset, cache.left_pad, S,
                                   cache.capacity)
        # chunked mask: causal AND same attention chunk
        C = args.attention_chunk_size
        j = jnp.arange(cache.capacity, dtype=jnp.int32)[None, None, None, :]
        qpos = pos_row[:, None, :, None]
        mask_c = mask_g & (qpos // C == j // C)

        G = self.blocks
        kv = cache.scan_arrays()  # (k, v) [L, ...]
        kv_roles = jax.tree.map(
            lambda a: a.reshape(G, PERIOD, *a.shape[1:]), kv
        )

        def role_body(r):
            use_rope = self.role_use_rope[r]
            is_moe = self.role_is_moe[r]

            def body(hc, xs):
                h, = hc
                lp, cxs = xs
                x = rms_norm(lp["input_layernorm"], h, eps)
                q, k, v = self._qkv(lp["self_attn"], x)
                if use_rope:
                    q, k = apply_rope_traditional(q, k, cos, sin)
                    if args.use_qk_norm:
                        q, k = _weightless_rms(q), _weightless_rms(k)
                    mask = mask_c
                else:
                    if args.attn_temperature_tuning:
                        q = (q * attn_scales).astype(q.dtype)
                    mask = mask_g
                k_buf, v_buf = cache_lib.update_layer_auto(
                    cxs[0], cxs[1], k, v, cache.offset
                )
                attn = sdpa(q, k_buf, v_buf, self.scale, mask)
                attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
                h = h + linear(lp["self_attn"]["o_proj"], attn)
                x = rms_norm(lp["post_attention_layernorm"], h, eps)
                if is_moe:
                    h = h + self._moe(lp["feed_forward"], x)
                else:
                    h = h + swiglu_mlp(lp["feed_forward"], x)
                return (h,), (k_buf, v_buf)

            return body

        def super_block(hc, xs):
            role_params, role_kv = xs  # leaves: params [PERIOD-split], kv [PERIOD, ...]
            kys = []
            for r in range(PERIOD):
                lp = role_params[r]
                cxs = jax.tree.map(lambda a, _r=r: a[_r], role_kv)
                hc, ky = role_body(r)(hc, (lp, (cxs[0], cxs[1])))
                kys.append(ky)
            k_new = jnp.stack([k for k, _ in kys], axis=0)  # [PERIOD, ...]
            v_new = jnp.stack([v for _, v in kys], axis=0)
            return hc, (k_new, v_new)

        role_params = [mp[f"role{r}_layers"] for r in range(PERIOD)]
        # scan over super-blocks: xs leaves are [G, ...]
        (h,), (k_y, v_y) = jax.lax.scan(
            super_block, (h,), (role_params, kv_roles)
        )
        h = rms_norm(mp["norm"], h, eps)
        k_y = k_y.reshape(kv[0].shape)
        v_y = v_y.reshape(kv[1].shape)
        new_cache = cache.with_arrays((k_y, v_y), S)
        return h, (None if made_cache else new_cache)

    def _qkv(self, p, x):
        B, S, _ = x.shape
        q = linear(p["q_proj"], x).reshape(B, S, self.n_heads, self.head_dim)
        k = linear(p["k_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        v = linear(p["v_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        return q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)

    def _moe(self, p, x):
        """Sigmoid-scored top-k routing; scores scale the expert INPUT
        (reference language.py:144-152)."""
        args = self.args
        B, S, D = x.shape
        flat = x.reshape(B * S, D)
        logits = linear(p["router"], flat).astype(jnp.float32)
        scores, indices = jax.lax.top_k(logits, args.num_experts_per_tok)
        scores = jax.nn.sigmoid(scores).astype(flat.dtype)
        # the reference scales the expert INPUT by the sigmoid score
        # (language.py:151, `self.experts(x * scores, ...)`); with the
        # standard k=1 routing that is one per-token input scale
        out = switch_glu(
            flat * scores[:, :1],
            p["experts"]["gate_proj"]["weight"],
            p["experts"]["up_proj"]["weight"],
            p["experts"]["down_proj"]["weight"],
            indices, jnp.ones_like(scores, dtype=jnp.float32),
        )
        out = out + swiglu_mlp(p["shared_expert"], flat)
        return out.reshape(B, S, D)

    def logits(self, params, hidden):
        if self.args.tie_word_embeddings or "lm_head" not in params:
            return embedding_as_linear(params["model"]["embed_tokens"], hidden)
        return linear(params["lm_head"], hidden)

    def embed(self, params, input_ids):
        return embedding(params["model"]["embed_tokens"], input_ids)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16, left_pad=None):
        return cache_lib.init_cache(
            self.args.num_hidden_layers, batch_size, self.n_kv_heads,
            self.head_dim, capacity, dtype, left_pad,
        )
