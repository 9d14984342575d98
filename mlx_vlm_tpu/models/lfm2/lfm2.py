"""LFM2 (Liquid) hybrid text model: gated short-conv layers + periodic
attention.

Role parity: reference mlx_vlm/models/lfm2/language.py — ShortConv
(in_proj -> B*x gate -> depthwise causal conv(L_cache) -> C gate ->
out_proj):77-132, attention with per-head q/k norms:18-76, w1/w3/w2 MLP,
full_attn_idxs layer pattern, embedding-tied head with embedding_norm.

TPU design: the irregular conv/attention pattern runs as RUN-LENGTH grouped
lax.scans (nemotron_h pattern); conv windows carry in a [L_conv, B, K-1, D]
ring like the mamba/gated-delta caches, with the same pos==0 right-pad
sentinel.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core.cache import update_layer_auto
from ...core.config import BaseModelConfig
from ...core.layers import embedding, embedding_as_linear, linear, rms_norm
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, default_inv_freq, rope_cos_sin
from ...ops.attention import sdpa
from ..llama.llama import text_position_ids
from ..nemotron_h.language import runs


@dataclasses.dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "lfm2"
    vocab_size: int = 65536
    hidden_size: int = 1024
    num_hidden_layers: int = 16
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    max_position_embeddings: int = 128000
    norm_eps: float = 1e-5
    conv_bias: bool = False
    conv_L_cache: int = 3
    block_dim: int = 1024
    block_ff_dim: int = 6656
    block_multiple_of: int = 256
    block_ffn_dim_multiplier: float = 1.0
    block_auto_adjust_ff_dim: bool = True
    rope_theta: float = 1000000.0
    full_attn_idxs: Optional[List[int]] = None
    layer_types: Optional[List[str]] = None
    tie_word_embeddings: bool = True

    def __post_init__(self):
        if self.full_attn_idxs is None and self.layer_types is not None:
            self.full_attn_idxs = [
                i for i, t in enumerate(self.layer_types)
                if t == "full_attention"
            ]
        if self.full_attn_idxs is None:
            self.full_attn_idxs = []
        # reference MLP auto-adjusts the ff dim (llama-style 2/3 rule)
        if self.block_auto_adjust_ff_dim:
            d = int(2 * self.block_ff_dim / 3)
            d = int(self.block_ffn_dim_multiplier * d)
            self.block_ff_dim = self.block_multiple_of * (
                (d + self.block_multiple_of - 1) // self.block_multiple_of
            )


ModelConfig = TextConfig


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["conv", "k", "v", "offset", "left_pad"],
    meta_fields=[],
)
@dataclasses.dataclass
class Lfm2Cache:
    conv: jax.Array  # [L_conv, B, K-1, D]
    k: jax.Array  # [L_attn, B, Hkv, C, hd]
    v: jax.Array
    offset: jax.Array
    left_pad: jax.Array

    @property
    def capacity(self) -> int:
        return self.k.shape[3]


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        a = args
        pattern = [
            "*" if i in a.full_attn_idxs else "M"
            for i in range(a.num_hidden_layers)
        ]
        self.pattern = pattern
        self.runs = runs(pattern)
        self.n_conv = pattern.count("M")
        self.n_attn = pattern.count("*")
        self.n_heads = a.num_attention_heads
        self.n_kv_heads = a.num_key_value_heads
        self.head_dim = a.hidden_size // a.num_attention_heads
        self.scale = self.head_dim**-0.5
        self.inv_freq = jnp.asarray(
            default_inv_freq(self.head_dim, a.rope_theta), jnp.float32
        )

    def __call__(self, params, inputs_embeds, cache, position_ids):
        a = self.args
        B, S, D = inputs_embeds.shape
        eps = a.norm_eps
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        pos_row = jnp.broadcast_to(
            position_ids if position_ids.ndim == 2 else position_ids[None],
            (B, S),
        )
        cos, sin = rope_cos_sin(position_ids, self.inv_freq)
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask = causal_cache_mask(cache.offset, cache.left_pad, S,
                                 cache.capacity)
        slots = cache.offset + jnp.arange(S, dtype=jnp.int32)
        valid = (slots[None, :] >= cache.left_pad[:, None]) & (
            (pos_row > 0) | (slots[None, :] == 0)
        )

        h = inputs_embeds
        mp = params["model"]
        conv_new = cache.conv
        k_new, v_new = cache.k, cache.v

        def conv_body(h, xs):
            lp, cv = xs
            x = rms_norm(lp["operator_norm"], h, eps)
            r, cv = self._short_conv(lp["conv"], x, cv, valid)
            h = h + r
            x = rms_norm(lp["ffn_norm"], h, eps)
            h = h + self._ffn(lp["feed_forward"], x)
            return h, cv

        def attn_body(h, xs):
            lp, kb, vb = xs
            x = rms_norm(lp["operator_norm"], h, eps)
            r, kb, vb = self._attention(lp["self_attn"], x, cos, sin, mask,
                                        cache.offset, kb, vb)
            h = h + r
            x = rms_norm(lp["ffn_norm"], h, eps)
            h = h + self._ffn(lp["feed_forward"], x)
            return h, (kb, vb)

        for t, start, n in self.runs:
            if t == "M":
                lp = jax.tree.map(
                    lambda x: x[start:start + n], mp["conv_layers"]
                )
                cv = cache.conv[start:start + n]
                h, cv_y = jax.lax.scan(conv_body, h, (lp, cv))
                conv_new = jax.lax.dynamic_update_slice_in_dim(
                    conv_new, cv_y, start, 0
                )
            else:
                lp = jax.tree.map(
                    lambda x: x[start:start + n], mp["attn_layers"]
                )
                kb = cache.k[start:start + n]
                vb = cache.v[start:start + n]
                h, (k_y, v_y) = jax.lax.scan(attn_body, h, (lp, kb, vb))
                k_new = jax.lax.dynamic_update_slice_in_dim(k_new, k_y,
                                                            start, 0)
                v_new = jax.lax.dynamic_update_slice_in_dim(v_new, v_y,
                                                            start, 0)

        h = rms_norm(mp["embedding_norm"], h, eps)
        if made:
            return h, None
        return h, Lfm2Cache(
            conv=conv_new, k=k_new, v=v_new,
            offset=cache.offset + S, left_pad=cache.left_pad,
        )

    def _ffn(self, p, x):
        g = linear(p["w1"], x)
        u = linear(p["w3"], x)
        return linear(p["w2"], jax.nn.silu(g) * u)

    def _short_conv(self, p, x, conv_state, valid):
        """Reference ShortConv:95-132 — gated depthwise causal conv."""
        a = self.args
        B, S, D = x.shape
        K = a.conv_L_cache
        bcx = linear(p["in_proj"], x)
        bg, cg, xs = jnp.split(bcx, 3, axis=-1)
        bx = bg * xs
        bx = jnp.where(valid[..., None], bx, 0)
        padded = jnp.concatenate([conv_state.astype(bx.dtype), bx], axis=1)
        lv = jnp.max(
            jnp.where(valid, jnp.arange(S, dtype=jnp.int32)[None], -1), axis=1
        )
        gather = lv[:, None] + 1 + jnp.arange(K - 1)[None]
        new_state = jnp.take_along_axis(padded, gather[..., None], axis=1)
        w = p["conv"]["weight"]  # [D, K]
        windows = jnp.stack([padded[:, i:i + S] for i in range(K)], axis=0)
        out = jnp.einsum("kbsd,dk->bsd", windows, w)
        if "bias" in p["conv"]:
            out = out + p["conv"]["bias"]
        return linear(p["out_proj"], cg * out), new_state

    def _attention(self, p, x, cos, sin, mask, offset, k_buf, v_buf):
        a = self.args
        B, S, _ = x.shape
        hd = self.head_dim
        q = linear(p["q_proj"], x).reshape(B, S, self.n_heads, hd)
        k = linear(p["k_proj"], x).reshape(B, S, self.n_kv_heads, hd)
        v = linear(p["v_proj"], x).reshape(B, S, self.n_kv_heads, hd)
        q = rms_norm(p["q_layernorm"], q, a.norm_eps).transpose(0, 2, 1, 3)
        k = rms_norm(p["k_layernorm"], k, a.norm_eps).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        q, k = apply_rope(q, k, cos, sin)
        k_buf, v_buf = update_layer_auto(k_buf, v_buf, k, v, offset)
        attn = sdpa(q, k_buf, v_buf, self.scale, mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
        return linear(p["out_proj"], attn), k_buf, v_buf

    def logits(self, params, hidden):
        if self.args.tie_word_embeddings or "lm_head" not in params:
            return embedding_as_linear(params["model"]["embed_tokens"], hidden)
        return linear(params["lm_head"], hidden)

    def embed(self, params, input_ids):
        return embedding(params["model"]["embed_tokens"], input_ids)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16, left_pad=None):
        a = self.args
        if left_pad is None:
            left_pad = jnp.zeros((batch_size,), jnp.int32)
        return Lfm2Cache(
            conv=jnp.zeros(
                (max(self.n_conv, 1), batch_size, a.conv_L_cache - 1,
                 a.hidden_size), dtype,
            ),
            k=jnp.zeros(
                (max(self.n_attn, 1), batch_size, self.n_kv_heads, capacity,
                 self.head_dim), dtype,
            ),
            v=jnp.zeros(
                (max(self.n_attn, 1), batch_size, self.n_kv_heads, capacity,
                 self.head_dim), dtype,
            ),
            offset=jnp.zeros((), jnp.int32),
            left_pad=left_pad,
        )


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config)

    def get_input_embeddings(self, params, input_ids, pixel_values=None, **aux):
        return self.language_model.embed(params["language_model"], input_ids)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache, position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return text_position_ids(input_ids, attention_mask)

    def vision_aux_inputs(self, grid_thw):
        return {}

    def sanitize(self, weights: dict) -> dict:
        """Split layers into conv/attn role arrays; canonicalize conv
        weights [D,1,K]/[D,K,1] -> [D,K]."""
        import re

        pattern = self.language_model.pattern
        ordinal, counts = [], {"M": 0, "*": 0}
        for c in pattern:
            ordinal.append(counts[c])
            counts[c] += 1
        layer_re = re.compile(r"^(?:language_model\.)?model\.layers\.(\d+)\.(.+)$")
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            if "conv.weight" in k and getattr(v, "ndim", 0) == 3:
                v = v.reshape(v.shape[0], -1) if v.shape[1] == 1 else v[..., 0]
            m = layer_re.match(k)
            if m:
                i, rest = int(m.group(1)), m.group(2)
                key = "attn_layers" if pattern[i] == "*" else "conv_layers"
                k = f"model.{key}.{ordinal[i]}.{rest}"
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return (
            "language_model.model.conv_layers",
            "language_model.model.attn_layers",
        )
