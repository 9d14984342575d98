"""Ministral 3 text model.

Role parity: reference mlx_vlm/models/ministral3/language.py — mistral
decoder with mixed sliding/full attention layers (config.layer_types)
and a llama-4-style position-dependent query temperature:

    q *= 1 + beta * log(1 + floor(pos / original_max_position_embeddings))

(:19 _get_llama_4_attn_scale), rope parameters nested under
config.rope_parameters.

TPU design: one scanned decoder; per-layer sliding flag selects between
two precomputed masks (olmo3/gpt_oss pattern); the attn scale is a
[B, S] plane computed once per step and applied to q before attention.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import (embedding, embedding_as_linear, linear, rms_norm,
                            swiglu_mlp)
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, make_rope
from ...core.config import BaseModelConfig
from ..llama.llama import text_position_ids


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "ministral3"
    hidden_size: int = 4096
    num_hidden_layers: int = 32
    intermediate_size: int = 14336
    num_attention_heads: int = 32
    rms_norm_eps: float = 1e-5
    vocab_size: int = 32768
    head_dim: Optional[int] = None
    max_position_embeddings: Optional[int] = None
    num_key_value_heads: Optional[int] = None
    rope_parameters: Optional[Dict] = None
    tie_word_embeddings: bool = True
    layer_types: Optional[List[str]] = None
    sliding_window: Optional[int] = None

    def __post_init__(self):
        if self.num_key_value_heads is None:
            self.num_key_value_heads = self.num_attention_heads
        if self.layer_types is None:
            self.layer_types = ["full_attention"] * self.num_hidden_layers
        if self.rope_parameters is None:
            self.rope_parameters = {"rope_theta": 1e6}

    @classmethod
    def from_dict(cls, params: dict):
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


ModelConfig = TextConfig


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = (args.head_dim
                         or args.hidden_size // args.num_attention_heads)
        self.scale = self.head_dim**-0.5
        rp = args.rope_parameters or {}
        self.rope = make_rope(
            self.head_dim, rp.get("rope_theta", 1e6),
            rp if rp.get("rope_type") not in (None, "default") else None,
            args.max_position_embeddings or 131072,
        )
        self.beta = rp.get("llama_4_scaling_beta")
        self.orig_max = rp.get("original_max_position_embeddings", 16384)
        self.is_sliding = np.asarray(
            [t == "sliding_attention" for t in args.layer_types])

    def __call__(self, params, inputs_embeds, cache, position_ids):
        args = self.args
        B, S, _ = inputs_embeds.shape
        eps = args.rms_norm_eps
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos, sin = self.rope.cos_sin(position_ids)
        h = inputs_embeds
        mp = params["model"]
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask_f = causal_cache_mask(cache.offset, cache.left_pad, S,
                                   cache.capacity)
        mask_s = (causal_cache_mask(cache.offset, cache.left_pad, S,
                                    cache.capacity,
                                    window=args.sliding_window)
                  if args.sliding_window else mask_f)
        if getattr(self, "canvas_bidirectional", False) and made:
            # diffusion canvas decode (nemotron_labs_diffusion): full
            # layers see the whole canvas, sliding layers a symmetric
            # local window
            j = jnp.arange(cache.capacity)[None, None, None, :]
            qpos = jnp.arange(S)[None, None, :, None]
            mask_f = jnp.broadcast_to(j < S, mask_f.shape)
            mask_s = (mask_f & (jnp.abs(j - qpos) < args.sliding_window)
                      if args.sliding_window else mask_f)
        if self.beta:
            # llama-4 attn temperature (reference :19): per query position
            attn_scale = (1.0 + self.beta * jnp.log1p(jnp.floor(
                position_ids.astype(jnp.float32) / self.orig_max)))
            attn_scale = attn_scale[:, None, :, None].astype(h.dtype)
        else:
            attn_scale = None
        flags = jnp.asarray(self.is_sliding)

        def layer(h, xs):
            lp, cxs, sliding = xs
            mask = jnp.where(sliding, mask_s, mask_f)
            x = rms_norm(lp["input_layernorm"], h, eps)
            sa = lp["self_attn"]
            q = linear(sa["q_proj"], x).reshape(B, S, self.n_heads,
                                                self.head_dim)
            k = linear(sa["k_proj"], x).reshape(B, S, self.n_kv_heads,
                                                self.head_dim)
            v = linear(sa["v_proj"], x).reshape(B, S, self.n_kv_heads,
                                                self.head_dim)
            q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            q, k = apply_rope(q, k, cos, sin)
            if attn_scale is not None:
                q = (q * attn_scale).astype(q.dtype)
            attn, cxs = cache.attend(cxs, q, k, v, self.scale, mask,
                                     flash_ok=False)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
            h = h + linear(sa["o_proj"], attn)
            x = rms_norm(lp["post_attention_layernorm"], h, eps)
            h = h + swiglu_mlp(lp["mlp"], x)
            return h, cxs

        h, cys = jax.lax.scan(layer, h,
                              (mp["layers"], cache.scan_arrays(), flags))
        h = rms_norm(mp["norm"], h, eps)
        return h, (None if made else cache.with_arrays(cys, S))

    def logits(self, params, hidden):
        if self.args.tie_word_embeddings or "lm_head" not in params:
            return embedding_as_linear(params["model"]["embed_tokens"],
                                       hidden)
        return linear(params["lm_head"], hidden)

    def embed(self, params, input_ids):
        return embedding(params["model"]["embed_tokens"], input_ids)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None):
        return cache_lib.init_cache(
            self.args.num_hidden_layers, batch_size, self.n_kv_heads,
            self.head_dim, capacity, dtype, left_pad,
        )


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config)

    def get_input_embeddings(self, params, input_ids, pixel_values=None,
                             **aux):
        return self.language_model.embed(params["language_model"], input_ids)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache,
                                            position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return text_position_ids(input_ids, attention_mask)

    def vision_aux_inputs(self, grid_thw):
        return {}

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return ("language_model.model.layers",)
