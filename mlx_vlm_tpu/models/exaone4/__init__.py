"""EXAONE-4 — post-norm decoder with rope-less global layers.

Role parity: reference mlx_vlm/models/exaone4/language.py — per-head q/k
RMSNorm; residuals add the NORMED branch outputs (post-norm,
TransformerBlock:80: h = x + post_attention_layernorm(attn(x)));
sliding_window_pattern like "LLLG": 'L' layers use rope + sliding
window, 'G' layers use NO rope and global attention (:36-37).

TPU design: one scan with per-layer flags; the no-rope case rides the
same rotation with cos=1/sin=0 selected per layer.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import (embedding, embedding_as_linear, linear,
                            rms_norm, swiglu_mlp)
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, make_rope
from ..llama.config import TextConfig as _LlamaText
from ..llama.llama import text_position_ids


@dataclass
class ModelConfig(_LlamaText):
    model_type: str = "exaone4"
    sliding_window: Optional[int] = None
    sliding_window_pattern: Optional[str] = None


TextConfig = ModelConfig


class LanguageModel:
    def __init__(self, args: ModelConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = (args.head_dim
                         or args.hidden_size // args.num_attention_heads)
        self.scale = self.head_dim**-0.5
        self.rope = make_rope(
            self.head_dim, args.rope_theta, args.rope_scaling,
            args.max_position_embeddings or 131072)
        pat = args.sliding_window_pattern
        if pat:
            self.is_local = np.asarray(
                [pat[i % len(pat)] == "L"
                 for i in range(args.num_hidden_layers)])
        else:
            self.is_local = np.ones(args.num_hidden_layers, bool)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        args = self.args
        B, S, _ = inputs_embeds.shape
        eps = args.rms_norm_eps
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos, sin = self.rope.cos_sin(position_ids)
        ones, zeros = jnp.ones_like(cos), jnp.zeros_like(sin)
        h = inputs_embeds
        mp = params["model"]
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask_g = causal_cache_mask(cache.offset, cache.left_pad, S,
                                   cache.capacity)
        if args.sliding_window:
            mask_l = causal_cache_mask(cache.offset, cache.left_pad, S,
                                       cache.capacity,
                                       window=args.sliding_window)
        else:
            mask_l = mask_g
        flags = jnp.asarray(self.is_local)

        def layer(h, xs):
            lp, cxs, local = xs
            mask = jnp.where(local, mask_l, mask_g)
            # global layers are NoPE: identity rotation
            c = jnp.where(local, cos, ones)
            s = jnp.where(local, sin, zeros)
            sa = lp["self_attn"]
            # attention on the RAW stream (post-norm residual)
            q = linear(sa["q_proj"], h).reshape(B, S, self.n_heads,
                                                self.head_dim)
            k = linear(sa["k_proj"], h).reshape(B, S, self.n_kv_heads,
                                                self.head_dim)
            v = linear(sa["v_proj"], h).reshape(B, S, self.n_kv_heads,
                                                self.head_dim)
            q = rms_norm(sa["q_norm"], q, eps).transpose(0, 2, 1, 3)
            k = rms_norm(sa["k_norm"], k, eps).transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
            q, k = apply_rope(q, k, c, s)
            attn, cxs = cache.attend(cxs, q, k, v, self.scale, mask,
                                     flash_ok=False)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
            attn = linear(sa["o_proj"], attn)
            h = h + rms_norm(lp["post_attention_layernorm"], attn, eps)
            r = swiglu_mlp(lp["mlp"], h)
            h = h + rms_norm(lp["post_feedforward_layernorm"], r, eps)
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
            self.head_dim, capacity, dtype, left_pad)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config)

    def get_input_embeddings(self, params, input_ids, pixel_values=None,
                             **aux):
        return self.language_model.embed(params["language_model"],
                                         input_ids)

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
