"""GLM text model (glm-edge class checkpoints).

Role parity: reference mlx_vlm/models/glm/language.py — llama-shaped
decoder with TRADITIONAL (interleaved-pair) RoPE over the full head dim
and a fused gate_up_proj MLP (split in half, swiglu).

TPU design: one scanned decoder over stacked layers; gate_up stays fused
(a single [2I, D] linear, split after the matmul — one big MXU op
instead of two).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import (embedding, embedding_as_linear, linear, rms_norm)
from ...core.mask import causal_cache_mask
from ...core.rope import Rope, apply_rope_traditional
from ..llama.config import TextConfig as _LlamaText
from ..llama.llama import text_position_ids


@dataclass
class TextConfig(_LlamaText):
    model_type: str = "glm"
    attention_bias: bool = False


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
        self.rope = Rope(self.head_dim, args.rope_theta)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        args = self.args
        B, S, _ = inputs_embeds.shape
        eps = args.rms_norm_eps
        cos, sin = self.rope.cos_sin(position_ids)
        h = inputs_embeds
        mp = params["model"]
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask = causal_cache_mask(cache.offset, cache.left_pad, S,
                                 cache.capacity)

        def layer(h, xs):
            lp, cxs = xs
            x = rms_norm(lp["input_layernorm"], h, eps)
            sa = lp["self_attn"]
            q = linear(sa["q_proj"], x).reshape(B, S, self.n_heads,
                                                self.head_dim)
            k = linear(sa["k_proj"], x).reshape(B, S, self.n_kv_heads,
                                                self.head_dim)
            v = linear(sa["v_proj"], x).reshape(B, S, self.n_kv_heads,
                                                self.head_dim)
            q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            q, k = apply_rope_traditional(q, k, cos, sin)
            attn, cxs = cache.attend(cxs, q, k, v, self.scale, mask)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
            h = h + linear(sa["o_proj"], attn)
            x = rms_norm(lp["post_attention_layernorm"], h, eps)
            gu = linear(lp["mlp"]["gate_up_proj"], x)
            gate, up = jnp.split(gu, 2, axis=-1)
            h = h + linear(lp["mlp"]["down_proj"],
                           jax.nn.silu(gate) * up)
            return h, cxs

        h, cys = jax.lax.scan(layer, h, (mp["layers"], cache.scan_arrays()))
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
