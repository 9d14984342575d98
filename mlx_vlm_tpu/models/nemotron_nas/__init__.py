"""Nemotron-NAS (DeciLM / Llama-3.1-Nemotron-51B class) text model.

Role parity: reference mlx_vlm/models/nemotron_nas/language.py — a
NAS-searched llama where every layer carries its own BlockConfig:
attention may be a real GQA block (kv heads = n_heads /
n_heads_in_group), a plain linear replacement, or a no-op (skipped,
including its norm, TransformerBlock:128-170); the FFN likewise
(ffn_mult -> intermediate = find_multiple(2*mult*D/3, 256), :22).
Attention layers share llama3-scaled rope.

TPU design: trace-time Python loop over dict-indexed layers; the KV
cache is allocated at the max kv head count with real-attention layers
slicing their head extent (cache rows of no-op/linear layers are dead
but keep the buffer uniform and the step jittable).
"""

from __future__ import annotations

import dataclasses
import inspect
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import (embedding, embedding_as_linear, linear, rms_norm,
                            swiglu_mlp)
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, make_rope
from ...core.config import BaseModelConfig
from ..llama.llama import text_position_ids


def _find_multiple(n: int, k: int) -> int:
    return n if n % k == 0 else n + k - (n % k)


def ffn_mult_to_intermediate_size(ffn_mult: float, n_embd: int) -> int:
    """reference language.py:22."""
    return _find_multiple(int(2 * ffn_mult * n_embd / 3), 256)


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "nemotron-nas"
    hidden_size: int = 8192
    num_hidden_layers: int = 80
    num_attention_heads: int = 64
    rms_norm_eps: float = 1e-5
    vocab_size: int = 128256
    block_configs: list = field(default_factory=list)
    hidden_act: str = "silu"
    attention_bias: bool = False
    mlp_bias: bool = False
    rope_theta: float = 500000.0
    rope_scaling: Optional[dict] = None
    max_position_embeddings: int = 131072
    tie_word_embeddings: bool = False

    @classmethod
    def from_dict(cls, params: dict):
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})

    def attn_cfg(self, i: int) -> dict:
        return self.block_configs[i].get("attention", {})

    def ffn_cfg(self, i: int) -> dict:
        return self.block_configs[i].get("ffn", {})


ModelConfig = TextConfig


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.head_dim = args.hidden_size // args.num_attention_heads
        self.scale = self.head_dim**-0.5
        self.rope = make_rope(self.head_dim, args.rope_theta,
                              args.rope_scaling,
                              args.max_position_embeddings)
        kvs = [self.n_heads // a["n_heads_in_group"]
               for a in (args.attn_cfg(i)
                         for i in range(args.num_hidden_layers))
               if a.get("n_heads_in_group")]
        self.max_kv = max(kvs) if kvs else 1

    def __call__(self, params, inputs_embeds, cache, position_ids):
        a = self.args
        B, S, _ = inputs_embeds.shape
        eps = a.rms_norm_eps
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos, sin = self.rope.cos_sin(position_ids)
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask = causal_cache_mask(cache.offset, cache.left_pad, S,
                                 cache.capacity)
        h = inputs_embeds
        mp = params["model"]
        ks, vs = cache.k, cache.v
        for i in range(a.num_hidden_layers):
            lp = mp["layers"][str(i)]
            ac, fc = a.attn_cfg(i), a.ffn_cfg(i)
            if not ac.get("no_op"):
                x = rms_norm(lp["input_layernorm"], h, eps)
                if ac.get("replace_with_linear"):
                    h = h + linear(lp["self_attn"]["linear_attn"], x)
                else:
                    sa = lp["self_attn"]
                    nkv = self.n_heads // ac["n_heads_in_group"]
                    q = linear(sa["q_proj"], x).reshape(
                        B, S, self.n_heads, self.head_dim)
                    k = linear(sa["k_proj"], x).reshape(
                        B, S, nkv, self.head_dim)
                    v = linear(sa["v_proj"], x).reshape(
                        B, S, nkv, self.head_dim)
                    q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
                    q, k = apply_rope(q, k, cos, sin)
                    attn, (k_b, v_b) = cache.attend(
                        (ks[i][:, :nkv], vs[i][:, :nkv]), q, k, v,
                        self.scale, mask)
                    ks = ks.at[i, :, :nkv].set(k_b)
                    vs = vs.at[i, :, :nkv].set(v_b)
                    attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
                    h = h + linear(sa["o_proj"], attn)
            if not fc.get("no_op"):
                x = rms_norm(lp["post_attention_layernorm"], h, eps)
                if fc.get("replace_with_linear"):
                    h = h + linear(lp["mlp"]["linear_mlp"], x)
                else:
                    h = h + swiglu_mlp(lp["mlp"], x)
        h = rms_norm(mp["norm"], h, eps)
        if made:
            return h, None
        return h, dataclasses.replace(cache, k=ks, v=vs,
                                      offset=cache.offset + S)

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
            self.args.num_hidden_layers, batch_size, self.max_kv,
            self.head_dim, capacity, dtype, left_pad,
        )


class Model:
    CONFIG_CLS = TextConfig

    def __init__(self, config: TextConfig):
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

    def sanitize(self, weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            # accept both the HF DeciLM names (linear_attn/linear_mlp) and
            # the bare .linear. of reference LinearSubblockReplacement
            k = k.replace(".self_attn.linear.", ".self_attn.linear_attn.")
            k = k.replace(".mlp.linear.", ".mlp.linear_mlp.")
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return ()


__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel"]
