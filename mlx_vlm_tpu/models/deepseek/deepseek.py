"""DeepSeek v1 text model (deepseek-llm / deepseek-moe checkpoints).

Role parity: reference mlx_vlm/models/deepseek/language.py — llama-shaped
GQA attention (optional linear rope scaling) with a mixed dense/MoE
stack: layer i is MoE iff n_routed_experts is set, i >=
first_k_dense_replace and i % moe_layer_freq == 0; MoE adds shared
experts and routes softmax-then-topk WITHOUT renormalizing the top-k
probabilities (language.py MoEGate).

TPU design: heterogeneous layers run in a Python loop (unrolled at
trace time — same approach as deepseek_v2); the expert stacks ride
core/moe.switch_glu so expert parallelism shards them like every other
MoE family.
"""

from __future__ import annotations

import dataclasses
import inspect
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import (embedding, embedding_as_linear, linear, rms_norm,
                            swiglu_mlp)
from ...core.mask import causal_cache_mask
from ...core.moe import switch_glu, topk_router
from ...core.rope import apply_rope, make_rope
from ...core.config import BaseModelConfig
from ..llama.llama import text_position_ids


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "deepseek"
    vocab_size: int = 102400
    hidden_size: int = 4096
    intermediate_size: int = 11008
    moe_intermediate_size: int = 1407
    num_hidden_layers: int = 30
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    n_shared_experts: Optional[int] = None
    n_routed_experts: Optional[int] = None
    num_experts_per_tok: Optional[int] = None
    moe_layer_freq: int = 1
    first_k_dense_replace: int = 0
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None
    attention_bias: bool = False
    tie_word_embeddings: bool = False

    @classmethod
    def from_dict(cls, params: dict):
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})

    def is_moe_layer(self, i: int) -> bool:
        return (self.n_routed_experts is not None
                and i >= self.first_k_dense_replace
                and i % self.moe_layer_freq == 0)


ModelConfig = TextConfig


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.hidden_size // args.num_attention_heads
        self.scale = self.head_dim**-0.5
        self.rope = make_rope(
            self.head_dim, args.rope_theta, args.rope_scaling,
            args.max_position_embeddings,
        )

    def _attn(self, sa, x, cos, sin, mask, cache, cxs):
        B, S, _ = x.shape
        q = linear(sa["q_proj"], x).reshape(B, S, self.n_heads,
                                            self.head_dim)
        k = linear(sa["k_proj"], x).reshape(B, S, self.n_kv_heads,
                                            self.head_dim)
        v = linear(sa["v_proj"], x).reshape(B, S, self.n_kv_heads,
                                            self.head_dim)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        q, k = apply_rope(q, k, cos, sin)
        attn, cxs = cache.attend(cxs, q, k, v, self.scale, mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
        return linear(sa["o_proj"], attn), cxs

    def _moe(self, mlp, x):
        a = self.args
        B, S, D = x.shape
        flat = x.reshape(B * S, D)
        # softmax-then-topk, NO top-k renorm (reference MoEGate)
        idx, wts = topk_router(
            flat, mlp["gate"]["weight"], a.num_experts_per_tok,
            norm_topk_prob=False,
        )
        out = switch_glu(
            flat,
            mlp["experts"]["gate_proj"]["weight"],
            mlp["experts"]["up_proj"]["weight"],
            mlp["experts"]["down_proj"]["weight"],
            idx, wts,
        )
        if "shared_experts" in mlp:
            out = out + swiglu_mlp(mlp["shared_experts"], flat)
        return out.reshape(B, S, D)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        a = self.args
        B, S, _ = inputs_embeds.shape
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
            x = rms_norm(lp["input_layernorm"], h, a.rms_norm_eps)
            attn, (k_i, v_i) = self._attn(
                lp["self_attn"], x, cos, sin, mask, cache,
                (ks[i], vs[i]))
            ks = ks.at[i].set(k_i)
            vs = vs.at[i].set(v_i)
            h = h + attn
            x = rms_norm(lp["post_attention_layernorm"], h, a.rms_norm_eps)
            mlp = lp["mlp"]
            h = h + (self._moe(mlp, x) if "experts" in mlp
                     else swiglu_mlp(mlp, x))
        h = rms_norm(mp["norm"], h, a.rms_norm_eps)
        if made:
            return h, None
        new_cache = dataclasses.replace(
            cache, k=ks, v=vs, offset=cache.offset + S)
        return h, new_cache

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
        a = self.config
        return tuple(
            (f"language_model.model.layers.{i}.mlp.experts", 0)
            for i in range(a.num_hidden_layers)
            if a.is_moe_layer(i)
        )
