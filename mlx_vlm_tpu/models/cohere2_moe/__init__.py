"""Cohere2-MoE (Command-A class MoE) text model.

Role parity: reference mlx_vlm/models/cohere2_moe/language.py — the
cohere parallel block (x + attn(norm(x)) + moe(norm(x)), :176-185) with
traditional (interleaved) rope on sliding layers and NoPE globals
(is_sliding_layer:21, force_rope for dense-prefix layers when
prefix_dense_sliding_window_pattern == 1, :59-61), LayerNorm or RMSNorm
by config, logit_scale on tied logits, first_k_dense_replace dense
prefix layers at prefix_dense_intermediate_size, and a sigmoid/softmax
top-k gate with optional renorm plus shared experts combined by
'average' or 'sum' (CohereMoeSparseMoeBlock:102-157).

TPU design: trace-time loop over dict-indexed layers (dense prefix +
MoE body is heterogeneous); per-expert checkpoint weights are stacked
at sanitize for core/moe.switch_glu.
"""

from __future__ import annotations

import dataclasses
import inspect
import re
from dataclasses import dataclass
from typing import List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import (embedding, embedding_as_linear, layer_norm,
                            linear, rms_norm, swiglu_mlp)
from ...core.mask import causal_cache_mask
from ...core.moe import switch_glu
from ...core.rope import apply_rope_traditional, default_inv_freq, rope_cos_sin
from ...core.config import BaseModelConfig
from ..llama.llama import text_position_ids


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "cohere2_moe"
    hidden_size: int = 1024
    head_dim: int = 128
    num_hidden_layers: int = 36
    intermediate_size: int = 1024
    num_attention_heads: int = 64
    num_key_value_heads: int = 8
    rope_theta: float = 50000.0
    vocab_size: int = 256000
    layer_norm_eps: float = 1e-05
    logit_scale: float = 0.0625
    attention_bias: bool = False
    layer_norm_bias: bool = False
    sliding_window: int = 4096
    sliding_window_pattern: int = 4
    num_experts: int = 128
    num_experts_per_tok: int = 8
    norm_topk_prob: bool = True
    num_shared_experts: Optional[int] = None
    moe_num_shared_experts: int = 4
    moe_gate_act: str = "sigmoid"
    expert_selection_fn: Optional[str] = None
    shared_expert_combination_strategy: str = "average"
    rms_norm_eps: Optional[float] = None
    first_k_dense_replace: int = 0
    prefix_dense_intermediate_size: Optional[int] = None
    prefix_dense_sliding_window_pattern: int = 1
    layer_types: Optional[List[str]] = None
    bos_token_id: Optional[int] = None
    eos_token_id: Optional[Union[int, list]] = None
    pad_token_id: Optional[int] = None

    def __post_init__(self):
        if self.num_shared_experts is not None:
            self.moe_num_shared_experts = self.num_shared_experts
        if self.expert_selection_fn is not None:
            self.moe_gate_act = self.expert_selection_fn
        if self.prefix_dense_intermediate_size is None:
            self.prefix_dense_intermediate_size = self.intermediate_size

    @classmethod
    def from_dict(cls, params: dict):
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})

    def is_prefix_dense(self, i: int) -> bool:
        return i < self.first_k_dense_replace

    def is_sliding(self, i: int) -> bool:
        if self.is_prefix_dense(i):
            return False
        if self.layer_types is not None:
            return self.layer_types[i] == "sliding_attention"
        return (i + 1) % self.sliding_window_pattern != 0

    def uses_rope(self, i: int) -> bool:
        force = (self.is_prefix_dense(i)
                 and self.prefix_dense_sliding_window_pattern == 1)
        return self.is_sliding(i) or force


ModelConfig = TextConfig


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.head_dim
        self.scale = args.head_dim**-0.5
        self.inv_freq = np.asarray(
            default_inv_freq(args.head_dim, args.rope_theta), np.float32)

    def _norm(self, p, x):
        a = self.args
        if a.rms_norm_eps is not None:
            return rms_norm(p, x, a.rms_norm_eps)
        return layer_norm(p, x, a.layer_norm_eps)

    def _moe(self, mlp, x):
        a = self.args
        B, S, D = x.shape
        flat = x.reshape(B * S, D)
        logits = linear(mlp["gate"], flat).astype(jnp.float32)
        if a.moe_gate_act == "softmax":
            scores = jax.nn.softmax(logits, axis=-1)
        else:
            scores = jax.nn.sigmoid(logits)
        wts, idx = jax.lax.top_k(scores, a.num_experts_per_tok)
        if a.norm_topk_prob:
            wts = wts / jnp.maximum(jnp.sum(wts, axis=-1, keepdims=True),
                                    1e-12)
        out = switch_glu(
            flat,
            mlp["experts"]["gate_proj"]["weight"],
            mlp["experts"]["up_proj"]["weight"],
            mlp["experts"]["down_proj"]["weight"],
            idx, wts,
        )
        if "shared_experts" in mlp:
            shared = swiglu_mlp(mlp["shared_experts"], flat)
            if a.shared_expert_combination_strategy == "average":
                out = (out + shared) / 2
            else:
                out = out + shared
        return out.reshape(B, S, D)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        a = self.args
        B, S, _ = inputs_embeds.shape
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos, sin = rope_cos_sin(position_ids, jnp.asarray(self.inv_freq))
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask_g = causal_cache_mask(cache.offset, cache.left_pad, S,
                                   cache.capacity)
        mask_l = causal_cache_mask(cache.offset, cache.left_pad, S,
                                   cache.capacity, window=a.sliding_window)
        h = inputs_embeds
        mp = params["model"]
        ks, vs = cache.k, cache.v
        for i in range(a.num_hidden_layers):
            lp = mp["layers"][str(i)]
            x = self._norm(lp["input_layernorm"], h)
            sa = lp["self_attn"]
            q = linear(sa["q_proj"], x).reshape(B, S, self.n_heads,
                                                self.head_dim)
            k = linear(sa["k_proj"], x).reshape(B, S, self.n_kv_heads,
                                                self.head_dim)
            v = linear(sa["v_proj"], x).reshape(B, S, self.n_kv_heads,
                                                self.head_dim)
            q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            if a.uses_rope(i):
                q, k = apply_rope_traditional(q, k, cos, sin)
            mask = mask_l if a.is_sliding(i) else mask_g
            attn, (k_b, v_b) = cache.attend((ks[i], vs[i]), q, k, v,
                                            self.scale, mask)
            ks = ks.at[i].set(k_b)
            vs = vs.at[i].set(v_b)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
            attn = linear(sa["o_proj"], attn)
            mlp = lp["mlp"]
            ff = (self._moe(mlp, x) if "experts" in mlp
                  else swiglu_mlp(mlp, x))
            # parallel residual (reference :176-185)
            h = h + attn + ff
        h = self._norm(mp["norm"], h)
        if made:
            return h, None
        return h, dataclasses.replace(cache, k=ks, v=vs,
                                      offset=cache.offset + S)

    def logits(self, params, hidden):
        out = embedding_as_linear(params["model"]["embed_tokens"], hidden)
        return out * jnp.asarray(self.args.logit_scale, out.dtype)

    def embed(self, params, input_ids):
        return embedding(params["model"]["embed_tokens"], input_ids)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None):
        return cache_lib.init_cache(
            self.args.num_hidden_layers, batch_size, self.n_kv_heads,
            self.head_dim, capacity, dtype, left_pad,
        )


_EXPERT_RE = re.compile(
    r"^model\.layers\.(\d+)\.mlp\.experts\.(\d+)\."
    r"(gate_proj|up_proj|down_proj)\.weight$")


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
        a = self.config
        out = {}
        experts = {}
        for k, v in weights.items():
            if k.startswith("language_model."):
                k = k[len("language_model."):]
            m = _EXPERT_RE.match(k)
            if m:
                i, e, role = int(m.group(1)), int(m.group(2)), m.group(3)
                experts.setdefault((i, role), {})[e] = v
                continue
            if "rotary_emb.inv_freq" in k or k == "lm_head.weight":
                continue
            if k.endswith(".bias"):
                if ".self_attn." in k and not a.attention_bias:
                    continue
                if "layernorm" in k.lower() and not a.layer_norm_bias:
                    continue
            out["language_model." + k] = v
        for (i, role), by_e in experts.items():
            out[(f"language_model.model.layers.{i}.mlp.experts."
                 f"{role}.weight")] = np.stack(
                [np.asarray(by_e[e]) for e in range(len(by_e))])
        return out

    @property
    def stack_patterns(self):
        return ()


__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel"]
