"""EXAONE-MoE text model.

Role parity: reference mlx_vlm/models/exaone_moe/language.py — GQA with
per-head q/k RMSNorm applied to the UNROTATED projections (:50-53),
mixed sliding/full layer_types where RoPE applies only to sliding layers
(full layers are NoPE) unless the model has no sliding layers at all
(:27-29), per-layer dense/MoE mix via is_moe_layer, and the DeepSeek-V3
"noaux_tc" router: sigmoid scores + e_score_correction_bias for
selection, grouped top-k, original scores as weights scaled by
routed_scaling_factor (group_expert_select:20-52), plus shared experts
of width moe_intermediate_size * num_shared_experts.

TPU design: trace-time Python loop over dict-indexed layers (the
dense/MoE mix is heterogeneous); expert stacks ride core/moe.switch_glu
and the grouped router is the shared core/moe.group_expert_select.
"""

from __future__ import annotations

import dataclasses
import inspect
import re
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import (embedding, embedding_as_linear, linear, rms_norm,
                            swiglu_mlp)
from ...core.mask import causal_cache_mask
from ...core.moe import group_expert_select, switch_glu
from ...core.rope import apply_rope, make_rope
from ...core.config import BaseModelConfig
from ..llama.llama import text_position_ids


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "exaone_moe"
    vocab_size: int = 153600
    hidden_size: int = 4096
    intermediate_size: int = 9216
    moe_intermediate_size: int = 1024
    num_hidden_layers: int = 48
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int = 128
    num_experts: int = 96
    num_experts_per_tok: int = 8
    num_shared_experts: int = 1
    rms_norm_eps: float = 1e-5
    max_position_embeddings: int = 131072
    sliding_window: int = 4096
    layer_types: List[str] = field(default_factory=list)
    is_moe_layer: List[bool] = field(default_factory=list)
    n_group: int = 1
    topk_group: int = 1
    routed_scaling_factor: float = 2.5
    norm_topk_prob: bool = True
    scoring_func: str = "sigmoid"
    topk_method: str = "noaux_tc"
    rope_theta: float = 1000000.0
    rope_scaling: Optional[dict] = None
    rope_parameters: Optional[dict] = None
    tie_word_embeddings: bool = False

    def __post_init__(self):
        if self.rope_parameters and "rope_theta" in self.rope_parameters:
            self.rope_theta = self.rope_parameters["rope_theta"]
        if not self.layer_types:
            self.layer_types = ["full_attention"] * self.num_hidden_layers
        if not self.is_moe_layer:
            self.is_moe_layer = [False] * self.num_hidden_layers

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
        self.head_dim = args.head_dim
        self.scale = args.head_dim**-0.5
        self.rope = make_rope(args.head_dim, args.rope_theta,
                              args.rope_scaling,
                              args.max_position_embeddings)
        self.sliding = [t == "sliding_attention" for t in args.layer_types]
        # rope everywhere iff the model has no sliding layers (:27-29)
        self.rope_all = not any(self.sliding)

    def _moe(self, mlp, x):
        a = self.args
        B, S, D = x.shape
        flat = x.reshape(B * S, D)
        idx, wts = group_expert_select(
            linear({"weight": mlp["gate"]["weight"]}, flat),
            mlp["gate"]["e_score_correction_bias"],
            a.num_experts_per_tok, a.n_group, a.topk_group,
            a.routed_scaling_factor, a.norm_topk_prob,
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
        eps = a.rms_norm_eps
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos, sin = self.rope.cos_sin(position_ids)
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask_f = causal_cache_mask(cache.offset, cache.left_pad, S,
                                   cache.capacity)
        mask_s = causal_cache_mask(cache.offset, cache.left_pad, S,
                                   cache.capacity, window=a.sliding_window)
        h = inputs_embeds
        mp = params["model"]
        ks, vs = cache.k, cache.v
        for i in range(a.num_hidden_layers):
            lp = mp["layers"][str(i)]
            sa = lp["self_attn"]
            x = rms_norm(lp["input_layernorm"], h, eps)
            q = linear(sa["q_proj"], x).reshape(B, S, self.n_heads,
                                                self.head_dim)
            k = linear(sa["k_proj"], x).reshape(B, S, self.n_kv_heads,
                                                self.head_dim)
            v = linear(sa["v_proj"], x).reshape(B, S, self.n_kv_heads,
                                                self.head_dim)
            q = rms_norm(sa["q_norm"], q, eps).transpose(0, 2, 1, 3)
            k = rms_norm(sa["k_norm"], k, eps).transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
            if self.sliding[i] or self.rope_all:
                q, k = apply_rope(q, k, cos, sin)
            mask = mask_s if self.sliding[i] else mask_f
            attn, (k_b, v_b) = cache.attend((ks[i], vs[i]), q, k, v,
                                            self.scale, mask)
            ks = ks.at[i].set(k_b)
            vs = vs.at[i].set(v_b)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
            h = h + linear(sa["o_proj"], attn)
            x = rms_norm(lp["post_attention_layernorm"], h, eps)
            mlp = lp["mlp"]
            h = h + (self._moe(mlp, x) if "experts" in mlp
                     else swiglu_mlp(mlp, x))
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
            if "rotary_emb.inv_freq" in k:
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
