"""MiMo-V2-Flash (Xiaomi) text model.

Role parity: reference mlx_vlm/models/mimo_v2_flash/language.py — a
hybrid stack (hybrid_layer_pattern: 1 = sliding-window layer using its
own swa_* head geometry / rope theta, 0 = full-attention layer), v head
dim decoupled from qk head dim, optional per-head attention SINK biases
(add_*_attention_sink_bias -> learned ones-init logits in the softmax
denominator, :44-47, :84), partial rotary (first
partial_rotary_factor * head_dim features rotate, rest pass), and a
MoE-per-layer mask (moe_layer_freq[idx] == 1) with the DeepSeek-V3
noaux_tc sigmoid router + shared experts (MoEGate:125-153).

TPU design: trace-time loop (two attention geometries are
heterogeneous); the KV cache is allocated at the max kv head count and
max(head_dim, v_head_dim) so both layer types share one buffer, each
slicing its own head/dim extents; sinks ride the shared sdpa `sinks=`
path (gpt_oss parity).
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
    model_type: str = "mimo_v2_flash"
    num_experts_per_tok: int = 8
    hybrid_layer_pattern: List[int] = field(default_factory=list)
    moe_layer_freq: List[int] = field(default_factory=list)
    add_swa_attention_sink_bias: bool = False
    add_full_attention_sink_bias: bool = False
    sliding_window_size: int = 4096
    vocab_size: int = 151680
    hidden_size: int = 4096
    intermediate_size: int = 11264
    moe_intermediate_size: int = 1408
    num_hidden_layers: int = 48
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    n_shared_experts: Optional[int] = None
    n_routed_experts: Optional[int] = 256
    routed_scaling_factor: Optional[float] = 2.5
    topk_method: str = "noaux_tc"
    scoring_func: str = "sigmoid"
    norm_topk_prob: bool = True
    n_group: int = 1
    topk_group: int = 1
    max_position_embeddings: int = 262144
    layernorm_epsilon: float = 1e-6
    rope_theta: float = 640000.0
    swa_rope_theta: float = 10000.0
    swa_num_attention_heads: int = 64
    swa_num_key_value_heads: int = 8
    head_dim: int = 128
    v_head_dim: int = 128
    swa_head_dim: int = 64
    swa_v_head_dim: int = 64
    partial_rotary_factor: float = 1.0
    tie_word_embeddings: bool = False

    def __post_init__(self):
        L = self.num_hidden_layers
        if not self.hybrid_layer_pattern:
            self.hybrid_layer_pattern = [0] * L
        if not self.moe_layer_freq:
            self.moe_layer_freq = [0] * L

    @classmethod
    def from_dict(cls, params: dict):
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})

    def geom(self, i: int):
        """(n_heads, n_kv, head_dim, v_head_dim, has_sinks) for layer i."""
        if self.hybrid_layer_pattern[i] == 1:
            return (self.swa_num_attention_heads,
                    self.swa_num_key_value_heads, self.swa_head_dim,
                    self.swa_v_head_dim, self.add_swa_attention_sink_bias)
        return (self.num_attention_heads, self.num_key_value_heads,
                self.head_dim, self.v_head_dim,
                self.add_full_attention_sink_bias)


ModelConfig = TextConfig


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.rot_full = int(args.partial_rotary_factor * args.head_dim)
        self.rot_swa = int(args.partial_rotary_factor * args.swa_head_dim)
        self.rope_full = make_rope(self.rot_full, args.rope_theta, None,
                                   args.max_position_embeddings)
        self.rope_swa = make_rope(self.rot_swa, args.swa_rope_theta, None,
                                  args.max_position_embeddings)
        self.max_kv = max(
            args.geom(i)[1] for i in range(args.num_hidden_layers))
        self.max_dim = max(
            max(args.geom(i)[2], args.geom(i)[3])
            for i in range(args.num_hidden_layers))

    @staticmethod
    def _partial_rope(q, k, cos, sin, rot):
        qr, kr = apply_rope(q[..., :rot], k[..., :rot], cos, sin)
        if rot == q.shape[-1]:
            return qr, kr
        return (jnp.concatenate([qr, q[..., rot:]], -1),
                jnp.concatenate([kr, k[..., rot:]], -1))

    def _moe(self, mlp, x):
        a = self.args
        B, S, D = x.shape
        flat = x.reshape(B * S, D)
        idx, wts = group_expert_select(
            linear({"weight": mlp["gate"]["weight"]}, flat),
            mlp["gate"]["e_score_correction_bias"],
            a.num_experts_per_tok, a.n_group, a.topk_group,
            a.routed_scaling_factor or 1.0, a.norm_topk_prob,
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
        eps = a.layernorm_epsilon
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos_f, sin_f = self.rope_full.cos_sin(position_ids)
        cos_s, sin_s = self.rope_swa.cos_sin(position_ids)
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask_f = causal_cache_mask(cache.offset, cache.left_pad, S,
                                   cache.capacity)
        mask_s = causal_cache_mask(cache.offset, cache.left_pad, S,
                                   cache.capacity,
                                   window=a.sliding_window_size)
        h = inputs_embeds
        mp = params["model"]
        ks, vs = cache.k, cache.v
        for i in range(a.num_hidden_layers):
            lp = mp["layers"][str(i)]
            sa = lp["self_attn"]
            nh, nkv, hd, vd, has_sinks = a.geom(i)
            sliding = a.hybrid_layer_pattern[i] == 1
            x = rms_norm(lp["input_layernorm"], h, eps)
            q = linear(sa["q_proj"], x).reshape(B, S, nh, hd)
            k = linear(sa["k_proj"], x).reshape(B, S, nkv, hd)
            v = linear(sa["v_proj"], x).reshape(B, S, nkv, vd)
            q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            if sliding:
                q, k = self._partial_rope(q, k, cos_s, sin_s, self.rot_swa)
            else:
                q, k = self._partial_rope(q, k, cos_f, sin_f, self.rot_full)
            sinks = sa.get("attention_sink_bias") if has_sinks else None
            mask = mask_s if sliding else mask_f
            attn, (k_b, v_b) = cache.attend(
                (ks[i][:, :nkv, :, :hd], vs[i][:, :nkv, :, :vd]),
                q, k, v, hd**-0.5, mask, flash_ok=False, sinks=sinks)
            ks = ks.at[i, :, :nkv, :, :hd].set(k_b)
            vs = vs.at[i, :, :nkv, :, :vd].set(v_b)
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
            self.args.num_hidden_layers, batch_size, self.max_kv,
            self.max_dim, capacity, dtype, left_pad,
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
