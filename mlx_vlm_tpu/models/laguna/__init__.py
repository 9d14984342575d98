"""Laguna text/VLM decoder family.

Role parity: reference mlx_vlm/models/laguna/language.py — qk-norm GQA
with PER-LAYER query head counts (num_attention_heads_per_layer),
softplus attention gating (g_proj; per-head scalar when
gating == "per-head", full-width otherwise, :205-214), sliding/full
layer_types with separate swa rope parameters and optional attention
sinks on sliding layers, and a sparse MoE: sigmoid (or softmax) router
with logit softcapping + e_score_correction_bias selection, top-k
weights from the UNCORRECTED scores, routed scaling, a shared expert,
and dense layers via mlp_only_layers / decoder_sparse_step
(LagunaTopKRouter:27, LagunaSparseMoeBlock:99).

TPU design: trace-time loop (per-layer head counts are heterogeneous);
the KV cache is allocated at the max kv head count; experts ride
core/moe.switch_glu with fused-or-split gate_up checkpoint layouts
normalized at sanitize.  The nvfp4 compressed-expert import path is the
loader's shared compressed-tensors machinery, not family code.
"""

from __future__ import annotations

import dataclasses
import inspect
import re
from dataclasses import dataclass, field
from typing import List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import (embedding, embedding_as_linear, linear, rms_norm,
                            swiglu_mlp)
from ...core.mask import causal_cache_mask
from ...core.moe import switch_glu
from ...core.rope import apply_rope, make_rope
from ...core.config import BaseModelConfig
from ..llama.llama import text_position_ids


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "laguna"
    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 12288
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int = 128
    max_position_embeddings: int = 131072
    rms_norm_eps: float = 1e-6
    qkv_bias: bool = False
    attention_bias: bool = False
    gating: Union[bool, str] = True
    tie_word_embeddings: bool = False
    rope_theta: float = 500000.0
    rope_parameters: Optional[dict] = None
    sliding_window: Optional[int] = None
    layer_types: Optional[List[str]] = None
    num_attention_heads_per_layer: Optional[List[int]] = None
    swa_rope_parameters: Optional[dict] = None
    swa_attention_sink_enabled: bool = False
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    shared_expert_intermediate_size: int = 0
    norm_topk_prob: bool = True
    decoder_sparse_step: int = 1
    mlp_only_layers: List[int] = field(default_factory=lambda: [0])
    moe_routed_scaling_factor: float = 1.0
    moe_router_logit_softcapping: float = 0.0
    moe_router_use_sigmoid: bool = True

    def __post_init__(self):
        if self.layer_types is None:
            self.layer_types = ["full_attention"] * self.num_hidden_layers
        if self.num_attention_heads_per_layer is None:
            self.num_attention_heads_per_layer = (
                [self.num_attention_heads] * self.num_hidden_layers)

    @classmethod
    def from_dict(cls, params: dict):
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})

    def is_moe_layer(self, i: int) -> bool:
        return (i not in self.mlp_only_layers and self.num_experts > 0
                and (i + 1) % self.decoder_sparse_step == 0)


ModelConfig = TextConfig


def _rope_from(args, rp):
    rp = dict(rp or {})
    base = float(rp.get("rope_theta", args.rope_theta))
    partial = float(rp.get("partial_rotary_factor", 1.0))
    dims = int(args.head_dim * partial)
    scaling = rp if rp.get("rope_type") not in (None, "default") else None
    return make_rope(dims, base, scaling,
                     args.max_position_embeddings), dims


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.head_dim
        self.scale = args.head_dim**-0.5
        self.rope_f, self.rot_f = _rope_from(args, args.rope_parameters)
        if args.swa_rope_parameters is not None:
            self.rope_s, self.rot_s = _rope_from(args,
                                                 args.swa_rope_parameters)
        else:
            self.rope_s, self.rot_s = self.rope_f, self.rot_f
        self.sliding = [t == "sliding_attention" for t in args.layer_types]
        self.max_nh = max(args.num_attention_heads_per_layer)

    @staticmethod
    def _partial(q, k, cos, sin, rot):
        qr, kr = apply_rope(q[..., :rot], k[..., :rot], cos, sin)
        if rot == q.shape[-1]:
            return qr, kr
        return (jnp.concatenate([qr, q[..., rot:]], -1),
                jnp.concatenate([kr, k[..., rot:]], -1))

    def _moe(self, mlp, x):
        a = self.args
        B, S, D = x.shape
        flat = x.reshape(B * S, D)
        logits = linear(mlp["gate"]["proj"], flat).astype(jnp.float32)
        c = a.moe_router_logit_softcapping
        if c > 0.0:
            logits = jnp.tanh(logits / c) * c
        scores = (jax.nn.sigmoid(logits) if a.moe_router_use_sigmoid
                  else jax.nn.softmax(logits, axis=-1))
        corrected = scores + mlp["gate"]["e_score_correction_bias"].astype(
            jnp.float32)[None]
        _, idx = jax.lax.top_k(corrected, a.num_experts_per_tok)
        wts = jnp.take_along_axis(scores, idx, axis=-1)
        if a.norm_topk_prob:
            wts = wts / jnp.sum(wts, axis=-1, keepdims=True)
        out = switch_glu(
            flat,
            mlp["experts"]["gate_proj"]["weight"],
            mlp["experts"]["up_proj"]["weight"],
            mlp["experts"]["down_proj"]["weight"],
            idx, wts,
        )
        if a.moe_routed_scaling_factor != 1.0:
            out = out * a.moe_routed_scaling_factor
        out = out + swiglu_mlp(mlp["shared_expert"], flat)
        return out.reshape(B, S, D)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        a = self.args
        B, S, _ = inputs_embeds.shape
        eps = a.rms_norm_eps
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos_f, sin_f = self.rope_f.cos_sin(position_ids)
        cos_s, sin_s = self.rope_s.cos_sin(position_ids)
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask_f = causal_cache_mask(cache.offset, cache.left_pad, S,
                                   cache.capacity)
        mask_s = (causal_cache_mask(cache.offset, cache.left_pad, S,
                                    cache.capacity, window=a.sliding_window)
                  if a.sliding_window else mask_f)
        h = inputs_embeds
        mp = params["model"]
        ks, vs = cache.k, cache.v
        for i in range(a.num_hidden_layers):
            lp = mp["layers"][str(i)]
            sa = lp["self_attn"]
            nh = a.num_attention_heads_per_layer[i]
            sliding = self.sliding[i]
            x = rms_norm(lp["input_layernorm"], h, eps)
            q = linear(sa["q_proj"], x).reshape(B, S, nh, self.head_dim)
            k = linear(sa["k_proj"], x).reshape(B, S, self.n_kv_heads,
                                                self.head_dim)
            v = linear(sa["v_proj"], x).reshape(B, S, self.n_kv_heads,
                                                self.head_dim)
            q = rms_norm(sa["q_norm"], q, eps).transpose(0, 2, 1, 3)
            k = rms_norm(sa["k_norm"], k, eps).transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
            if sliding:
                q, k = self._partial(q, k, cos_s, sin_s, self.rot_s)
            else:
                q, k = self._partial(q, k, cos_f, sin_f, self.rot_f)
            sinks = sa.get("sink") if sliding else None
            attn, (k_b, v_b) = cache.attend(
                (ks[i], vs[i]), q, k, v, self.scale,
                mask_s if sliding else mask_f, flash_ok=False, sinks=sinks)
            ks = ks.at[i].set(k_b)
            vs = vs.at[i].set(v_b)
            attn = attn.transpose(0, 2, 1, 3)  # [B,S,nh,hd]
            if a.gating and "g_proj" in sa:
                gate = jax.nn.softplus(
                    linear(sa["g_proj"], x).astype(jnp.float32))
                if a.gating == "per-head":
                    attn = attn * gate.reshape(B, S, nh, 1).astype(attn.dtype)
                    attn = attn.reshape(B, S, -1)
                else:
                    attn = attn.reshape(B, S, -1) * gate.astype(attn.dtype)
            else:
                attn = attn.reshape(B, S, -1)
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
    r"^model\.layers\.(\d+)\.mlp\.(?:switch_mlp|experts)\.(\d+)\."
    r"(gate_proj|up_proj|down_proj|gate_up_proj)\.weight$")


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
                experts.setdefault((i, role), {})[e] = np.asarray(v)
                continue
            if "rotary_emb.inv_freq" in k:
                continue
            out["language_model." + k] = v
        for (i, role), by_e in experts.items():
            stacked = np.stack([by_e[e] for e in range(len(by_e))])
            base = f"language_model.model.layers.{i}.mlp.experts"
            if role == "gate_up_proj":
                half = stacked.shape[1] // 2
                out[f"{base}.gate_proj.weight"] = stacked[:, :half]
                out[f"{base}.up_proj.weight"] = stacked[:, half:]
            else:
                out[f"{base}.{role}.weight"] = stacked
        return out

    @property
    def stack_patterns(self):
        return ()


__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel"]
