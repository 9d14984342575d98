"""Hunyuan (MoE, Hunyuan-A13B / Large class) text model.

Role parity: reference mlx_vlm/models/hunyuan/language.py — DynamicNTK-
alpha rope (base * alpha^(d/(d-2)), :22), q/k RMSNorm applied AFTER rope
(:100-103), cross-layer attention (CLA): only layers with
i % cla_share_factor == 0 own k/v projections, the following layers
reuse those pre-rope k/v states (:86-90, HunYuanModel:226), and a mixed
MoE: softmax-then-topk routing (no renorm), optional shared MLP of
num_shared_expert * intermediate width, per-layer moe_topk /
moe_intermediate_size lists (MoeBlock:124).

TPU design: trace-time Python loop (CLA + per-layer lists make the
stack heterogeneous); expert stacks ride core/moe.switch_glu.  Fused
qkv_proj / gate_and_up_proj checkpoint variants and per-expert weights
are normalized at sanitize (reference sanitize:247-282).
"""

from __future__ import annotations

import dataclasses
import inspect
import re
from dataclasses import dataclass
from typing import Optional, Union

import numpy as np

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


def _per_layer(v, i):
    return v[i] if isinstance(v, list) else v


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "hunyuan"
    vocab_size: int = 129024
    hidden_size: int = 4096
    num_hidden_layers: int = 32
    intermediate_size: int = 3072
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    attention_bias: bool = False
    moe_topk: Union[int, list] = 8
    num_experts: int = 64
    num_shared_expert: Union[int, list] = 1
    use_mixed_mlp_moe: bool = True
    use_qk_norm: bool = True
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    use_cla: bool = False
    cla_share_factor: int = 2
    moe_intermediate_size: Optional[Union[int, list]] = None
    rope_scaling: Optional[dict] = None
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 32768

    @classmethod
    def from_dict(cls, params: dict):
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})

    def has_kv_proj(self, i: int) -> bool:
        return (not self.use_cla) or i % self.cla_share_factor == 0


ModelConfig = TextConfig


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.hidden_size // args.num_attention_heads
        self.scale = self.head_dim**-0.5
        alpha = 1.0
        if args.rope_scaling and "alpha" in args.rope_scaling:
            alpha = args.rope_scaling["alpha"]
        d = self.head_dim
        base = args.rope_theta * alpha ** (d / (d - 2))
        self.rope = make_rope(d, base, None, args.max_position_embeddings)

    def _mlp(self, mlp, x, i):
        a = self.args
        if a.num_experts == 1 or "experts" not in mlp:
            return swiglu_mlp(mlp, x)
        B, S, D = x.shape
        flat = x.reshape(B * S, D)
        top_k = _per_layer(a.moe_topk, i)
        # softmax-then-topk, weights NOT renormalized (reference MoeBlock)
        idx, wts = topk_router(flat, mlp["gate"]["wg"]["weight"], top_k,
                               norm_topk_prob=False)
        out = switch_glu(
            flat,
            mlp["experts"]["gate_proj"]["weight"],
            mlp["experts"]["up_proj"]["weight"],
            mlp["experts"]["down_proj"]["weight"],
            idx, wts,
        )
        if "shared_mlp" in mlp:
            out = out + swiglu_mlp(mlp["shared_mlp"], flat)
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
        mask = causal_cache_mask(cache.offset, cache.left_pad, S,
                                 cache.capacity)
        h = inputs_embeds
        mp = params["model"]
        ks, vs = cache.k, cache.v
        shared_kv = None
        for i in range(a.num_hidden_layers):
            lp = mp["layers"][str(i)]
            sa = lp["self_attn"]
            x = rms_norm(lp["input_layernorm"], h, eps)
            q = linear(sa["q_proj"], x).reshape(B, S, self.n_heads,
                                                self.head_dim)
            q = q.transpose(0, 2, 1, 3)
            if a.has_kv_proj(i):
                k = linear(sa["k_proj"], x).reshape(B, S, self.n_kv_heads,
                                                    self.head_dim)
                v = linear(sa["v_proj"], x).reshape(B, S, self.n_kv_heads,
                                                    self.head_dim)
                k, v = k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
                shared_kv = (k, v)
            else:
                k, v = shared_kv
            q, k = apply_rope(q, k, cos, sin)
            if a.use_qk_norm:
                # post-rope norms (reference :100-103)
                q = rms_norm(sa["query_layernorm"], q, eps)
                k = rms_norm(sa["key_layernorm"], k, eps)
            attn, (k_b, v_b) = cache.attend((ks[i], vs[i]), q, k, v,
                                            self.scale, mask)
            ks = ks.at[i].set(k_b)
            vs = vs.at[i].set(v_b)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
            h = h + linear(sa["o_proj"], attn)
            x = rms_norm(lp["post_attention_layernorm"], h, eps)
            h = h + self._mlp(lp["mlp"], x, i)
        h = rms_norm(mp["norm"], h, eps)
        if made:
            return h, None
        return h, dataclasses.replace(cache, k=ks, v=vs,
                                      offset=cache.offset + S)

    def logits(self, params, hidden):
        if "lm_head" in params and not self.args.tie_word_embeddings:
            return linear(params["lm_head"], hidden)
        return embedding_as_linear(params["model"]["embed_tokens"], hidden)

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
        experts = {}  # (layer, role) -> {e: array}
        for k, v in weights.items():
            if k.startswith("language_model."):
                k = k[len("language_model."):]
            m = _EXPERT_RE.match(k)
            if m:
                i, e, role = int(m.group(1)), int(m.group(2)), m.group(3)
                experts.setdefault((i, role), {})[e] = v
                continue
            if "gate_and_up_proj" in k:
                # fused rows pack [up | gate] (reference sanitize:263)
                half = v.shape[0] // 2
                out[("language_model."
                     + k.replace("gate_and_up_proj", "up_proj"))] = v[:half]
                out[("language_model."
                     + k.replace("gate_and_up_proj", "gate_proj"))] = v[half:]
                continue
            if "qkv_proj" in k:
                nkv = a.num_key_value_heads
                grp = a.num_attention_heads // nkv
                hd = a.hidden_size // a.num_attention_heads
                w = v.reshape(nkv, grp + 2, hd, -1)
                out["language_model." + k.replace("qkv_proj", "q_proj")] = (
                    w[:, :grp].reshape(nkv * grp * hd, -1))
                out["language_model." + k.replace("qkv_proj", "k_proj")] = (
                    w[:, grp].reshape(nkv * hd, -1))
                out["language_model." + k.replace("qkv_proj", "v_proj")] = (
                    w[:, grp + 1].reshape(nkv * hd, -1))
                continue
            if "rotary_emb.inv_freq" in k:
                continue
            out["language_model." + k] = v
        for (i, role), by_e in experts.items():
            stacked = np.stack([np.asarray(by_e[e])
                                for e in range(len(by_e))])
            out[(f"language_model.model.layers.{i}.mlp.experts."
                 f"{role}.weight")] = stacked
        return out

    @property
    def stack_patterns(self):
        return ()


__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel"]
