"""DeepSeek-V2/V3-style decoder: Multi-head Latent Attention + MoE.

Role parity: reference mlx_vlm/models/deepseek_v2/language.py
(DeepseekV2Attention:100, MoEGate:219, DeepseekV2MoE:255, mla.py
MultiLinear), covering the DeepSeek line's core architecture.

TPU design — the reference caches the *expanded* per-head K/V
(language.py:202); here the cache holds what MLA was built for:
- latent cache: the kv_a-normed compressed latent [B, C, r] plus the
  shared roped key [B, C, d_pe] (MQA-style, one per position) — ~10-20x
  smaller than expanded K/V;
- weight absorption at decode: q_nope is premultiplied by W_UK so scores
  are taken directly against the latent, and the attention output in
  latent space is expanded through W_UV afterwards — no per-step K/V
  expansion.
Layers run in a Python loop (first_k_dense_replace makes the stack
heterogeneous: dense MLPs first, MoE after).
"""

from __future__ import annotations

import dataclasses
import inspect
from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import embedding, embedding_as_linear, linear, rms_norm, swiglu_mlp
from ...core.mask import causal_cache_mask
from ...core.moe import switch_glu, topk_router
from ...core.rope import apply_rope, make_rope
from ..llama.llama import text_position_ids

# layers stay unstacked (heterogeneous dense/MoE); per-layer expert stacks
# are generated from the config in Model.stack_patterns
STACK_PATTERNS = ()


@dataclass
class ModelConfig(BaseModelConfig):
    model_type: str = "deepseek_v2"
    vocab_size: int = 102400
    hidden_size: int = 5120
    intermediate_size: int = 12288
    moe_intermediate_size: int = 1536
    num_hidden_layers: int = 27
    num_attention_heads: int = 128
    num_key_value_heads: int = 128
    n_routed_experts: Optional[int] = None
    n_shared_experts: Optional[int] = None
    num_experts_per_tok: Optional[int] = None
    first_k_dense_replace: int = 1
    norm_topk_prob: bool = False
    routed_scaling_factor: float = 1.0
    topk_method: str = "greedy"  # "noaux_tc" for deepseek_v3
    scoring_func: str = "softmax"
    n_group: int = 1
    topk_group: int = 1
    kv_lora_rank: int = 512
    q_lora_rank: Optional[int] = 1536
    qk_rope_head_dim: int = 64
    qk_nope_head_dim: int = 128
    v_head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None
    max_position_embeddings: int = 163840
    attention_bias: bool = False
    tie_word_embeddings: bool = False

    @classmethod
    def from_dict(cls, params: dict):
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["c", "kpe", "offset", "left_pad"],
    meta_fields=[],
)
@dataclasses.dataclass
class MLACache:
    """Latent KV cache: c [L, B, C, r], kpe [L, B, C, d_pe]."""

    c: jax.Array
    kpe: jax.Array
    offset: jax.Array
    left_pad: jax.Array

    @property
    def capacity(self) -> int:
        return self.c.shape[2]


class LanguageModel:
    def __init__(self, args: ModelConfig, config=None):
        self.args = args
        self.config = config or args
        a = args
        self.n_heads = a.num_attention_heads
        self.q_head_dim = a.qk_nope_head_dim + a.qk_rope_head_dim
        self.scale = self.q_head_dim**-0.5
        # residual scale hook (1.0 here; minicpm3 sets scale_depth/sqrt(L))
        self.residual_scale = 1.0
        self.rope = make_rope(
            a.qk_rope_head_dim, a.rope_theta, a.rope_scaling,
            a.max_position_embeddings,
        )

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16, left_pad=None):
        a = self.args
        L = a.num_hidden_layers
        if left_pad is None:
            left_pad = jnp.zeros((batch_size,), jnp.int32)
        return MLACache(
            c=jnp.zeros((L, batch_size, capacity, a.kv_lora_rank), dtype),
            kpe=jnp.zeros((L, batch_size, capacity, a.qk_rope_head_dim), dtype),
            offset=jnp.zeros((), jnp.int32),
            left_pad=left_pad,
        )

    def _mla(self, lp, x, cos, sin, mask, cache, layer_idx):
        a = self.args
        B, S, _ = x.shape
        nh = self.n_heads
        dn, dpe, dv, r = (a.qk_nope_head_dim, a.qk_rope_head_dim,
                          a.v_head_dim, a.kv_lora_rank)
        sa = lp["self_attn"]
        if a.q_lora_rank:
            q = linear(sa["q_a_proj"], x)
            q = rms_norm(sa["q_a_layernorm"], q, 1e-6)
            q = linear(sa["q_b_proj"], q)
        else:
            q = linear(sa["q_proj"], x)
        q = q.reshape(B, S, nh, self.q_head_dim).transpose(0, 2, 1, 3)
        q_nope, q_pe = q[..., :dn], q[..., dn:]

        ckv = linear(sa["kv_a_proj_with_mqa"], x)  # [B, S, r + dpe]
        c_lat = rms_norm(sa["kv_a_layernorm"], ckv[..., :r], 1e-6)
        k_pe = ckv[..., r:][:, None]  # [B, 1, S, dpe] (shared head)
        # rope on the positional halves (q_pe heads + shared k_pe)
        q_pe, k_pe = apply_rope(q_pe, k_pe, cos, sin)
        k_pe = k_pe[:, 0]  # [B, S, dpe]

        # write latents into the cache
        zero = jnp.zeros((), jnp.int32)
        c_buf = jax.lax.dynamic_update_slice(
            cache.c[layer_idx], c_lat.astype(cache.c.dtype), (zero, cache.offset, zero)
        )
        kpe_buf = jax.lax.dynamic_update_slice(
            cache.kpe[layer_idx], k_pe.astype(cache.kpe.dtype),
            (zero, cache.offset, zero),
        )

        # absorbed attention: kv_b [nh*(dn+dv), r] -> W_UK [nh, dn, r],
        # W_UV [nh, dv, r]
        w_kv = sa["kv_b_proj"]["weight"].reshape(nh, dn + dv, r)
        w_uk, w_uv = w_kv[:, :dn], w_kv[:, dn:]
        q_abs = jnp.einsum(
            "bhsd,hdr->bhsr", q_nope.astype(jnp.float32),
            w_uk.astype(jnp.float32),
        )
        scores = jnp.einsum(
            "bhsr,bjr->bhsj", q_abs, c_buf.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        scores += jnp.einsum(
            "bhsd,bjd->bhsj", q_pe.astype(jnp.float32),
            kpe_buf.astype(jnp.float32), preferred_element_type=jnp.float32,
        )
        scores *= self.scale
        scores = jnp.where(mask, scores, -0.7 * jnp.finfo(jnp.float32).max)
        probs = jax.nn.softmax(scores, axis=-1)
        out_lat = jnp.einsum(
            "bhsj,bjr->bhsr", probs, c_buf.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        out = jnp.einsum(
            "bhsr,hdr->bhsd", out_lat, w_uv.astype(jnp.float32)
        ).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, nh * dv)
        return linear(sa["o_proj"], out), c_buf, kpe_buf

    def _moe_or_dense(self, lp, x):
        a = self.args
        mlp = lp["mlp"]
        if "experts" not in mlp:
            return swiglu_mlp(mlp, x)
        B, S, D = x.shape
        flat = x.reshape(B * S, D)
        if a.topk_method == "noaux_tc":
            # deepseek_v3-style sigmoid + group-limited selection
            from ...core.layers import linear as _linear
            from ...core.moe import group_expert_select

            idx, wts = group_expert_select(
                _linear({"weight": mlp["gate"]["weight"]}, flat),
                mlp["gate"]["e_score_correction_bias"],
                a.num_experts_per_tok, a.n_group, a.topk_group,
                a.routed_scaling_factor, a.norm_topk_prob,
            )
        else:
            idx, wts = topk_router(
                flat, mlp["gate"]["weight"], a.num_experts_per_tok,
                a.norm_topk_prob,
            )
            wts = wts * a.routed_scaling_factor
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

    def __call__(self, params, inputs_embeds, cache: MLACache, position_ids):
        a = self.args
        B, S, _ = inputs_embeds.shape
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos, sin = self.rope.cos_sin(position_ids)
        mask = causal_cache_mask(cache.offset, cache.left_pad, S, cache.capacity)
        h = inputs_embeds
        mp = params["model"]
        c_all, kpe_all = cache.c, cache.kpe
        for i in range(a.num_hidden_layers):
            lp = mp["layers"][str(i)]
            x = rms_norm(lp["input_layernorm"], h, a.rms_norm_eps)
            attn, c_buf, kpe_buf = self._mla(lp, x, cos, sin, mask, cache, i)
            c_all = c_all.at[i].set(c_buf)
            kpe_all = kpe_all.at[i].set(kpe_buf)
            h = h + attn * self.residual_scale
            x = rms_norm(lp["post_attention_layernorm"], h, a.rms_norm_eps)
            h = h + self._moe_or_dense(lp, x) * self.residual_scale
        h = rms_norm(mp["norm"], h, a.rms_norm_eps)
        new_cache = dataclasses.replace(
            cache, c=c_all, kpe=kpe_all, offset=cache.offset + S
        )
        return h, new_cache

    def logits(self, params, hidden):
        if self.args.tie_word_embeddings:
            return embedding_as_linear(params["model"]["embed_tokens"], hidden)
        return linear(params["lm_head"], hidden)

    def embed(self, params, input_ids):
        return embedding(params["model"]["embed_tokens"], input_ids)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config)

    def get_input_embeddings(self, params, input_ids, pixel_values=None, **aux):
        return self.language_model.embed(params["language_model"], input_ids)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache, position_ids)
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
        if not a.n_routed_experts:
            return ()
        return tuple(
            (f"language_model.model.layers.{i}.mlp.experts", 0)
            for i in range(a.first_k_dense_replace, a.num_hidden_layers)
        )
