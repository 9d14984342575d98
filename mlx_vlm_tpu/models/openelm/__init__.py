"""Apple OpenELM text model.

Role parity: reference mlx_vlm/models/openelm/language.py — layer-wise
scaled architecture: per-layer query/kv head counts (num_query_heads /
num_kv_heads lists) and per-layer FFN widths (ffn_multipliers with
make_divisible rounding), fused qkv_proj, optional q/k RMSNorm applied
BEFORE rope (:70-74), gated proj_1 ffn split into (gate, x), tied output
head when share_input_output_layers.

TPU design: the per-layer head counts make the stack heterogeneous, so
layers run as a trace-time Python loop (deepseek/deepseek_v2 pattern)
over dict-indexed params; the KV cache is allocated at max(num_kv_heads)
and each layer reads/writes its leading head slice — one buffer, static
shapes, no padding compute in attention itself.  Fused qkv/proj_1 are
split at sanitize so each layer holds plain per-linear weights.
"""

from __future__ import annotations

import dataclasses
import inspect
import re
from dataclasses import dataclass, field
from typing import List

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import embedding, embedding_as_linear, linear, rms_norm
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, make_rope
from ...core.config import BaseModelConfig
from ..llama.llama import text_position_ids


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "openelm"
    head_dim: int = 64
    num_transformer_layers: int = 16
    model_dim: int = 2048
    vocab_size: int = 32000
    num_query_heads: List[int] = field(default_factory=list)
    num_kv_heads: List[int] = field(default_factory=list)
    ffn_multipliers: List[float] = field(default_factory=list)
    ffn_dim_divisor: int = 256
    ffn_with_glu: bool = True
    normalize_qk_projections: bool = True
    share_input_output_layers: bool = True
    rms_norm_eps: float = 1e-6
    rope_freq_constant: float = 10000
    max_context_length: int = 2048

    @classmethod
    def from_dict(cls, params: dict):
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})

    @property
    def hidden_size(self):
        return self.model_dim

    @property
    def num_hidden_layers(self):
        return self.num_transformer_layers

    @property
    def num_attention_heads(self):
        return max(self.num_query_heads) if self.num_query_heads else 1

    @property
    def num_key_value_heads(self):
        return max(self.num_kv_heads) if self.num_kv_heads else 1


ModelConfig = TextConfig


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.head_dim = args.head_dim
        self.scale = args.head_dim**-0.5
        self.max_kv = max(args.num_kv_heads)
        self.rope = make_rope(args.head_dim, args.rope_freq_constant, None,
                              args.max_context_length)

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
        mp = params["transformer"]
        ks, vs = cache.k, cache.v
        for i in range(a.num_transformer_layers):
            lp = mp["layers"][str(i)]
            nh, nkv = a.num_query_heads[i], a.num_kv_heads[i]
            x = rms_norm(lp["attn_norm"], h, eps)
            at = lp["attn"]
            q = linear(at["q_proj"], x).reshape(B, S, nh, self.head_dim)
            k = linear(at["k_proj"], x).reshape(B, S, nkv, self.head_dim)
            v = linear(at["v_proj"], x).reshape(B, S, nkv, self.head_dim)
            q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            if a.normalize_qk_projections:
                q = rms_norm(at["q_norm"], q, eps)
                k = rms_norm(at["k_norm"], k, eps)
            q, k = apply_rope(q, k, cos, sin)
            attn, (k_b, v_b) = cache.attend(
                (ks[i][:, :nkv], vs[i][:, :nkv]), q, k, v, self.scale, mask)
            ks = ks.at[i, :, :nkv].set(k_b)
            vs = vs.at[i, :, :nkv].set(v_b)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
            h = h + linear(at["o_proj"], attn)
            x = rms_norm(lp["ffn_norm"], h, eps)
            ffn = lp["ffn"]
            g = linear(ffn["gate_proj"], x)
            u = linear(ffn["up_proj"], x)
            h = h + linear(ffn["down_proj"], jax.nn.silu(g) * u)
        h = rms_norm(mp["norm"], h, eps)
        if made:
            return h, None
        return h, dataclasses.replace(cache, k=ks, v=vs,
                                      offset=cache.offset + S)

    def logits(self, params, hidden):
        if self.args.share_input_output_layers or "lm_head" not in params:
            return embedding_as_linear(
                params["transformer"]["token_embeddings"], hidden)
        return linear(params["lm_head"], hidden)

    def embed(self, params, input_ids):
        return embedding(params["transformer"]["token_embeddings"],
                         input_ids)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None):
        return cache_lib.init_cache(
            self.args.num_transformer_layers, batch_size, self.max_kv,
            self.head_dim, capacity, dtype, left_pad,
        )


_QKV_RE = re.compile(r"^transformer\.layers\.(\d+)\.attn\.qkv_proj\.weight$")
_FFN_RE = re.compile(r"^transformer\.layers\.(\d+)\.ffn\.proj_1\.weight$")


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
        hd = a.head_dim
        out = {}
        for k, v in weights.items():
            m = _QKV_RE.match(k)
            if m:
                i = int(m.group(1))
                nh, nkv = a.num_query_heads[i], a.num_kv_heads[i]
                base = f"language_model.transformer.layers.{i}.attn"
                out[f"{base}.q_proj.weight"] = v[: nh * hd]
                out[f"{base}.k_proj.weight"] = v[nh * hd: (nh + nkv) * hd]
                out[f"{base}.v_proj.weight"] = v[(nh + nkv) * hd:]
                continue
            m = _FFN_RE.match(k)
            if m:
                # proj_1 packs [gate | up] rows (reference MLP:110-113)
                i = m.group(1)
                half = v.shape[0] // 2
                base = f"language_model.transformer.layers.{i}.ffn"
                out[f"{base}.gate_proj.weight"] = v[:half]
                out[f"{base}.up_proj.weight"] = v[half:]
                continue
            k = k.replace(".ffn.proj_2.", ".ffn.down_proj.")
            k = k.replace(".attn.out_proj.", ".attn.o_proj.")
            if a.share_input_output_layers and k == "lm_head.weight":
                continue
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return ()


__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel"]
