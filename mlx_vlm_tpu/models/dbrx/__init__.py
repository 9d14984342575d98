"""DBRX (Databricks MoE) text model.

Role parity: reference mlx_vlm/models/dbrx/language.py — fused Wqkv with
qkv clipping (clip_qkv), bias-free LayerNorms, 16-expert/top-4 MoE with
softmax-then-topk routing renormalized over the selected experts, and the
norm_attn_norm residual layout: the MoE input is norm_2(x + attn(norm_1
(x))) while the residual stream stays pre-norm (language.py:76-90,
DecoderLayer:160).

TPU design: one `lax.scan` over stacked layers.  HF stores each layer's
experts FUSED ([E*I, D] w1/v1 and [E*I, D] w2, language.py sanitize:219);
`sanitize` reshapes those straight into the [E, I, D]/[E, D, I] stacked
layout core/moe.switch_glu consumes — no per-expert splitting, no
restacking, and expert parallelism shards them like every other family.
"""

from __future__ import annotations

import inspect
import re
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import embedding, layer_norm, linear
from ...core.mask import causal_cache_mask
from ...core.moe import switch_glu, topk_router
from ...core.rope import apply_rope, make_rope
from ...core.config import BaseModelConfig
from ..llama.llama import text_position_ids


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "dbrx"
    vocab_size: int = 100352
    d_model: int = 6144
    n_layers: int = 40
    n_heads: int = 48
    ffn_config: dict = field(default_factory=dict)
    attn_config: dict = field(default_factory=dict)
    max_seq_len: int = 32768

    @classmethod
    def from_dict(cls, params: dict):
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})

    # uniform accessors used by the generation engine
    @property
    def hidden_size(self):
        return self.d_model

    @property
    def num_hidden_layers(self):
        return self.n_layers

    @property
    def num_attention_heads(self):
        return self.n_heads

    @property
    def num_key_value_heads(self):
        return self.attn_config.get("kv_n_heads", self.n_heads)

    @property
    def head_dim(self):
        return self.d_model // self.n_heads


ModelConfig = TextConfig


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_heads = args.n_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.d_model // args.n_heads
        self.scale = self.head_dim**-0.5
        self.clip_qkv = args.attn_config.get("clip_qkv")
        self.top_k = args.ffn_config.get("moe_top_k", 4)
        self.rope = make_rope(
            self.head_dim, args.attn_config.get("rope_theta", 500000.0),
            None, args.max_seq_len,
        )

    def __call__(self, params, inputs_embeds, cache, position_ids):
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

        def layer(h, xs):
            lp, cxs = xs
            x = layer_norm(lp["norm_1"], h)
            sa = lp["attn"]

            def proj(p):
                y = linear(p, x)
                if self.clip_qkv:
                    y = jnp.clip(y, -self.clip_qkv, self.clip_qkv)
                return y

            q = proj(sa["q_proj"]).reshape(B, S, self.n_heads, self.head_dim)
            k = proj(sa["k_proj"]).reshape(B, S, self.n_kv_heads,
                                           self.head_dim)
            v = proj(sa["v_proj"]).reshape(B, S, self.n_kv_heads,
                                           self.head_dim)
            q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            q, k = apply_rope(q, k, cos, sin)
            attn, cxs = cache.attend(cxs, q, k, v, self.scale, mask)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
            r = h + linear(sa["o_proj"], attn)

            x = layer_norm(lp["norm_2"], r)
            flat = x.reshape(B * S, -1)
            mlp = lp["mlp"]
            idx, wts = topk_router(flat, mlp["gate"]["weight"], self.top_k,
                                   norm_topk_prob=True)
            out = switch_glu(
                flat,
                mlp["experts"]["gate_proj"]["weight"],
                mlp["experts"]["up_proj"]["weight"],
                mlp["experts"]["down_proj"]["weight"],
                idx, wts,
            )
            return r + out.reshape(B, S, -1), cxs

        h, cys = jax.lax.scan(layer, h, (mp["layers"], cache.scan_arrays()))
        h = layer_norm(mp["norm_f"], h)
        return h, (None if made else cache.with_arrays(cys, S))

    def logits(self, params, hidden):
        return linear(params["lm_head"], hidden)

    def embed(self, params, input_ids):
        return embedding(params["model"]["wte"], input_ids)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None):
        return cache_lib.init_cache(
            self.args.n_layers, batch_size, self.n_kv_heads,
            self.head_dim, capacity, dtype, left_pad,
        )


_WQKV_RE = re.compile(
    r"^transformer\.blocks\.(\d+)\.norm_attn_norm\.attn\.Wqkv\.weight$")
_EXPERT_RE = re.compile(
    r"^transformer\.blocks\.(\d+)\.ffn\.experts\.mlp\.(w1|v1|w2)$")


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
        cfg = self.config
        D = cfg.d_model
        kvd = cfg.num_key_value_heads * cfg.head_dim
        E = cfg.ffn_config.get("moe_num_experts", 16)
        out = {}
        for k, v in weights.items():
            m = _WQKV_RE.match(k)
            if m:
                base = f"language_model.model.layers.{m.group(1)}.attn"
                out[f"{base}.q_proj.weight"] = v[:D]
                out[f"{base}.k_proj.weight"] = v[D:D + kvd]
                out[f"{base}.v_proj.weight"] = v[D + kvd:]
                continue
            m = _EXPERT_RE.match(k)
            if m:
                # fused [E*I, D]: w1 = gate, v1 = up, w2 = down (used
                # transposed — reference sanitize language.py:231)
                i, name = m.group(1), m.group(2)
                role = {"w1": "gate_proj", "v1": "up_proj",
                        "w2": "down_proj"}[name]
                ew = v.reshape(E, -1, v.shape[-1])  # [E, I, D]
                if name == "w2":
                    ew = ew.transpose(0, 2, 1)  # [E, D, I]
                base = f"language_model.model.layers.{i}.mlp.experts"
                out[f"{base}.{role}.weight"] = ew
                continue
            k = re.sub(r"^transformer\.blocks\.(\d+)\.",
                       r"language_model.model.layers.\1.", k)
            k = k.replace(".norm_attn_norm.norm_1.", ".norm_1.")
            k = k.replace(".norm_attn_norm.norm_2.", ".norm_2.")
            k = k.replace(".norm_attn_norm.attn.out_proj.", ".attn.o_proj.")
            k = k.replace(".ffn.router.layer.", ".mlp.gate.")
            if k == "transformer.wte.weight":
                k = "language_model.model.wte.weight"
            elif k.startswith("transformer.norm_f."):
                k = "language_model.model.norm_f." + k.split(".", 2)[2]
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return ("language_model.model.layers",)


__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel"]
