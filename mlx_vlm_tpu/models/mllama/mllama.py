"""Mllama (Llama 3.2 Vision): cross-attention decoder.

Role parity: reference mlx_vlm/models/mllama/ —
MllamaTextCrossAttention (language.py:15, q/k norms, tanh-gated residuals
:236-262), cross_attention_layers interleave (:267-338), SimpleKVCache-style
cross K/V store (models/cache.py:2463), gated tiled ViT (vision.py).

TPU design notes:
- The decoder is heterogeneous (self-attn vs cross-attn layers), so layers
  run in a Python loop (unrolled in jit) instead of lax.scan; the self-attn
  KV cache stays one stacked buffer indexed per layer.
- Cross K/V are computed ONCE from the vision states at prefill and carried
  in the cache (MllamaCache) — decode steps only read them (the reference's
  SimpleKVCache.fetch()).
- v1 vision tower: single-tile path (gated pos-embed + local/global
  transformers + intermediate-layer concat); multi-tile aspect-ratio
  embeddings land with the processor in a later round.
"""

from __future__ import annotations

import dataclasses
import inspect
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.config import BaseModelConfig
from ...core.layers import embedding, layer_norm, linear, rms_norm, swiglu_mlp
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, make_rope
from ...ops.attention import sdpa
from ..llama.llama import text_position_ids

STACK_PATTERNS = ()  # heterogeneous layers stay unstacked


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "mllama"
    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 40
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = False
    rope_theta: float = 500000.0
    rope_scaling: Optional[dict] = None
    max_position_embeddings: int = 131072
    cross_attention_layers: List[int] = field(
        default_factory=lambda: [3, 8, 13, 18, 23, 28, 33, 38]
    )


@dataclass
class VisionConfig(BaseModelConfig):
    image_size: int = 560
    patch_size: int = 14
    num_channels: int = 3
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_hidden_layers: int = 32
    num_attention_heads: int = 16
    max_num_tiles: int = 4
    num_global_layers: int = 8
    norm_eps: float = 1e-5
    vision_output_dim: int = 7680
    intermediate_layers_indices: List[int] = field(
        default_factory=lambda: [3, 7, 15, 23, 30]
    )


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "mllama"
    image_token_index: int = 128256
    vocab_size: int = 128256
    eos_token_id: Optional[List[int]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {}
        )
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {}
        )
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "offset", "left_pad", "cross_k", "cross_v"],
    meta_fields=["has_vision"],
)
@dataclasses.dataclass
class MllamaCache:
    """Self-attn stacked cache + static cross K/V (reference SimpleKVCache
    cache.py:2463 semantics: write once at prefill, fetch during decode)."""

    k: jax.Array  # [L_self, B, H, C, D]
    v: jax.Array
    offset: jax.Array
    left_pad: jax.Array
    cross_k: jax.Array  # [L_cross, B, KVH, T_img, D]
    cross_v: jax.Array
    has_vision: bool

    @property
    def capacity(self) -> int:
        return self.k.shape[3]


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
        self.cross_layers = set(args.cross_attention_layers)
        # map global layer idx -> slot in the self/cross stacks
        self.self_slot = {}
        self.cross_slot = {}
        s = c = 0
        for i in range(args.num_hidden_layers):
            if i in self.cross_layers:
                self.cross_slot[i] = c
                c += 1
            else:
                self.self_slot[i] = s
                s += 1
        self.n_self = s
        self.n_cross = c

    def __call__(self, params, inputs_embeds, cache: MllamaCache, position_ids):
        args = self.args
        B, S, _ = inputs_embeds.shape
        cos, sin = self.rope.cos_sin(position_ids)
        mask = causal_cache_mask(cache.offset, cache.left_pad, S, cache.capacity)
        h = inputs_embeds
        mp = params["model"]
        k_all, v_all = cache.k, cache.v
        for i in range(args.num_hidden_layers):
            lp = mp["layers"][str(i)]
            if i in self.cross_layers:
                if cache.has_vision:
                    h = self._cross_layer(lp, h, cache, self.cross_slot[i])
                # text-only: gated cross block contributes nothing useful
                # without vision states; skipped (reference degenerate path)
            else:
                sl = self.self_slot[i]
                x = rms_norm(lp["input_layernorm"], h, args.rms_norm_eps)
                q = linear(lp["self_attn"]["q_proj"], x).reshape(
                    B, S, self.n_heads, self.head_dim).transpose(0, 2, 1, 3)
                k = linear(lp["self_attn"]["k_proj"], x).reshape(
                    B, S, self.n_kv_heads, self.head_dim).transpose(0, 2, 1, 3)
                v = linear(lp["self_attn"]["v_proj"], x).reshape(
                    B, S, self.n_kv_heads, self.head_dim).transpose(0, 2, 1, 3)
                q, k = apply_rope(q, k, cos, sin)
                kb, vb = cache_lib.update_layer_auto(
                    k_all[sl], v_all[sl], k, v, cache.offset
                )
                k_all = k_all.at[sl].set(kb)
                v_all = v_all.at[sl].set(vb)
                out = sdpa(q, kb, vb, self.scale, mask)
                out = out.transpose(0, 2, 1, 3).reshape(B, S, -1)
                h = h + linear(lp["self_attn"]["o_proj"], out)
                x = rms_norm(lp["post_attention_layernorm"], h, args.rms_norm_eps)
                h = h + swiglu_mlp(lp["mlp"], x)
        h = rms_norm(mp["norm"], h, args.rms_norm_eps)
        new_cache = dataclasses.replace(
            cache, k=k_all, v=v_all, offset=cache.offset + S
        )
        return h, new_cache

    def _cross_layer(self, lp, h, cache: MllamaCache, slot: int):
        args = self.args
        B, S, _ = h.shape
        ca = lp["cross_attn"]
        x = rms_norm(lp["input_layernorm"], h, args.rms_norm_eps)
        q = linear(ca["q_proj"], x).reshape(
            B, S, self.n_heads, self.head_dim).transpose(0, 2, 1, 3)
        q = rms_norm(ca["q_norm"], q, args.rms_norm_eps)
        k = cache.cross_k[slot]
        v = cache.cross_v[slot]
        out = sdpa(q, k, v, self.scale, None)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, -1)
        out = linear(ca["o_proj"], out)
        h = h + jnp.tanh(lp["cross_attn_attn_gate"]) * out
        x = rms_norm(lp["post_attention_layernorm"], h, args.rms_norm_eps)
        mlp_out = swiglu_mlp(lp["mlp"], x)
        return h + jnp.tanh(lp["cross_attn_mlp_gate"]) * mlp_out

    def compute_cross_kv(self, params, cross_states: jax.Array):
        """Project vision states into per-cross-layer K/V (once per prompt;
        reference SimpleKVCache update at first forward)."""
        args = self.args
        B, T, _ = cross_states.shape
        ks, vs = [], []
        for i in sorted(self.cross_layers):
            ca = params["model"]["layers"][str(i)]["cross_attn"]
            k = linear(ca["k_proj"], cross_states).reshape(
                B, T, self.n_kv_heads, self.head_dim).transpose(0, 2, 1, 3)
            k = rms_norm(ca["k_norm"], k, args.rms_norm_eps)
            v = linear(ca["v_proj"], cross_states).reshape(
                B, T, self.n_kv_heads, self.head_dim).transpose(0, 2, 1, 3)
            ks.append(k)
            vs.append(v)
        return jnp.stack(ks), jnp.stack(vs)

    def logits(self, params, hidden):
        if self.args.tie_word_embeddings:
            from ...core.layers import embedding_as_linear

            return embedding_as_linear(params["model"]["embed_tokens"], hidden)
        return linear(params["lm_head"], hidden)

    def embed(self, params, input_ids):
        return embedding(params["model"]["embed_tokens"], input_ids)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16, left_pad=None,
                   n_img_tokens: int = 1):
        shape = (self.n_self, batch_size, self.n_kv_heads, capacity, self.head_dim)
        cshape = (self.n_cross, batch_size, self.n_kv_heads, n_img_tokens,
                  self.head_dim)
        if left_pad is None:
            left_pad = jnp.zeros((batch_size,), jnp.int32)
        return MllamaCache(
            k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
            offset=jnp.zeros((), jnp.int32), left_pad=left_pad,
            cross_k=jnp.zeros(cshape, dtype), cross_v=jnp.zeros(cshape, dtype),
            has_vision=False,
        )


class VisionModel:
    """Single-tile Mllama ViT: patch conv + class token + gated pos-embed +
    local & global transformers, intermediate-layer concat output."""

    def __init__(self, config: VisionConfig):
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5

    def _block(self, lp, h, eps, gated: bool):
        x = layer_norm(lp["input_layernorm"], h, eps)
        B, N, _ = x.shape
        q = linear(lp["self_attn"]["q_proj"], x).reshape(
            B, N, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        k = linear(lp["self_attn"]["k_proj"], x).reshape(
            B, N, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        v = linear(lp["self_attn"]["v_proj"], x).reshape(
            B, N, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        out = sdpa(q, k, v, self.scale, None)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, -1)
        out = linear(lp["self_attn"]["o_proj"], out)
        if gated:
            out = jnp.tanh(lp["gate_attn"]) * out
        h = h + out
        x = layer_norm(lp["post_attention_layernorm"], h, eps)
        mlp = linear(lp["mlp"]["fc2"], jax.nn.gelu(
            linear(lp["mlp"]["fc1"], x), approximate=False))
        if gated:
            mlp = jnp.tanh(lp["gate_ffn"]) * mlp
        return h + mlp

    def __call__(self, params, pixel_values: jax.Array):
        """pixel_values [B, N_patch, C*P*P] (flattened patches, one tile)."""
        cfg = self.config
        w = params["patch_embedding"]["weight"]  # [E, C*P*P]
        h = jnp.dot(pixel_values.astype(w.dtype), w.T,
                    preferred_element_type=jnp.float32).astype(w.dtype)
        B, N, E = h.shape
        cls = jnp.broadcast_to(params["class_embedding"][None, None, :], (B, 1, E))
        h = jnp.concatenate([cls.astype(h.dtype), h], axis=1)
        gate = jnp.tanh(params["gated_positional_embedding"]["gate"])
        pos = params["gated_positional_embedding"]["embedding"][: N + 1]
        h = h + (1 - gate) * pos[None]
        h = layer_norm(params["layernorm_pre"], h, cfg.norm_eps)
        inter = []
        for i in range(cfg.num_hidden_layers):
            h = self._block(
                params["transformer"]["layers"][str(i)], h, cfg.norm_eps, False
            )
            if i in cfg.intermediate_layers_indices:
                inter.append(h)
        h = layer_norm(params["layernorm_post"], h, cfg.norm_eps)
        for i in range(cfg.num_global_layers):
            h = self._block(
                params["global_transformer"]["layers"][str(i)], h, cfg.norm_eps,
                True,
            )
        # output = global output ++ intermediate states (reference vision.py)
        return jnp.concatenate([h] + inter, axis=-1)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config.text_config, config)
        self.vision_tower = VisionModel(config.vision_config)

    def get_input_embeddings(self, params, input_ids, pixel_values=None, **aux):
        return self.language_model.embed(params["language_model"], input_ids)

    def make_cache_with_vision(
        self, params, batch_size, capacity, pixel_values=None, dtype=jnp.float32
    ):
        """Build the cache; when pixels are given, compute vision states and
        the per-cross-layer K/V once."""
        lm = self.language_model
        if pixel_values is None:
            return lm.init_cache(batch_size, capacity, dtype)
        states = self.vision_tower(params["vision_tower"], pixel_values)
        feats = linear(params["multi_modal_projector"], states)
        ck, cv = lm.compute_cross_kv(params["language_model"], feats)
        cache = lm.init_cache(
            batch_size, capacity, dtype, n_img_tokens=ck.shape[3]
        )
        return dataclasses.replace(
            cache, cross_k=ck.astype(dtype), cross_v=cv.astype(dtype),
            has_vision=True,
        )

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
            if k.startswith("vision_model."):
                k = "vision_tower." + k[len("vision_model."):]
            if "patch_embedding.weight" in k and v.ndim == 4:
                v = v.reshape(v.shape[0], -1)
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
