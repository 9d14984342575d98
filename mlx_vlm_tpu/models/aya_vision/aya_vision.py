"""Aya Vision (Cohere2 VLM): SigLIP tower + pixel-shuffle SwiGLU adapter +
Cohere parallel-residual decoder.

Role parity: reference mlx_vlm/models/aya_vision — parallel residual
(x + attn(norm) + mlp(norm)):language.py:97-107, sliding layers with
traditional rope / global NoPE layers:language.py:42-66, logit_scale
:language.py:172, AyaVisionMultiModalProjector (pixel shuffle + layernorm +
SwiGLU split):aya_vision.py:14-78.

TPU design: one scanned decoder; the sliding/global choice is a scanned
boolean selecting between roped/unroped q,k and two precomputed masks
(same pattern as gemma3).
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.config import BaseModelConfig
from ...core.layers import (embedding, embedding_as_linear, layer_norm,
                            linear, swiglu_mlp)
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope_traditional, default_inv_freq, rope_cos_sin
from ...ops.attention import sdpa
from ..clip_vision import ClipVisionTower
from ..clip_vision import VisionConfig as _ClipVisionConfig
from ..internvl_chat.internvl_chat import pixel_shuffle_internvl
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features

STACK_PATTERNS = (
    "language_model.model.layers",
    "vision_tower.vision_model.encoder.layers",
)


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "cohere2"
    hidden_size: int = 4096
    head_dim: int = 128
    num_hidden_layers: int = 32
    intermediate_size: int = 14336
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    rope_theta: float = 50000.0
    vocab_size: int = 256000
    layer_norm_eps: float = 1e-5
    layer_norm_bias: bool = False
    logit_scale: float = 0.25
    attention_bias: bool = False
    sliding_window: int = 4096
    sliding_window_pattern: int = 4
    tie_word_embeddings: bool = True
    max_position_embeddings: int = 8192


@dataclass
class VisionConfig(_ClipVisionConfig):
    model_type: str = "siglip_vision_model"


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "aya_vision"
    image_token_index: int = 255036
    downsample_factor: int = 2
    alignment_intermediate_size: int = 28672
    adapter_layer_norm_eps: float = 1e-6
    vision_feature_layer: int = -1
    vision_feature_select_strategy: str = "full"
    eos_token_id: Optional[List[int]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {}
        )
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {}
        )
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.head_dim
        self.scale = args.head_dim**-0.5
        self.inv_freq = jnp.asarray(
            default_inv_freq(args.head_dim, args.rope_theta), jnp.float32
        )
        import numpy as np

        p = args.sliding_window_pattern
        self.is_global = np.asarray(
            [(i + 1) % p == 0 for i in range(args.num_hidden_layers)]
        )

    def __call__(self, params, inputs_embeds, cache, position_ids):
        args = self.args
        B, S, _ = inputs_embeds.shape
        eps = args.layer_norm_eps
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos, sin = rope_cos_sin(position_ids, self.inv_freq)
        h = inputs_embeds
        mp = params["model"]
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask_g = causal_cache_mask(cache.offset, cache.left_pad, S,
                                   cache.capacity)
        mask_l = causal_cache_mask(cache.offset, cache.left_pad, S,
                                   cache.capacity, window=args.sliding_window)
        flags = jnp.asarray(self.is_global)

        def layer(h, xs):
            lp, cxs, is_g = xs
            x = layer_norm(lp["input_layernorm"], h, eps)
            q, k, v = self._qkv(lp["self_attn"], x)
            q_r, k_r = apply_rope_traditional(q, k, cos, sin)
            # global layers are NoPE (reference language.py:60-66)
            q = jnp.where(is_g, q, q_r)
            k = jnp.where(is_g, k, k_r)
            mask = jnp.where(is_g, mask_g, mask_l)
            attn, cxs = cache.attend(cxs, q, k, v, self.scale, mask,
                                     flash_ok=False)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
            attn = linear(lp["self_attn"]["o_proj"], attn)
            # parallel residual: x + attn(norm) + mlp(norm)
            h = h + attn + swiglu_mlp(lp["mlp"], x)
            return h, cxs

        h, cys = jax.lax.scan(
            layer, h, (mp["layers"], cache.scan_arrays(), flags)
        )
        h = layer_norm(mp["norm"], h, eps)
        return h, (None if made else cache.with_arrays(cys, S))

    def _qkv(self, p, x):
        B, S, _ = x.shape
        q = linear(p["q_proj"], x).reshape(B, S, self.n_heads, self.head_dim)
        k = linear(p["k_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        v = linear(p["v_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        return q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)

    def logits(self, params, hidden):
        if self.args.tie_word_embeddings or "lm_head" not in params:
            out = embedding_as_linear(params["model"]["embed_tokens"], hidden)
        else:
            out = linear(params["lm_head"], hidden)
        return out * jnp.asarray(self.args.logit_scale, out.dtype)

    def embed(self, params, input_ids):
        return embedding(params["model"]["embed_tokens"], input_ids)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16, left_pad=None):
        return cache_lib.init_cache(
            self.args.num_hidden_layers, batch_size, self.n_kv_heads,
            self.head_dim, capacity, dtype, left_pad,
        )


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = ClipVisionTower(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)

    def vision_features(self, params, pixel_values):
        out = self.vision_tower(params["vision_tower"], pixel_values)
        mp = params["multi_modal_projector"]
        cfg = self.config
        x = pixel_shuffle_internvl(out.post_norm, 1.0 / cfg.downsample_factor)
        x = layer_norm(mp["layernorm"], x, cfg.adapter_layer_norm_eps)
        x = linear(mp["linear_1"], x)
        a, gate = jnp.split(x, 2, axis=-1)
        x = jax.nn.silu(gate) * a
        x = linear(mp["linear_2"], x)
        return x.reshape(-1, x.shape[-1])

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,
        image_features: Optional[jax.Array] = None,
        **aux,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"], input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        feats = (
            image_features
            if image_features is not None
            else self.vision_features(params, pixel_values.astype(embeds.dtype))
        )
        return merge_input_ids_with_image_features(
            self.config.image_token_index, -1, feats, embeds, input_ids
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
            if not k.startswith(("language_model.", "vision_tower.",
                                 "multi_modal_projector.")):
                k = "language_model." + k
            out[k] = v
        vt = {k: v for k, v in out.items() if k.startswith("vision_tower.")}
        vt = ClipVisionTower.sanitize(vt)
        out = {k: v for k, v in out.items() if not k.startswith("vision_tower.")}
        out.update(vt)
        return out

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
