"""Idefics2: SigLIP-class tower + Perceiver resampler + Mistral decoder.

Role parity: reference mlx_vlm/models/idefics2/ —
Idefics2PerceiverAttention:36 (latents query [context|latents]),
Idefics2PerceiverLayer:86, Idefics2Connector:157 (SwiGLU modality
projection before resampling), key remap sanitize:303.

TPU design: the resampler's fixed 64 latents attend over the patch stream
in a depth-3 scan — one compiled layer body; K/V over the concatenated
[context|latents] stream is a single batched SDPA per layer.
"""

from __future__ import annotations

import dataclasses
import inspect
from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import linear, rms_norm, swiglu_mlp
from ...ops.attention import sdpa
from ..clip_vision import ClipVisionTower
from ..clip_vision import VisionConfig as _ClipVisionConfig
from ..llama.config import TextConfig
from ..llama.language import LanguageModel
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features

STACK_PATTERNS = (
    "language_model.model.layers",
    "vision_tower.vision_model.encoder.layers",
    "connector.perceiver_resampler.layers",
)


@dataclasses.dataclass
class VisionConfig(_ClipVisionConfig):
    model_type: str = "idefics2_vision"
    hidden_size: int = 1152
    num_hidden_layers: int = 27
    intermediate_size: int = 4304
    num_attention_heads: int = 16
    image_size: int = 980
    patch_size: int = 14


@dataclasses.dataclass
class PerceiverConfig(BaseModelConfig):
    model_type: str = "idefics2_perceiver"
    num_key_value_heads: int = 4
    resampler_depth: int = 3
    resampler_head_dim: int = 96
    resampler_n_heads: int = 16
    resampler_n_latents: int = 64


@dataclasses.dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    perceiver_config: PerceiverConfig
    model_type: str = "idefics2"
    image_token_id: int = 32001
    image_token_index: Optional[int] = None
    eos_token_id: Optional[Union[int, List[int]]] = None

    def __post_init__(self):
        if self.image_token_index is not None:
            self.image_token_id = self.image_token_index

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {})
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {})
        params["perceiver_config"] = PerceiverConfig.from_dict(
            params.get("perceiver_config", {}) or {})
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


class PerceiverResampler:
    """64 learned latents attend over the projected patch stream."""

    def __init__(self, config: ModelConfig):
        self.cfg = config
        pc = config.perceiver_config
        self.n_heads = pc.resampler_n_heads
        self.n_kv_heads = pc.num_key_value_heads
        self.head_dim = pc.resampler_head_dim
        self.scale = self.head_dim**-0.5
        self.eps = config.text_config.rms_norm_eps

    def __call__(self, params: dict, context: jax.Array) -> jax.Array:
        """context [B, N, D] -> latents [B, n_latents, D]."""
        B = context.shape[0]
        lat0 = params["perceiver_resampler"]["latents"]
        h = jnp.broadcast_to(lat0[None], (B, *lat0.shape)).astype(
            context.dtype)
        L = h.shape[1]

        def layer(h, lp):
            lat = rms_norm(lp["input_latents_norm"], h, self.eps)
            ctx = rms_norm(lp["input_context_norm"], context, self.eps)
            stream = jnp.concatenate([ctx, lat], axis=1)
            ap = lp["self_attn"]
            q = linear(ap["q_proj"], lat).reshape(
                B, L, self.n_heads, self.head_dim).transpose(0, 2, 1, 3)
            k = linear(ap["k_proj"], stream).reshape(
                B, -1, self.n_kv_heads, self.head_dim).transpose(0, 2, 1, 3)
            v = linear(ap["v_proj"], stream).reshape(
                B, -1, self.n_kv_heads, self.head_dim).transpose(0, 2, 1, 3)
            o = sdpa(q, k, v, self.scale, None)
            o = o.transpose(0, 2, 1, 3).reshape(B, L, -1)
            h = h + linear(ap["o_proj"], o)
            x = rms_norm(lp["post_attention_layernorm"], h, self.eps)
            h = h + swiglu_mlp(lp["mlp"], x)
            return h, None

        h, _ = jax.lax.scan(layer, h,
                            params["perceiver_resampler"]["layers"])
        return rms_norm(params["perceiver_resampler"]["norm"], h, self.eps)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        vc = config.vision_config
        if vc.model_type in ("idefics2", "idefics2_vision"):
            vc.model_type = "siglip_vision_model"
        self.vision_tower = ClipVisionTower(vc)
        self.language_model = LanguageModel(config.text_config, config)
        self.resampler = PerceiverResampler(config)

    def vision_features(self, params, pixel_values, **aux):
        out = self.vision_tower(params["vision_tower"], pixel_values)
        feats = out.post_norm  # [N_img, P, E]
        cp = params["connector"]
        feats = swiglu_mlp(cp["modality_projection"], feats)
        feats = self.resampler(cp, feats)  # [N_img, n_latents, D]
        return feats.reshape(-1, feats.shape[-1])

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,  # [N_img, C, H, W]
        image_features: Optional[jax.Array] = None,
        **aux,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"],
                                           input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        feats = (image_features if image_features is not None
                 else self.vision_features(params, pixel_values))
        return merge_input_ids_with_image_features(
            self.config.image_token_id, -1, feats, embeds, input_ids)

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

    @staticmethod
    def sanitize(weights: dict) -> dict:
        """HF Idefics2ForConditionalGeneration key remap (reference
        sanitize:303)."""

        def transform(key: str) -> str:
            if key.startswith("model.vision_model."):
                return ("vision_tower.vision_model."
                        + key[len("model.vision_model."):])
            if key.startswith("model.connector."):
                return "connector." + key[len("model.connector."):]
            if key.startswith("model.text_model."):
                return "language_model.model." + key[
                    len("model.text_model."):]
            if key.startswith("text_model."):
                return "language_model.model." + key[len("text_model."):]
            if key.startswith("vision_model."):
                return "vision_tower.vision_model." + key[
                    len("vision_model."):]
            if key.startswith("connector."):
                return key
            if key.startswith("lm_head"):
                return "language_model." + key
            return key

        out = {transform(k): v for k, v in weights.items()}
        vt = {k: v for k, v in out.items() if k.startswith("vision_tower.")}
        vt = ClipVisionTower.sanitize(vt)
        out = {k: v for k, v in out.items()
               if not k.startswith("vision_tower.")}
        out.update(vt)
        return out

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
