"""GLM-OCR: pos-embed-free glm4v-style tower + plain-norm mrope decoder.

Role parity: reference mlx_vlm/models/glm_ocr/ — vision.py is the glm4v
ViT without the interpolated position table and without
post_conv_layernorm (rope only, VisionPatchEmbed:59); the merger is the
same proj->LN->gelu->SwiGLU stack (:91).  language.py is a llama-style
decoder (no sandwich norms) with fused gate_up MLP and "split_select"
multimodal rope = chunked section selection + even-odd pairing
(:57-75) — the glm4v decoder with `sandwich=False`.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import layer_norm, linear, rms_norm
from ..glm4v.glm4v import LanguageModel as _Glm4vLM
from ..glm4v.glm4v import VisionModel as _Glm4vVision
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from ..qwen2_vl.vision import vision_rotary_and_segments


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "glm_ocr_text"
    vocab_size: int = 59392
    hidden_size: int = 1536
    intermediate_size: int = 6144
    num_hidden_layers: int = 16
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-5
    attention_bias: bool = False
    max_position_embeddings: int = 32768
    tie_word_embeddings: bool = False
    rope_parameters: Dict = field(
        default_factory=lambda: {
            "rope_type": "default",
            "mrope_section": [16, 24, 24],
            "partial_rotary_factor": 1.0,
            "rope_theta": 10000,
        })

    @property
    def rope_theta(self):
        return self.rope_parameters.get("rope_theta", 10000)

    @property
    def partial_rotary_factor(self):
        return self.rope_parameters.get("partial_rotary_factor", 1.0)

    @property
    def rope_scaling(self):
        return {"mrope_section": self.rope_parameters.get(
            "mrope_section", [16, 24, 24])}


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "glm_ocr_vision"
    depth: int = 24
    hidden_size: int = 1024
    intermediate_size: int = 4096
    out_hidden_size: int = 1536
    num_heads: int = 16
    patch_size: int = 14
    image_size: int = 336
    in_channels: int = 3
    rms_norm_eps: float = 1e-5
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    hidden_act: str = "silu"


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "glm_ocr"
    image_token_id: int = 59280
    video_token_id: int = 59281
    image_start_token_id: int = 59256
    image_end_token_id: int = 59257
    eos_token_id: Optional[List[int]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {})
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {})
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


class LanguageModel(_Glm4vLM):
    def __init__(self, args: TextConfig, config=None):
        super().__init__(args, config)
        self.sandwich = False


class VisionModel(_Glm4vVision):
    def __call__(self, params, pixel_values, rotary_freqs, segment_ids):
        cfg = self.config
        w = params["patch_embed"]["proj"]["weight"]
        h = jnp.dot(pixel_values.astype(w.dtype), w.T)
        if "bias" in params["patch_embed"]["proj"]:
            h = h + params["patch_embed"]["proj"]["bias"]
        cos = jnp.cos(rotary_freqs)[None]
        sin = jnp.sin(rotary_freqs)[None]
        mask = (segment_ids[None, :] == segment_ids[:, None])[None, None]

        def block(h, lp):
            x = rms_norm(lp["norm1"], h, cfg.rms_norm_eps)
            x = self._attention(lp["attn"], x, cos, sin, mask)
            h = h + x
            x = rms_norm(lp["norm2"], h, cfg.rms_norm_eps)
            g = linear(lp["mlp"]["gate_proj"], x)
            u = linear(lp["mlp"]["up_proj"], x)
            h = h + linear(lp["mlp"]["down_proj"], jax.nn.silu(g) * u)
            return h, None

        h, _ = jax.lax.scan(block, h, params["blocks"])
        h = rms_norm(params["post_layernorm"], h, cfg.rms_norm_eps)
        E = cfg.hidden_size
        win = h.reshape(-1, self.mu * E)
        dw = params["downsample"]["weight"]
        x = jnp.dot(win.astype(dw.dtype), dw.T)
        if "bias" in params["downsample"]:
            x = x + params["downsample"]["bias"]
        mp = params["merger"]
        x = linear(mp["proj"], x)
        x = jax.nn.gelu(
            layer_norm(mp["post_projection_norm"], x, 1e-5),
            approximate=False)
        g = linear(mp["gate_proj"], x)
        u = linear(mp["up_proj"], x)
        return linear(mp["down_proj"], jax.nn.silu(g) * u)

    def aux_inputs(self, grid_thw: np.ndarray) -> dict:
        cfg = self.config
        freqs, segs = vision_rotary_and_segments(
            grid_thw, cfg.spatial_merge_size, self.head_dim)
        return {"rotary_freqs": freqs, "segment_ids": segs}


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = VisionModel(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)

    def vision_features(self, params, pixel_values, rotary_freqs,
                        segment_ids):
        return self.vision_tower(params["vision_tower"], pixel_values,
                                 rotary_freqs, segment_ids)

    def get_input_embeddings(self, params, input_ids, pixel_values=None,
                             rotary_freqs=None, segment_ids=None,
                             image_features=None, **aux):
        embeds = self.language_model.embed(params["language_model"],
                                           input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        if image_features is None:
            image_features = self.vision_features(
                params, pixel_values, rotary_freqs, segment_ids)
        return merge_input_ids_with_image_features(
            self.config.image_token_id, self.config.video_token_id,
            image_features, embeds, input_ids)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache,
                                            position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return self.language_model.get_rope_index(
            input_ids, image_grid_thw, video_grid_thw, attention_mask)

    def vision_aux_inputs(self, grid_thw):
        return self.vision_tower.aux_inputs(np.asarray(grid_thw))

    @staticmethod
    def sanitize(weights: dict) -> dict:
        def transform(key: str) -> str:
            if "visual" in key and "vision_tower" not in key:
                key = key.replace("model.", "").replace("visual",
                                                        "vision_tower")
            if key.startswith("model.language_model"):
                key = key.replace("model.language_model",
                                  "language_model.model")
            elif key.startswith("model.") and not key.startswith(
                    "model.lang"):
                key = "language_model." + key
            if "lm_head" in key and not key.startswith("language_model"):
                key = "language_model." + key
            return key

        weights = {transform(k): v for k, v in weights.items()}
        vt = {k: v for k, v in weights.items()
              if k.startswith("vision_tower.")}
        vt = _Glm4vVision.sanitize(vt)
        rest = {k: v for k, v in weights.items()
                if not k.startswith("vision_tower.")}
        rest.update(vt)
        return rest

    @property
    def stack_patterns(self):
        return ("vision_tower.blocks", "language_model.model.layers")
