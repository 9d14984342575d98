"""Gemma-4 unified: encoder-free patch embedder over the gemma4 decoder.

Role parity: reference mlx_vlm/models/gemma4_unified/ — VisionEmbedder:24
(LayerNorm -> dense -> LayerNorm -> 2-axis learned positions -> LayerNorm;
no vision transformer at all — the decoder itself attends over raw patch
embeddings), MultimodalEmbedder projection, TextConfig defaults
(config.py:38: k==v global attention, no KV-shared tail, no per-layer
inputs, sliding pattern 6).
"""

from __future__ import annotations

import dataclasses
import inspect
from typing import List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import layer_norm, linear
from ..gemma4.vision import _rms_noscale
from ..gemma4_text.gemma4_text import LanguageModel
from ..gemma4_text.gemma4_text import Model as _TextModel
from ..gemma4_text.gemma4_text import TextConfig as _G4TextConfig
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features


@dataclasses.dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "gemma4_unified_vision"
    patch_size: int = 16
    pooling_kernel_size: int = 3
    model_patch_size: int = 48
    mm_embed_dim: int = 3840
    mm_posemb_size: int = 1120
    num_soft_tokens: int = 280
    rms_norm_eps: float = 1e-6
    output_proj_dims: int = 3840


@dataclasses.dataclass
class TextConfig(_G4TextConfig):
    model_type: str = "gemma4_unified_text"
    num_kv_shared_layers: int = 0
    hidden_size_per_layer_input: int = 0
    attention_k_eq_v: bool = True
    num_global_key_value_heads: Optional[int] = 1
    use_double_wide_mlp: bool = False
    sliding_window_pattern: int = 6


@dataclasses.dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "gemma4_unified"
    image_token_id: int = 258880
    audio_token_id: int = 258881
    video_token_id: Optional[int] = None
    eos_token_id: Optional[Union[int, List[int]]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {})
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {})
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config.text_config, config)

    def vision_features(self, params, pixel_values: jax.Array,
                        image_position_ids=None) -> jax.Array:
        """[N, P, patch_dim] raw model patches -> projected soft tokens
        [N*P, D] (reference VisionEmbedder:24 + get_image_features:171)."""
        vc = self.config.vision_config
        ve = params["vision_embedder"]
        h = layer_norm(ve["patch_ln1"], pixel_values)
        h = linear(ve["patch_dense"], h)
        h = layer_norm(ve["patch_ln2"], h)
        if image_position_ids is not None:
            table = ve["pos_embedding"]  # [P, 2, E]
            clamped = jnp.maximum(image_position_ids, 0)
            valid = (image_position_ids != -1).astype(h.dtype)
            x_pos = jnp.take(table[:, 0], clamped[..., 0], axis=0)
            y_pos = jnp.take(table[:, 1], clamped[..., 1], axis=0)
            h = h + (x_pos * valid[..., 0:1] + y_pos * valid[..., 1:2])
        h = layer_norm(ve["pos_norm"], h)
        ev = params["embed_vision"]
        h = _rms_noscale(h, vc.rms_norm_eps)
        h = linear(ev["embedding_projection"], h)
        return h.reshape(-1, h.shape[-1])

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,
        image_position_ids: Optional[jax.Array] = None,
        **aux,
    ) -> jax.Array:
        cfg = self.config
        embeds = self.language_model.embed(params["language_model"],
                                           input_ids)
        if pixel_values is None:
            return embeds
        feats = self.vision_features(params, pixel_values,
                                     image_position_ids)
        return merge_input_ids_with_image_features(
            cfg.image_token_id, cfg.video_token_id or -1, feats, embeds,
            input_ids)

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
        mm_prefixes = ("vision_embedder.", "embed_vision.", "embed_audio.")
        text = {k: v for k, v in weights.items()
                if not k.startswith(mm_prefixes)}
        rest = {k: v for k, v in weights.items()
                if k.startswith(mm_prefixes)}
        glue = _TextModel(self.config.text_config)
        out = glue.sanitize(text)
        out.update(rest)
        return out

    @property
    def stack_patterns(self):
        return (
            "language_model.model.sliding_layers",
            "language_model.model.full_layers",
            "language_model.model.shared_sliding_layers",
            "language_model.model.shared_full_layers",
        )
