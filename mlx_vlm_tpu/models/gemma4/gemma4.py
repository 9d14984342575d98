"""Gemma-4 multimodal: vision/audio soft tokens over the gemma4 decoder.

Role parity: reference mlx_vlm/models/gemma4/gemma4.py —
MultimodalEmbedder:22 (scale-free pre-norm + projection), masked scatter at
image/audio token ids:107-160, per-layer-input ids zeroed at multimodal
positions:93-105, sanitize clipping-param drop:231.

The text decoder IS the gemma4_text role-split implementation; this module
adds the vision tower and the embedding merge.  Audio riding the same
scatter path lands when a conformer tower is wired (config gates it).
"""

from __future__ import annotations

import dataclasses
import inspect
from typing import List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import linear
from ..gemma4_text.gemma4_text import LanguageModel, TextConfig
from ..gemma4_text.gemma4_text import Model as _TextModel
from ..llama.llama import text_position_ids
from .vision import Gemma4VisionTower, VisionConfig, _rms_noscale


@dataclasses.dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "gemma4"
    image_token_id: int = 258880
    audio_token_id: int = 258881
    video_token_id: Optional[int] = None
    boi_token_id: int = 255999
    eoi_token_id: int = 258882
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
        self.vision_tower = Gemma4VisionTower(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)
        self._text_glue = None

    def _embed_vision(self, params, feats: jax.Array) -> jax.Array:
        ev = params["embed_vision"]
        normed = _rms_noscale(feats, self.config.vision_config.rms_norm_eps)
        return linear(ev["embedding_projection"], normed)

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,  # [N_img, C, H, W]
        **aux,
    ) -> jax.Array:
        cfg = self.config
        mm = input_ids == cfg.image_token_id
        mm = mm | (input_ids == cfg.audio_token_id)
        if cfg.video_token_id is not None:
            mm = mm | (input_ids == cfg.video_token_id)
        # per-layer table reads id 0 at multimodal positions (reference :99)
        embeds = self.language_model.embed(
            params["language_model"], jnp.where(mm, 0, input_ids))
        if pixel_values is None:
            return embeds
        feats = self.vision_tower(params["vision_tower"], pixel_values)
        feats = self._embed_vision(params, feats)
        feats = feats.reshape(-1, feats.shape[-1])
        D = cfg.text_config.hidden_size
        from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features

        # projected features replace the (already-scaled) token embeds in
        # the main channel block; per-layer channels ride along untouched
        main = merge_input_ids_with_image_features(
            cfg.image_token_id, -1, feats, embeds[..., :D], input_ids)
        return jnp.concatenate([main, embeds[..., D:]], axis=-1)

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
        weights = Gemma4VisionTower.sanitize(weights)
        mm_prefixes = ("vision_tower.", "embed_vision.", "embed_audio.",
                       "audio_tower.", "std_bias", "std_scale")
        text = {k: v for k, v in weights.items()
                if not k.startswith(mm_prefixes)}
        rest = {k: v for k, v in weights.items() if k.startswith(mm_prefixes)}
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
            "vision_tower.encoder.layers",
        )
