"""Qwen2.5-VL top-level model.

Role parity: reference mlx_vlm/models/qwen2_5_vl/qwen2_5_vl.py.  The language
model is byte-identical in architecture to Qwen2-VL (reference language.py is
a copy with batched-cache tweaks), so we reuse the qwen2_vl LanguageModel.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..qwen2_vl.language import LanguageModel
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from .config import ModelConfig, TextConfig, VisionConfig  # noqa: F401
from .vision import VisionModel, window_partition_aux

STACK_PATTERNS = ("language_model.model.layers", "vision_tower.blocks")


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = VisionModel(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,
        rotary_freqs: Optional[jax.Array] = None,
        seg_full: Optional[jax.Array] = None,
        seg_win: Optional[jax.Array] = None,
        patch_perm: Optional[jax.Array] = None,
        reverse_index: Optional[jax.Array] = None,
        window_index: Optional[jax.Array] = None,  # metadata; unused on device
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"], input_ids)
        if pixel_values is None:
            return embeds
        feats = self.vision_tower(
            params["vision_tower"],
            pixel_values,
            rotary_freqs,
            seg_full,
            seg_win,
            patch_perm,
            reverse_index,
        )
        return merge_input_ids_with_image_features(
            self.config.image_token_id,
            self.config.video_token_id,
            feats,
            embeds,
            input_ids,
        )

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm_params = params["language_model"]
        hidden, cache = self.language_model(
            lm_params, inputs_embeds, cache, position_ids
        )
        return self.language_model.logits(lm_params, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return self.language_model.get_rope_index(
            input_ids, image_grid_thw, video_grid_thw, attention_mask
        )

    def vision_aux_inputs(self, grid_thw: np.ndarray) -> dict:
        return window_partition_aux(grid_thw, self.config.vision_config)

    @staticmethod
    def sanitize(weights: dict) -> dict:
        def transform(key: str) -> str:
            if "vision_tower" not in key:
                key = key.replace("visual", "vision_tower")
            if "language_model" not in key:
                if key.startswith("model."):
                    key = "language_model." + key
                elif key.startswith("lm_head"):
                    key = "language_model." + key
            return key

        weights = {transform(k): v for k, v in weights.items()}
        vt = {k: v for k, v in weights.items() if k.startswith("vision_tower.")}
        vt = VisionModel.sanitize(vt)
        weights = {k: v for k, v in weights.items() if not k.startswith("vision_tower.")}
        weights.update(vt)
        return weights

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
