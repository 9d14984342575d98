"""Pixtral top-level model.

Role parity: reference mlx_vlm/models/pixtral/pixtral.py (llava-style
projector, feature strategy "full", key remap :177-210).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import linear
from ..llama.language import LanguageModel
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from .config import ModelConfig, TextConfig, VisionConfig  # noqa: F401
from .vision import VisionModel, pixtral_vision_aux

STACK_PATTERNS = (
    "language_model.model.layers",
    "vision_tower.transformer.layers",
)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = VisionModel(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)

    def vision_features(self, params, pixel_values, rotary_freqs, segment_ids):
        feats = self.vision_tower(
            params["vision_tower"], pixel_values, rotary_freqs, segment_ids
        )
        mp = params["multi_modal_projector"]
        x = linear(mp["linear_1"], feats)
        x = jax.nn.gelu(x, approximate=False)
        return linear(mp["linear_2"], x)

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,  # [N, C*P*P]
        rotary_freqs: Optional[jax.Array] = None,
        segment_ids: Optional[jax.Array] = None,
        image_features: Optional[jax.Array] = None,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"], input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        feats = (
            image_features
            if image_features is not None
            else self.vision_features(params, pixel_values, rotary_freqs, segment_ids)
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

    def vision_aux_inputs(self, grid_thw) -> dict:
        """grid_thw: [n_images, 2] (h_patches, w_patches) or [n, 3] thw."""
        grids: List[Tuple[int, int]] = []
        for row in np.asarray(grid_thw):
            if len(row) == 3:
                grids.append((int(row[1]), int(row[2])))
            else:
                grids.append((int(row[0]), int(row[1])))
        freqs, segs = pixtral_vision_aux(grids, self.config.vision_config)
        return {"rotary_freqs": freqs, "segment_ids": segs}

    @staticmethod
    def sanitize(weights: dict) -> dict:
        def transform(key: str) -> str:
            key = key.replace("model.vision_encoder", "vision_tower")
            key = key.replace("model.vision_projection", "multi_modal_projector")
            if key.startswith("model.language_model"):
                key = key.replace("model.language_model", "language_model.model")
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
