"""LLaVA: CLIP tower + 2-layer projector + Llama decoder.

Role parity: reference mlx_vlm/models/llava/llava.py (Model:32,
LlavaMultiModalProjector:14, feature-layer select :66-88).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import linear
from ..clip_vision import ClipVisionTower
from ..llama.language import LanguageModel
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from .config import ModelConfig

STACK_PATTERNS = (
    "language_model.model.layers",
    "vision_tower.vision_model.encoder.layers",
)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = ClipVisionTower(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,  # [B_img, C, H, W]
        **aux,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"], input_ids)
        if pixel_values is None:
            return embeds
        hidden_states = self.vision_tower(params["vision_tower"], pixel_values).hidden_states
        layer_idx = self.config.vision_feature_layer
        # hidden_states: [L+1, B, N, D]; HF tuple indexing maps directly
        sel = hidden_states[layer_idx]
        if self.config.vision_feature_select_strategy == "default":
            sel = sel[:, 1:]  # drop CLS
        mp = params["multi_modal_projector"]
        feats = linear(mp["linear_1"], sel)
        feats = jax.nn.gelu(feats, approximate=False)
        feats = linear(mp["linear_2"], feats)
        feats = feats.reshape(-1, feats.shape[-1])  # concat over images
        return merge_input_ids_with_image_features(
            self.config.image_token_index,
            -1,
            feats,
            embeds,
            input_ids,
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
        vt = {
            k: v for k, v in weights.items() if k.startswith("vision_tower.")
        }
        vt = ClipVisionTower.sanitize(vt)
        out = {k: v for k, v in weights.items() if not k.startswith("vision_tower.")}
        out.update(vt)
        return {k: v for k, v in out.items() if "rotary_emb.inv_freq" not in k}

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
