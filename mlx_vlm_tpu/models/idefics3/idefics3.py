"""Idefics3 / SmolVLM: SigLIP tower + pixel-shuffle connector + Llama LM.

Role parity: reference mlx_vlm/models/idefics3/idefics3.py —
Idefics3Connector:47 (pixel_shuffle:53), masked scatter:15, sanitize:204.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core.layers import linear
from ..clip_vision import ClipVisionTower
from ..llama.language import LanguageModel
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from .config import ModelConfig, TextConfig, VisionConfig  # noqa: F401

STACK_PATTERNS = (
    "language_model.model.layers",
    "vision_tower.vision_model.encoder.layers",
)


def pixel_shuffle(x: jax.Array, scale_factor: int) -> jax.Array:
    """[B, N, E] -> [B, N/sf^2, E*sf^2] (HF Idefics3Connector semantics)."""
    B, N, E = x.shape
    g = int(round(N**0.5))
    sf = scale_factor
    x = x.reshape(B, g, g, E)
    x = x.reshape(B, g, g // sf, E * sf)
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(B, g // sf, g // sf, E * sf * sf)
    x = x.transpose(0, 2, 1, 3)
    return x.reshape(B, N // (sf * sf), E * sf * sf)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        vc = config.vision_config
        # the idefics3 vision encoder is architecturally SigLIP
        if vc.model_type in ("idefics3", "idefics3_vision", "smolvlm_vision"):
            vc.model_type = "siglip_vision_model"
        self.vision_tower = ClipVisionTower(vc)
        self.language_model = LanguageModel(config.text_config, config)

    def vision_features(self, params, pixel_values, **aux):
        out = self.vision_tower(params["vision_tower"], pixel_values)
        feats = pixel_shuffle(out.post_norm, self.config.scale_factor)
        feats = linear(params["connector"]["proj"], feats)
        return feats.reshape(-1, feats.shape[-1])

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,  # [B_img, C, H, W]
        image_features: Optional[jax.Array] = None,
        **aux,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"], input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        feats = (
            image_features
            if image_features is not None
            else self.vision_features(params, pixel_values)
        )
        return merge_input_ids_with_image_features(
            self.config.image_token_id, -1, feats, embeds, input_ids
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
        """HF Idefics3ForConditionalGeneration key remap."""

        def transform(key: str) -> str:
            if key.startswith("model.vision_model."):
                return "vision_tower.vision_model." + key[len("model.vision_model."):]
            if key.startswith("model.connector.modality_projection.proj"):
                return key.replace(
                    "model.connector.modality_projection.proj", "connector.proj"
                )
            if key.startswith("model.text_model."):
                return "language_model.model." + key[len("model.text_model."):]
            if key.startswith("lm_head"):
                return "language_model." + key
            return key

        out = {transform(k): v for k, v in weights.items()}
        vt = {k: v for k, v in out.items() if k.startswith("vision_tower.")}
        vt = ClipVisionTower.sanitize(vt)
        out = {k: v for k, v in out.items() if not k.startswith("vision_tower.")}
        out.update(vt)
        return out

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
