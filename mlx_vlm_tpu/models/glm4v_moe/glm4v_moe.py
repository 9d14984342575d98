"""GLM-4.5V: glm4v vision tower + glm4_moe decoder with sectioned mrope.

Role parity: reference mlx_vlm/models/glm4v_moe/ — vision.py is the glm4v
tower (bicubic pos-embed resample + windowless ViT + merger), language.py
the glm4_moe MoE decoder whose attention applies "sectioned_half_split"
multimodal rope on the partial rotary dims (:92), i.e. chunked sections
with half-split pairing — exactly our `mrope_section_map(.., "chunked")`
plus the standard `apply_rope` partial path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core.rope import default_inv_freq, mrope_cos_sin, mrope_section_map
from ..glm4_moe.glm4_moe import Model as _MoEModel
from ..glm4_moe.language import LanguageModel as _MoELM
from ..glm4v.glm4v import STACK_PATTERNS as _GLM4V_STACKS  # noqa: F401
from ..glm4v.glm4v import VisionModel
from ..qwen2_vl.language import mrope_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from .config import ModelConfig, TextConfig, VisionConfig  # noqa: F401


class LanguageModel(_MoELM):
    def __init__(self, args: TextConfig, config=None):
        super().__init__(args, config)
        self.rot_dim = int(args.head_dim * args.partial_rotary_factor)
        self.inv_freq = jnp.asarray(
            default_inv_freq(self.rot_dim, args.rope_theta), jnp.float32)
        self.section_map = jnp.asarray(
            mrope_section_map(tuple(args.mrope_section), "chunked"))

    def _cos_sin(self, position_ids):
        if position_ids.ndim == 2:
            B, S = position_ids.shape
            position_ids = jnp.broadcast_to(position_ids[None], (3, B, S))
        return mrope_cos_sin(position_ids, self.inv_freq, self.section_map)

    def get_rope_index(self, input_ids, image_grid_thw=None,
                       video_grid_thw=None, attention_mask=None):
        cfg = self.config
        return mrope_position_ids(
            input_ids, image_grid_thw, video_grid_thw, attention_mask,
            merge=cfg.vision_config.spatial_merge_size,
            image_token_id=cfg.image_token_id,
            video_token_id=cfg.video_token_id,
        )


class Model(_MoEModel):
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config.text_config, config)
        self.vision_tower = VisionModel(config.vision_config)
        self._k_dense = config.text_config.first_k_dense_replace

    def vision_features(self, params, pixel_values, rotary_freqs,
                        segment_ids, pos_idx, pos_weights):
        return self.vision_tower(
            params["vision_tower"], pixel_values, rotary_freqs, segment_ids,
            pos_idx, pos_weights)

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,
        rotary_freqs=None, segment_ids=None, pos_idx=None, pos_weights=None,
        image_features: Optional[jax.Array] = None,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"],
                                           input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        feats = (
            image_features if image_features is not None
            else self.vision_features(params, pixel_values, rotary_freqs,
                                      segment_ids, pos_idx, pos_weights))
        return merge_input_ids_with_image_features(
            self.config.image_token_id, self.config.video_token_id,
            feats, embeds, input_ids)

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return self.language_model.get_rope_index(
            input_ids, image_grid_thw, video_grid_thw, attention_mask)

    def vision_aux_inputs(self, grid_thw):
        return self.vision_tower.aux_inputs(grid_thw)

    def sanitize(self, weights: dict) -> dict:
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
        vt = VisionModel.sanitize(vt)
        rest = {k: v for k, v in weights.items()
                if not k.startswith("vision_tower.")}
        # dense/moe layer split rides the glm4_moe sanitize
        rest = super().sanitize(rest)
        rest.update(vt)
        return rest

    @property
    def stack_patterns(self):
        return (
            "vision_tower.blocks",
            "language_model.model.dense_layers",
            "language_model.model.moe_layers",
            ("language_model.model.moe_layers.mlp.experts", 1),
        )
