"""Qwen3-VL top-level model.

Role parity: reference mlx_vlm/models/qwen3_vl/qwen3_vl.py — Model:35,
masked_scatter merge:16, deepstack_visual_embeds threading:76-115.

TPU design: the vision tower returns (features, deepstack [n_ds, N, D]);
both are scattered at visual-token positions and channel-packed into one
[B, S, D*(1+n_ds)] embedding array (see language.py docstring) so the
generate engines keep their single-array interface.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from .config import ModelConfig, TextConfig, VisionConfig  # noqa: F401
from .language import LanguageModel
from .vision import VisionModel

STACK_PATTERNS = ("language_model.model.layers", "vision_tower.blocks")


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = VisionModel(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)

    def vision_features(self, params, pixel_values, rotary_freqs, segment_ids,
                        pos_idx, pos_weights):
        return self.vision_tower(
            params["vision_tower"], pixel_values, rotary_freqs, segment_ids,
            pos_idx, pos_weights,
        )

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,  # [B, S]
        pixel_values: Optional[jax.Array] = None,  # [N, C*T*P*P]
        rotary_freqs: Optional[jax.Array] = None,
        segment_ids: Optional[jax.Array] = None,
        pos_idx: Optional[jax.Array] = None,
        pos_weights: Optional[jax.Array] = None,
        image_features: Optional[jax.Array] = None,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"], input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        if image_features is not None:
            feats, ds = image_features, None
        else:
            feats, ds = self.vision_features(
                params, pixel_values, rotary_freqs, segment_ids,
                pos_idx, pos_weights,
            )
        img_tok = self.config.image_token_id
        vid_tok = self.config.video_token_id
        merged = merge_input_ids_with_image_features(
            img_tok, vid_tok, feats, embeds, input_ids
        )
        if ds is None:
            return merged
        # channel-pack each deepstack level, scattered at visual positions
        # (zeros elsewhere so the in-layer add is a no-op for text tokens)
        zeros = jnp.zeros_like(embeds)
        packed = [merged]
        for i in range(ds.shape[0]):
            packed.append(
                merge_input_ids_with_image_features(
                    img_tok, vid_tok, ds[i], zeros, input_ids
                )
            )
        return jnp.concatenate(packed, axis=-1)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache, position_ids)
        return self.language_model.logits(lm, hidden), cache

    # ----------------------------------------------------------------- host
    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return self.language_model.get_rope_index(
            input_ids, image_grid_thw, video_grid_thw, attention_mask
        )

    def vision_aux_inputs(self, grid_thw: np.ndarray) -> dict:
        return self.vision_tower.aux_inputs(grid_thw)

    @staticmethod
    def sanitize(weights: dict) -> dict:
        def transform(key: str) -> str:
            key = key.replace("model.visual.", "vision_tower.")
            key = key.replace("model.language_model.", "language_model.model.")
            if key.startswith("visual."):
                key = "vision_tower." + key[len("visual."):]
            if key.startswith("model.") and not key.startswith("model.language"):
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

    @property
    def decoder_layers(self) -> int:
        return self.config.text_config.num_hidden_layers
