"""Qwen2-VL top-level model.

Role parity: reference mlx_vlm/models/qwen2_vl/qwen2_vl.py (Model:13,
merge_input_ids_with_image_features:78, sanitize:179).

TPU design: the feature merge is a vectorized masked gather (one
cumsum + take + where) instead of the reference's per-row Python loop, so it
jit-compiles and fuses with the embedding lookup.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..base import InputEmbeddingsFeatures
from .config import ModelConfig, TextConfig, VisionConfig  # noqa: F401
from .language import LanguageModel
from .vision import VisionModel, vision_rotary_and_segments

# prefixes whose per-index submodules are stacked for lax.scan at load time
STACK_PATTERNS = ("language_model.model.layers", "vision_tower.blocks")


def merge_input_ids_with_image_features(
    image_token_id: int,
    video_token_id: int,
    image_features: jax.Array,  # [N_feat, D] (concatenated across batch rows)
    inputs_embeds: jax.Array,  # [B, S, D]
    input_ids: jax.Array,  # [B, S]
):
    """Scatter vision features into the embedding sequence at vision tokens."""
    B, S, D = inputs_embeds.shape
    flat_ids = input_ids.reshape(-1)
    is_img = (flat_ids == image_token_id) | (flat_ids == video_token_id)
    # k-th vision token (in row-major flatten order) takes feature k
    feat_idx = jnp.cumsum(is_img.astype(jnp.int32)) - 1
    feat_idx = jnp.clip(feat_idx, 0, image_features.shape[0] - 1)
    gathered = jnp.take(image_features, feat_idx, axis=0)  # [B*S, D]
    merged = jnp.where(
        is_img[:, None], gathered.astype(inputs_embeds.dtype), inputs_embeds.reshape(-1, D)
    )
    return merged.reshape(B, S, D)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = VisionModel(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)

    # ------------------------------------------------------------------ jit
    def vision_features(
        self,
        params: dict,
        pixel_values: jax.Array,
        rotary_freqs: jax.Array,
        segment_ids: jax.Array,
    ) -> jax.Array:
        """Merged vision features [N_merged, D] (cacheable per image)."""
        return self.vision_tower(
            params["vision_tower"], pixel_values, rotary_freqs, segment_ids
        )

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,  # [B, S]
        pixel_values: Optional[jax.Array] = None,  # [N, C*T*P*P]
        rotary_freqs: Optional[jax.Array] = None,
        segment_ids: Optional[jax.Array] = None,
        image_features: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Device part of input embedding (vision tower + merge).

        M-RoPE position ids are produced host-side by `prepare_position_ids`.
        `image_features` short-circuits the tower (vision feature cache,
        reference qwen2_vl.py:50 `cached_image_features`).
        """
        embeds = self.language_model.embed(params["language_model"], input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        feats = (
            image_features
            if image_features is not None
            else self.vision_features(params, pixel_values, rotary_freqs, segment_ids)
        )
        return merge_input_ids_with_image_features(
            self.config.image_token_id,
            self.config.video_token_id,
            feats,
            embeds,
            input_ids,
        )

    def __call__(
        self,
        params: dict,
        inputs_embeds: jax.Array,
        cache,
        position_ids: jax.Array,
    ):
        """Forward over embeddings -> (logits [B,S,V], new_cache)."""
        lm_params = params["language_model"]
        hidden, cache = self.language_model(lm_params, inputs_embeds, cache, position_ids)
        return self.language_model.logits(lm_params, hidden), cache

    # ----------------------------------------------------------------- host
    def prepare_position_ids(
        self,
        input_ids: np.ndarray,
        image_grid_thw: Optional[np.ndarray] = None,
        video_grid_thw: Optional[np.ndarray] = None,
        attention_mask: Optional[np.ndarray] = None,
    ):
        return self.language_model.get_rope_index(
            input_ids, image_grid_thw, video_grid_thw, attention_mask
        )

    def vision_aux_inputs(self, grid_thw: np.ndarray) -> dict:
        """Host-side rotary freqs + segment ids for the vision tower.

        Returns a dict of extra device inputs for get_input_embeddings —
        uniform interface across model families.
        """
        freqs, segs = vision_rotary_and_segments(
            grid_thw,
            self.config.vision_config.spatial_merge_size,
            self.vision_tower.head_dim,
        )
        return {"rotary_freqs": freqs, "segment_ids": segs}

    @staticmethod
    def sanitize(weights: dict) -> dict:
        """HF checkpoint key remap — reference qwen2_vl.py:179-190."""

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

    @property
    def decoder_layers(self) -> int:
        return self.config.text_config.num_hidden_layers
