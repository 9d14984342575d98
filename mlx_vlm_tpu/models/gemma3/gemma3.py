"""Gemma 3 top-level model.

Role parity: reference mlx_vlm/models/gemma3/gemma3.py —
Gemma3MultiModalProjector:15 (4x4 avg-pool + soft-emb RMSNorm + einsum
projection), prepare_inputs_for_multimodal:126 (text/pad/image masked
scatter with 1/sqrt(hidden) feature scaling).

TPU design: the projector's AvgPool2d is a reshape-mean (stride==kernel);
the masked scatter is the shared vectorized gather/where.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import rms_norm
from ..clip_vision import ClipVisionTower
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from .config import ModelConfig, TextConfig, VisionConfig  # noqa: F401
from .language import LanguageModel

STACK_PATTERNS = (
    "language_model.model.layers",
    "vision_tower.vision_model.encoder.layers",
)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = ClipVisionTower(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)
        vc = config.vision_config
        self.patches_per_image = vc.image_size // vc.patch_size
        self.tokens_per_side = int(config.text_config.mm_tokens_per_image**0.5)
        self.pool_kernel = self.patches_per_image // self.tokens_per_side

    def _project(self, params: dict, vision_post: jax.Array) -> jax.Array:
        """[B, N, E] -> [B, mm_tokens, D] (avg-pool grid + norm + project)."""
        mp = params["multi_modal_projector"]
        B, N, E = vision_post.shape
        g = self.patches_per_image
        k = self.pool_kernel
        t = self.tokens_per_side
        x = vision_post.reshape(B, g, g, E)
        x = x.reshape(B, t, k, t, k, E).mean(axis=(2, 4))  # AvgPool2d stride=k
        x = x.reshape(B, t * t, E)
        x = rms_norm(
            mp["mm_soft_emb_norm"], x, self.config.vision_config.layer_norm_eps,
            offset=1.0,
        )
        w = mp["mm_input_projection_weight"]  # [E, D]
        return jnp.einsum(
            "btm,md->btd", x.astype(jnp.float32), w.astype(jnp.float32)
        ).astype(vision_post.dtype)

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
        tower_out = self.vision_tower(params["vision_tower"], pixel_values)
        feats = self._project(params, tower_out.post_norm)
        # reference scales features by 1/sqrt(hidden_size) (gemma3.py:143);
        # note the language model multiplies embeddings by sqrt(hidden) after
        # merge, so scaled features land at unit scale.
        feats = feats / jnp.asarray(
            self.config.hidden_size**0.5, feats.dtype
        )
        feats = feats.reshape(-1, feats.shape[-1])
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

    def vision_aux_inputs(self, grid_thw):
        return {}

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "self_attn.rotary_emb.inv_freq" in k:
                continue
            if not (
                k.startswith("language_model.")
                or k.startswith("vision_tower.")
                or k.startswith("multi_modal_projector.")
            ):
                # text-only gemma3 checkpoints
                k = "language_model." + k
            out[k] = v
        vt = {k: v for k, v in out.items() if k.startswith("vision_tower.")}
        vt = ClipVisionTower.sanitize(vt)
        out = {k: v for k, v in out.items() if not k.startswith("vision_tower.")}
        out.update(vt)
        return out

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
