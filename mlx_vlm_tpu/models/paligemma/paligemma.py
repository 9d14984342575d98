"""PaliGemma / PaliGemma-2 top-level model.

Role parity: reference mlx_vlm/models/paligemma/paligemma.py —
PaliGemmaMultiModalProjector:13 (single linear to projection_dim),
get_input_embeddings:36 (SigLIP tower -> projector -> masked scatter),
1/sqrt(hidden) feature scaling:80 (the LM re-multiplies by sqrt(hidden)
after merge, landing features at unit scale).

TPU design: SigLIP runs in the shared scanned ClipVisionTower; the
text/image merge is the shared vectorized gather/where scatter.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core.layers import linear
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
        tower_out = self.vision_tower(
            params["vision_tower"], pixel_values.astype(embeds.dtype)
        )
        feats = linear(params["multi_modal_projector"]["linear"],
                       tower_out.post_norm)
        # reference paligemma.py:80 scales by 1/sqrt(hidden); HF divides by
        # text_config.hidden_size**0.5 (the LM width), not the root key —
        # the root hidden_size can be a stale default in saved configs
        feats = feats / jnp.asarray(
            self.config.text_config.hidden_size**0.5, feats.dtype
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
            out[k] = v
        vt = {k: v for k, v in out.items() if k.startswith("vision_tower.")}
        vt = ClipVisionTower.sanitize(vt)
        out = {k: v for k, v in out.items() if not k.startswith("vision_tower.")}
        out.update(vt)
        return out

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
