"""Bunny: SigLIP tower + mlp2x_gelu projector + qwen2/llama decoder.

Role parity: reference mlx_vlm/models/llava_bunny/llava_bunny.py
(Model:88, LlavaMultiModalProjector:58, sanitize:173).  TPU design: the
single <image> placeholder is pre-expanded to 729 patch tokens by the
builtin processor (static shapes for jit), so feature insertion is the
standard masked scatter instead of the reference's per-batch Python
splice (llava_bunny.py:129).
"""

from __future__ import annotations

from typing import Optional

import jax

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
        # image_token_index is negative (-200); embedding take wraps, and
        # those rows are replaced by the scatter below
        ids_safe = jax.numpy.where(input_ids < 0, 0, input_ids)
        embeds = self.language_model.embed(params["language_model"], ids_safe)
        if pixel_values is None:
            return embeds
        feats = self.vision_tower(
            params["vision_tower"], pixel_values
        ).last_hidden  # [B_img, 729, Dv] — reference hidden_state[-1]
        mp = params["mm_projector"]
        feats = linear(mp["linear_1"], feats)
        feats = jax.nn.gelu(feats, approximate=False)
        feats = linear(mp["linear_2"], feats)
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
        """Checkpoint keys: model.vision_tower.vision_tower.vision_model.*,
        model.mm_projector.{0,2}.*, model.{embed_tokens,layers,norm}.*,
        lm_head.* (reference sanitize:173)."""
        out = {}
        for k, v in weights.items():
            if k.startswith("model.vision_tower."):
                k = k[len("model.vision_tower."):]
                if k.startswith("vision_tower."):
                    k = k[len("vision_tower."):]
                if ".head." in k:
                    continue  # SigLIP probe head is unused (ref drops it)
                out["vision_tower." + k] = v
            elif k.startswith("model.mm_projector.0."):
                out["mm_projector.linear_1." + k.split(".")[-1]] = v
            elif k.startswith("model.mm_projector.2."):
                out["mm_projector.linear_2." + k.split(".")[-1]] = v
            elif k.startswith("lm_head"):
                out["language_model." + k] = v
            elif k.startswith("model."):
                out["language_model." + k] = v
            else:
                out[k] = v
        vt = {k: v for k, v in out.items() if k.startswith("vision_tower.")}
        rest = {k: v for k, v in out.items() if not k.startswith("vision_tower.")}
        vt = {
            "vision_tower." + k: v
            for k, v in ClipVisionTower.sanitize(
                {k[len("vision_tower."):]: v for k, v in vt.items()}
            ).items()
        }
        rest.update(vt)
        return {k: v for k, v in rest.items() if "rotary_emb.inv_freq" not in k}

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
