"""Mistral-Small-3.x VLM: pixtral tower + spatial patch merger + mistral text.

Role parity: reference mlx_vlm/models/mistral3/mistral3.py —
Mistral3PatchMerger:110 (unfold 2x2 merge over per-image grids),
Mistral3MultiModalProjector:183 (RMSNorm -> merge -> linear/gelu/linear),
sanitize key remaps:369-405.

TPU design: the per-image unfold (a Python loop over variable image grids in
the reference) becomes a host-side gather plan — merged token m lists its
merge_size^2 member patch indices — and a single device take+reshape, so
mixed image sizes stay one packed sequence with static shapes per prompt.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import linear, rms_norm
from ..llama.language import LanguageModel
from ..llama.llama import text_position_ids
from ..pixtral.config import TextConfig as _PixtralText
from ..pixtral.config import VisionConfig
from ..pixtral.vision import VisionModel, pixtral_vision_aux
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features

STACK_PATTERNS = (
    "language_model.model.layers",
    "vision_tower.transformer.layers",
)


@dataclass
class TextConfig(_PixtralText):
    model_type: str = "mistral"


@dataclass
class ModelConfig:
    text_config: TextConfig = field(default_factory=TextConfig)
    vision_config: VisionConfig = field(default_factory=VisionConfig)
    model_type: str = "mistral3"
    ignore_index: int = -100
    image_token_index: Optional[int] = None
    image_token_id: Optional[int] = 10
    vision_feature_select_strategy: str = "full"
    vision_feature_layer: int = -1
    vocab_size: int = 131072
    spatial_merge_size: int = 2
    multimodal_projector_bias: bool = False
    eos_token_id: Optional[List[int]] = None

    def __post_init__(self):
        if self.image_token_index is None:
            self.image_token_index = self.image_token_id

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {}
        )
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {}
        )
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


def patch_merge_plan(image_grids: List[Tuple[int, int]], m: int) -> np.ndarray:
    """[N_merged, m*m] source indices into the packed patch sequence.

    Mirrors torch unfold(kernel=stride=m) per image (reference
    mistral3.py:20-107): block (br, bc) of image i collects patches
    (br*m+di, bc*m+dj) in row-major (di, dj) order."""
    idx = []
    base = 0
    for h, w in image_grids:
        for br in range(h // m):
            for bc in range(w // m):
                idx.append(
                    [
                        base + (br * m + di) * w + (bc * m + dj)
                        for di in range(m)
                        for dj in range(m)
                    ]
                )
        base += h * w
    return np.asarray(idx, np.int32)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = VisionModel(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)
        self.m = config.spatial_merge_size

    def vision_features(self, params, pixel_values, rotary_freqs, segment_ids,
                        merge_idx):
        feats = self.vision_tower(
            params["vision_tower"], pixel_values, rotary_freqs, segment_ids
        )  # [N, E]
        mp = params["multi_modal_projector"]
        x = rms_norm(mp["norm"], feats, self.config.text_config.rms_norm_eps)
        # gather members, channel-major concat (unfold order: c slow, j fast)
        g = jnp.take(x, merge_idx, axis=0)  # [N_m, m*m, E]
        g = g.transpose(0, 2, 1).reshape(g.shape[0], -1)  # [N_m, E*m*m]
        x = linear(mp["patch_merger"]["merging_layer"], g)
        x = jax.nn.gelu(linear(mp["linear_1"], x), approximate=False)
        return linear(mp["linear_2"], x)

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,  # [N, C*P*P]
        rotary_freqs: Optional[jax.Array] = None,
        segment_ids: Optional[jax.Array] = None,
        merge_idx: Optional[jax.Array] = None,
        image_features: Optional[jax.Array] = None,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"], input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        feats = (
            image_features
            if image_features is not None
            else self.vision_features(
                params, pixel_values, rotary_freqs, segment_ids, merge_idx
            )
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
        grids: List[Tuple[int, int]] = []
        for row in np.asarray(grid_thw):
            grids.append((int(row[-2]), int(row[-1])))
        freqs, segs = pixtral_vision_aux(grids, self.config.vision_config)
        return {
            "rotary_freqs": freqs,
            "segment_ids": segs,
            "merge_idx": patch_merge_plan(grids, self.m),
        }

    @staticmethod
    def sanitize(weights: dict) -> dict:
        def transform(key: str) -> str:
            if key.startswith(("model.vision_tower.",
                               "model.multi_modal_projector.")):
                key = key[len("model."):]
            key = key.replace("model.vision_encoder", "vision_tower")
            key = key.replace("model.vision_projection", "multi_modal_projector")
            key = key.replace("vision_tower.vision_model.", "vision_tower.")
            if key.startswith("model.language_model"):
                key = key.replace("model.language_model", "language_model.model")
            elif key.startswith("model."):
                key = "language_model." + key
            elif key.startswith("lm_head"):
                key = "language_model." + key
            return key

        weights = {transform(k): v for k, v in weights.items()}
        vt = {k: v for k, v in weights.items() if k.startswith("vision_tower.")}
        vt = VisionModel.sanitize(vt)
        weights = {k: v for k, v in weights.items()
                   if not k.startswith("vision_tower.")}
        weights.update(vt)
        return weights

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
