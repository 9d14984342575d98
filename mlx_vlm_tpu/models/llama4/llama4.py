"""Llama-4 top-level model.

Role parity: reference mlx_vlm/models/llama4/llama4.py —
Llama4MultiModalProjector:26 (single linear), feature merge:85-110.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.layers import linear
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from .config import ModelConfig, TextConfig, VisionConfig  # noqa: F401
from .language import PERIOD, LanguageModel
from .vision import VisionModel

_LAYER_RE = re.compile(r"^language_model\.model\.layers\.(\d+)\.(.+)$")


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = VisionModel(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)

    def vision_features(self, params, pixel_values):
        feats = self.vision_tower(params["vision_model"], pixel_values)
        feats = feats.reshape(-1, feats.shape[-1])
        return linear(params["multi_modal_projector"]["linear_1"], feats)

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,  # [B_tiles, C, H, W]
        image_features: Optional[jax.Array] = None,
        **aux,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"], input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        feats = (
            image_features
            if image_features is not None
            else self.vision_features(params, pixel_values.astype(embeds.dtype))
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

    def vision_aux_inputs(self, grid_thw):
        return {}

    def sanitize(self, weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k or "position_ids" in k:
                continue
            if not k.startswith(("language_model.", "vision_model.",
                                 "multi_modal_projector.")):
                k = "language_model." + k
            m = _LAYER_RE.match(k)
            if m:
                i, rest = int(m.group(1)), m.group(2)
                base = (f"language_model.model.role{i % PERIOD}_layers."
                        f"{i // PERIOD}.")
                if ".switch_mlp." in rest:  # mlx fused layout, already right
                    rest = rest.replace("feed_forward.switch_mlp.",
                                        "feed_forward.experts.")
                    if rest.endswith("_proj"):
                        rest += ".weight"
                    out[base + rest] = v
                    continue
                if rest.endswith("experts.gate_up_proj"):
                    half = v.shape[-1] // 2
                    stem = base + rest[: -len("gate_up_proj")]
                    out[stem + "gate_proj.weight"] = v[..., :half].transpose(0, 2, 1)
                    out[stem + "up_proj.weight"] = v[..., half:].transpose(0, 2, 1)
                    continue
                if rest.endswith("experts.down_proj"):
                    out[base + rest + ".weight"] = v.transpose(0, 2, 1)
                    continue
                if rest.endswith(("experts.gate_proj", "experts.up_proj")):
                    out[base + rest + ".weight"] = v  # mlx fused layout
                    continue
                out[base + rest] = v
                continue
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return tuple(
            f"language_model.model.role{r}_layers" for r in range(PERIOD)
        ) + ("vision_model.model.layers",)
