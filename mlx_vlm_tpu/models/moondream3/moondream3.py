"""Moondream3: SigLIP-class crops encoder + Tau/MoE parallel decoder.

Role parity: reference mlx_vlm/models/moondream3/moondream3.py — BOS-first
image insertion with a bidirectional [BOS|image] prefix mask
(get_input_embeddings:40, _create_prefix_attention_mask:92), global+local
crop features concatenated channel-wise through the projection MLP
(vision.py:146), region head skipped (sanitize drops region.*).

The vision tower is structurally identical to moondream2's
(linear patchify + abs pos + ViT + 2x-width projection), so it reuses
MoondreamVisionTower.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..llama.llama import text_position_ids
from ..moondream2.vision import MoondreamVisionTower, VisionConfig as _V2Cfg
from .language import LanguageModel, TextConfig


@dataclasses.dataclass
class VisionConfig(_V2Cfg):
    model_type: str = "moondream3_vision"
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    patch_size: int = 14
    crop_size: int = 378
    proj_inner_dim: int = 8192
    proj_out_dim: int = 2048


@dataclasses.dataclass
class ModelConfig:
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "moondream3"
    eos_token_id: int = 0
    bos_token_id: int = 0

    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfig":
        return cls(
            text_config=TextConfig.from_dict(d.get("text_config", {})),
            vision_config=VisionConfig.from_dict(d.get("vision_config", {})),
            model_type=d.get("model_type", "moondream3"),
            eos_token_id=d.get("eos_token_id", 0),
            bos_token_id=d.get("bos_token_id", 0),
        )


_LAYER_RE = re.compile(r"^language_model\.model\.blocks\.(\d+)\.(.+)$")


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision = MoondreamVisionTower(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)
        self._kd = config.text_config.moe_start_layer

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,  # [n_crops, H, W, 3]
        **aux,
    ) -> jax.Array:
        lm = params["language_model"]
        embeds = self.language_model.embed(lm, input_ids)
        if pixel_values is None:
            return embeds
        feats = self.vision.encode(params["vision"],
                                   pixel_values.astype(embeds.dtype))
        glob = feats[:1]
        img = self.vision.project(params["vision"], glob, glob)
        n_img = img.shape[1]
        bos = embeds[:, :1]
        text = embeds[:, 1 + n_img:] if embeds.shape[1] > 1 + n_img else (
            embeds[:, 1:1])
        return jnp.concatenate([bos, img.astype(embeds.dtype), text], axis=1)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache,
                                            position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return text_position_ids(input_ids, attention_mask)

    def vision_aux_inputs(self, grid_thw):
        return {}

    def sanitize(self, weights: dict) -> dict:
        """HF moondream3 key remap (reference sanitize:123): text.* ->
        language_model.*, vision.* -> vision.encoder.* (except proj_mlp),
        region.* dropped; blocks split into dense/moe role stacks."""
        out = {}
        for k, v in weights.items():
            nk = k
            if nk.startswith("model."):
                nk = nk[len("model."):]
            if nk.startswith("region.") or "position_ids" in nk:
                continue
            if nk in ("text.wte", "text.wte.weight"):
                nk = "language_model.model.wte.weight"
            elif nk.startswith("text.lm_head"):
                nk = "language_model." + nk[len("text."):]
            elif nk.startswith("text."):
                nk = "language_model.model." + nk[len("text."):]
            if nk.startswith("vision.") and not nk.startswith(
                    "vision.proj_mlp"):
                nk = "vision.encoder." + nk[len("vision."):]
            m = _LAYER_RE.match(nk)
            if m:
                i, rest = int(m.group(1)), m.group(2)
                if i < self._kd:
                    nk = f"language_model.model.dense_layers.{i}.{rest}"
                else:
                    nk = (f"language_model.model.moe_layers."
                          f"{i - self._kd}.{rest}")
            out[nk] = v
        return out

    @property
    def stack_patterns(self):
        return (
            "language_model.model.dense_layers",
            "language_model.model.moe_layers",
            "vision.encoder.blocks",
        )
