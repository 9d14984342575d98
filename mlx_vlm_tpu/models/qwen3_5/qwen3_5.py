"""Qwen3.5-VL: qwen3_vl vision tower + qwen3_next hybrid decoder + M-RoPE.

Role parity: reference mlx_vlm/models/qwen3_5/qwen3_5.py — sanitize_key:15,
norm-shift rules:36-48, masked-scatter merge:121, Model glue:49 (vision
tower deepstack-disabled, language = hybrid GDN/attention decoder,
language.py:1836).

TPU design: the decoder reuses the qwen3_next super-block scan (3 linear +
1 full-attention layer per interval compiled once) with the M-RoPE sections
applied over the partial rotary slice; positions stay [3, B, S] end to end.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..qwen2_vl.language import mrope_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from ..qwen3_next.language import LanguageModel as _HybridLM
from ..qwen3_vl.vision import VisionModel
from .config import ModelConfig, TextConfig, VisionConfig  # noqa: F401

STACK_PATTERNS = (
    "language_model.model.linear_layers",
    "language_model.model.attn_layers",
    ("language_model.model.linear_layers.mlp.experts", 1),
    ("language_model.model.attn_layers.mlp.experts", 1),
    "vision_tower.blocks",
)

_NORM_SFX = (
    ".input_layernorm.weight", ".post_attention_layernorm.weight",
    "model.norm.weight", ".q_norm.weight", ".k_norm.weight",
)


def _sanitize_key(key: str) -> str:
    """Reference sanitize_key:15."""
    if key.startswith("model.language_model.visual"):
        return key.replace("model.language_model.visual", "vision_tower", 1)
    if key.startswith("model.language_model"):
        return key.replace("model.language_model", "language_model.model", 1)
    if key.startswith("model.visual"):
        return key.replace("model.visual", "vision_tower", 1)
    if key.startswith("visual."):
        return "vision_tower." + key[len("visual."):]
    if key.startswith("lm_head"):
        return key.replace("lm_head", "language_model.lm_head", 1)
    if key.startswith("model."):
        return "language_model." + key
    return key


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = VisionModel(config.vision_config)
        self.language_model = _HybridLM(config.text_config, config)
        self.interval = config.text_config.full_attention_interval

    def vision_features(self, params, pixel_values, rotary_freqs,
                        segment_ids, pos_idx, pos_weights):
        feats, _ = self.vision_tower(
            params["vision_tower"], pixel_values, rotary_freqs, segment_ids,
            pos_idx, pos_weights)
        return feats

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,
        rotary_freqs: Optional[jax.Array] = None,
        segment_ids: Optional[jax.Array] = None,
        pos_idx: Optional[jax.Array] = None,
        pos_weights: Optional[jax.Array] = None,
        image_features: Optional[jax.Array] = None,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"],
                                           input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        feats = image_features if image_features is not None else (
            self.vision_features(params, pixel_values, rotary_freqs,
                                 segment_ids, pos_idx, pos_weights))
        return merge_input_ids_with_image_features(
            self.config.image_token_id, self.config.video_token_id,
            feats, embeds, input_ids)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache,
                                            position_ids)
        return self.language_model.logits(lm, hidden), cache

    # ----------------------------------------------------------------- host
    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return mrope_position_ids(
            np.asarray(input_ids), image_grid_thw, video_grid_thw,
            attention_mask,
            merge=self.config.vision_config.spatial_merge_size,
            image_token_id=self.config.image_token_id,
            video_token_id=self.config.video_token_id,
        )

    def vision_aux_inputs(self, grid_thw: np.ndarray) -> dict:
        return self.vision_tower.aux_inputs(grid_thw)

    # -------------------------------------------------------------- weights
    def sanitize(self, weights: dict) -> dict:
        """Key remap + conv layout + zero-centered-norm shift + hybrid
        layer-role split (reference sanitize:144 + qwen3_next split)."""
        shift_all = any("mtp." in k for k in weights) or any(
            "conv1d.weight" in k and getattr(v, "ndim", 0) == 3
            and v.shape[-1] != 1
            for k, v in weights.items())
        layer_re = re.compile(r"^language_model\.model\.layers\.(\d+)\.(.+)$")
        out = {}
        for k, v in weights.items():
            if "mtp." in k:
                continue
            orig = k
            k = _sanitize_key(k)
            if "conv1d.weight" in k and getattr(v, "ndim", 0) == 3:
                v = v.reshape(v.shape[0], -1) if v.shape[1] == 1 else v[..., 0]
            if any(k.endswith(s) for s in _NORM_SFX) and getattr(
                    v, "ndim", 0) == 1:
                if shift_all or not orig.startswith("language_model."):
                    v = np.asarray(v) + 1.0
            m = layer_re.match(k)
            if m:
                i, rest = int(m.group(1)), m.group(2)
                rest = rest.replace("switch_mlp.", "experts.")
                if (i + 1) % self.interval == 0:
                    k = (f"language_model.model.attn_layers."
                         f"{i // self.interval}.{rest}")
                else:
                    j = i - (i // self.interval)
                    k = f"language_model.model.linear_layers.{j}.{rest}"
            if (self.config.text_config.tie_word_embeddings
                    and k == "language_model.lm_head.weight"):
                continue
            out[k] = v
        vt = {k: v for k, v in out.items() if k.startswith("vision_tower.")}
        if vt:
            vt = VisionModel.sanitize(vt)
            out = {k: v for k, v in out.items()
                   if not k.startswith("vision_tower.")}
            out.update(vt)
        return out

    @property
    def stack_patterns(self):
        return STACK_PATTERNS

    @property
    def decoder_layers(self) -> int:
        return self.config.text_config.num_hidden_layers
