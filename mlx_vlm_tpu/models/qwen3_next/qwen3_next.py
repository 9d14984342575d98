"""Qwen3-Next top-level (text) model.

Role parity: reference mlx_vlm/models/qwen3_next/qwen3_next.py and the
LanguageModel.sanitize at language.py:410-441 (expert join, conv weight
layout, +1 on zero-centered norms for raw HF checkpoints).
"""

from __future__ import annotations

import re

import numpy as np

from ..llama.llama import text_position_ids
from .config import ModelConfig, TextConfig  # noqa: F401
from .language import LanguageModel


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config)
        self.interval = config.full_attention_interval

    def get_input_embeddings(self, params, input_ids, pixel_values=None, **aux):
        return self.language_model.embed(params["language_model"], input_ids)

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
        """Split the interleaved stack into linear/attention role arrays and
        normalize HF checkpoint quirks (reference language.py:410-441)."""
        cfg = self.config
        hf_style = any(
            re.match(r"(language_model\.)?model\.layers\.\d+\.mlp\.experts\.0\.",
                     k)
            for k in weights
        )
        norm_sfx = (
            ".input_layernorm.weight", ".post_attention_layernorm.weight",
            "model.norm.weight", ".q_norm.weight", ".k_norm.weight",
        )
        layer_re = re.compile(
            r"^(?:language_model\.)?model\.layers\.(\d+)\.(.+)$"
        )
        out = {}
        for k, v in weights.items():
            if ".mtp." in k or k.startswith("mtp."):
                continue
            if "conv1d.weight" in k and getattr(v, "ndim", 0) == 3:
                # HF [C,1,K] or mlx [C,K,1] -> [C,K]
                v = v.reshape(v.shape[0], -1) if v.shape[1] == 1 else v[..., 0]
            if hf_style and any(k.endswith(s) for s in norm_sfx) and v.ndim == 1:
                v = np.asarray(v) + 1.0  # zero-centered HF norms
            m = layer_re.match(k)
            if m:
                i, rest = int(m.group(1)), m.group(2)
                rest = rest.replace("switch_mlp.", "experts.")
                if (i + 1) % self.interval == 0:
                    k = f"model.attn_layers.{i // self.interval}.{rest}"
                else:
                    j = i - (i // self.interval)
                    k = f"model.linear_layers.{j}.{rest}"
            if cfg.tie_word_embeddings and k == "lm_head.weight":
                continue
            out["language_model." + k if not k.startswith("language_model.")
                else k] = v
        return out

    @property
    def stack_patterns(self):
        return (
            "language_model.model.linear_layers",
            "language_model.model.attn_layers",
            ("language_model.model.linear_layers.mlp.experts", 1),
            ("language_model.model.attn_layers.mlp.experts", 1),
        )
