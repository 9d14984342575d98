"""Nemotron-H top-level (text) model.

Role parity: reference mlx_vlm/models/nemotron_h/nemotron_h.py and
language.py sanitize (conv layout :483)."""

from __future__ import annotations

import re

from ..llama.llama import text_position_ids
from .config import ModelConfig, TextConfig  # noqa: F401
from .language import _TYPE_KEY, LanguageModel


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config)

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
        """Rename layers into per-type arrays; canonicalize conv weights."""
        pattern = self.config.hybrid_override_pattern
        # per-type ordinal for each global layer index
        ordinal = []
        counts = {"M": 0, "*": 0, "-": 0, "E": 0}
        for c in pattern:
            ordinal.append(counts[c])
            counts[c] += 1
        layer_re = re.compile(
            r"^(?:language_model\.|backbone\.)?model\.layers\.(\d+)\.(.+)$"
        )
        alt_re = re.compile(r"^backbone\.layers\.(\d+)\.(.+)$")
        out = {}
        for k, v in weights.items():
            k = k.replace("backbone.embeddings", "model.embeddings")
            k = k.replace("backbone.norm_f", "model.norm_f")
            m = layer_re.match(k) or alt_re.match(k)
            if "conv1d.weight" in k and getattr(v, "ndim", 0) == 3:
                v = v.reshape(v.shape[0], -1) if v.shape[1] == 1 else v[..., 0]
            if m:
                i, rest = int(m.group(1)), m.group(2)
                key = _TYPE_KEY[pattern[i]]
                k = f"model.{key}.{ordinal[i]}.{rest}"
            if not k.startswith(("model.", "lm_head", "language_model.")):
                pass
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return tuple(
            f"language_model.model.{v}" for v in _TYPE_KEY.values()
        ) + (
            ("language_model.model.moe_layers.mixer.experts", 1),
        )
