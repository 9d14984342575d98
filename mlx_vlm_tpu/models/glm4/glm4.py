"""GLM-4 text model: the glm4v decoder without the vision tower.

Role parity: reference mlx_vlm/models/glm4/language.py — same sandwich
norms (post_self_attn/post_mlp) + partial-rotary attention as glm4v; the
rope sections collapse to a single (t) stream for text.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Dict, Optional

from ..glm4v.glm4v import LanguageModel as _GlmLM
from ..glm4v.config import TextConfig as _GlmText
from ..llama.llama import text_position_ids


@dataclass
class TextConfig(_GlmText):
    model_type: str = "glm4"

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        if "rope_scaling" not in params or not params.get("rope_scaling"):
            # text-only: one section covering the whole rotary dim
            hd = params.get("head_dim") or (
                params.get("hidden_size", 4096)
                // params.get("num_attention_heads", 32)
            )
            rd = int(hd * params.get("partial_rotary_factor", 0.5))
            params["rope_scaling"] = {"rope_type": "default",
                                      "mrope_section": [rd // 2]}
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


ModelConfig = TextConfig


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = _GlmLM(config)

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

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return ("language_model.model.layers",)
