"""GLM-4.5/4.6 MoE text model (framework-uniform interface).

Role parity: reference mlx_vlm/models/glm4_moe/glm4_moe.py (Model,
sanitize prefixing :44).  Also serves solar_open via MODEL_REMAPPING
(reference solar_open reuses this architecture).
"""

from __future__ import annotations

import re

from ..llama.llama import text_position_ids
from .config import ModelConfig
from .language import LanguageModel

_LAYER_RE = re.compile(r"^language_model\.model\.layers\.(\d+)\.(.+)$")


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config)
        self._k_dense = config.first_k_dense_replace

    def get_input_embeddings(self, params, input_ids, pixel_values=None,
                             **aux):
        return self.language_model.embed(params["language_model"], input_ids)

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
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            if not k.startswith("language_model."):
                k = "language_model." + k
            m = _LAYER_RE.match(k)
            if m:
                i, rest = int(m.group(1)), m.group(2)
                if i < self._k_dense:
                    k = f"language_model.model.dense_layers.{i}.{rest}"
                else:
                    k = (f"language_model.model.moe_layers."
                         f"{i - self._k_dense}.{rest}")
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return (
            "language_model.model.dense_layers",
            "language_model.model.moe_layers",
            # per-layer expert stacks land on axis 1 -> [L, E, ...]
            ("language_model.model.moe_layers.mlp.experts", 1),
        )
