"""Qwen-MoE top-level (text) model with the framework's uniform interface."""

from __future__ import annotations

from ..llama.llama import text_position_ids
from .config import ModelConfig
from .language import MoELanguageModel

STACK_PATTERNS = (
    "language_model.model.layers",
    # per-layer expert stacks land on axis 1 -> [L, E, ...]
    ("language_model.model.layers.mlp.experts", 1),
)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = MoELanguageModel(config)

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
        return STACK_PATTERNS
