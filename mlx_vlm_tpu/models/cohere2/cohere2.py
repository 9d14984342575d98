"""Cohere / Cohere2 text models (Command-R family).

Role parity: reference mlx_vlm/models/cohere & cohere2 — the aya_vision
decoder (parallel residual, NoPE globals for cohere2, logit_scale) covers
both; cohere (v1) is the same block with rope on every layer, expressed as
sliding_window_pattern == 1... 0 globals?  v1 ropes every layer and uses
full attention: pattern large + window == max acts equivalently.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..aya_vision.aya_vision import LanguageModel
from ..aya_vision.aya_vision import TextConfig as _CohereText
from ..llama.llama import text_position_ids


@dataclass
class TextConfig(_CohereText):
    model_type: str = "cohere2"

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        if params.get("model_type") == "cohere":
            # v1: rope + full attention everywhere = all-"sliding" layers
            # with a window covering the whole context
            params.setdefault("sliding_window_pattern", 10**6)
            params.setdefault(
                "sliding_window", params.get("max_position_embeddings", 8192)
            )
        import inspect

        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


ModelConfig = TextConfig


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
