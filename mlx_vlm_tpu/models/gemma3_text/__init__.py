"""Gemma 3 text-only checkpoints (reference mlx_vlm/models/gemma3_text)."""

from dataclasses import dataclass

from ..gemma3.config import TextConfig as _G3Text
from ..gemma3.language import LanguageModel
from ..llama.llama import text_position_ids


@dataclass
class ModelConfig(_G3Text):
    model_type: str = "gemma3_text"


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
