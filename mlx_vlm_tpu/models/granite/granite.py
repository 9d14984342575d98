"""Granite text model: llama decoder with IBM's mup-style multipliers.

Role parity: reference mlx_vlm/models/granite/language.py —
attention_multiplier as attention scale:26, residual_multiplier:91,
embedding_multiplier:115, logits / logits_scaling:~125.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..llama.config import TextConfig as _LlamaText
from ..llama.language import LanguageModel as _LlamaLM
from ..llama.llama import text_position_ids


@dataclass
class TextConfig(_LlamaText):
    model_type: str = "granite"
    embedding_multiplier: float = 1.0
    residual_multiplier: float = 1.0
    logits_scaling: float = 1.0
    attention_multiplier: float = 1.0
    tie_word_embeddings: bool = True


ModelConfig = TextConfig


class LanguageModel(_LlamaLM):
    def __init__(self, args: TextConfig, config=None):
        super().__init__(args, config)
        self.residual_scale = args.residual_multiplier
        if args.attention_multiplier != 1.0:
            self.scale = args.attention_multiplier

    def embed(self, params, input_ids):
        return super().embed(params, input_ids) * self.args.embedding_multiplier

    def logits(self, params, hidden):
        return super().logits(params, hidden) / self.args.logits_scaling


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
