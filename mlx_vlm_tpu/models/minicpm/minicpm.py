"""MiniCPM text model: llama decoder with depth/width scaling knobs.

Role parity: reference mlx_vlm/models/minicpm — residual scale
scale_depth/sqrt(L):language.py:109-113, embed * scale_emb:language.py:128,
logits / (hidden_size / dim_model_base):language.py:154-163.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax

from ..llama.config import TextConfig as _LlamaText
from ..llama.language import LanguageModel as _LlamaLM
from ..llama.llama import text_position_ids


@dataclass
class TextConfig(_LlamaText):
    model_type: str = "minicpm"
    dim_model_base: int = 256
    scale_depth: float = 1.4
    scale_emb: float = 12.0
    rope_theta: float = 1000000.0


ModelConfig = TextConfig


class LanguageModel(_LlamaLM):
    def __init__(self, args: TextConfig, config=None):
        super().__init__(args, config)
        self.residual_scale = (
            args.scale_depth / args.num_hidden_layers**0.5
        )
        self.logit_div = args.hidden_size / args.dim_model_base

    def embed(self, params, input_ids):
        return super().embed(params, input_ids) * self.args.scale_emb

    def logits(self, params, hidden):
        return super().logits(params, hidden / self.logit_div)


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
