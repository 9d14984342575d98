"""EXAONE (v1/3.x) text model: llama decoder behind GPT-style key names.

Role parity: reference mlx_vlm/models/exaone/language.py — transformer.h
layers with ln_1/ln_2, attn.attention.{q,k,v,out}_proj, mlp c_fc_0/c_fc_1/
c_proj (SwiGLU), wte embeddings, ln_f.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..llama.config import TextConfig as _LlamaText
from ..llama.language import LanguageModel
from ..llama.llama import text_position_ids


@dataclass
class TextConfig(_LlamaText):
    model_type: str = "exaone"
    layer_norm_epsilon: float = 1e-5

    def __post_init__(self):
        # exaone configs name the eps layer_norm_epsilon
        if self.layer_norm_epsilon and self.rms_norm_eps == 1e-5:
            self.rms_norm_eps = self.layer_norm_epsilon


ModelConfig = TextConfig

_RENAMES = (
    ("transformer.h.", "model.layers."),
    (".ln_1.", ".input_layernorm."),
    (".ln_2.", ".post_attention_layernorm."),
    (".attn.attention.q_proj.", ".self_attn.q_proj."),
    (".attn.attention.k_proj.", ".self_attn.k_proj."),
    (".attn.attention.v_proj.", ".self_attn.v_proj."),
    (".attn.attention.out_proj.", ".self_attn.o_proj."),
    (".mlp.c_fc_0.", ".mlp.gate_proj."),
    (".mlp.c_fc_1.", ".mlp.up_proj."),
    (".mlp.c_proj.", ".mlp.down_proj."),
    ("transformer.wte.", "model.embed_tokens."),
    ("transformer.ln_f.", "model.norm."),
)


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
            if "rotary" in k:
                continue
            for old, new in _RENAMES:
                k = k.replace(old, new)
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return ("language_model.model.layers",)
