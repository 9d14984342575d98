"""MiniCPM3 text model.

Role parity: reference mlx_vlm/models/minicpm3/language.py — MLA
attention exactly as deepseek_v2 (q_a/q_b low-rank query,
kv_a_proj_with_mqa latents + shared rope head, kv_b up-projection,
softmax scale (qk_nope+qk_rope)^-0.5) with longrope (SuScaledRoPE)
position scaling, plus the MiniCPM width/depth scalings: residuals
* scale_depth/sqrt(L) (:146), token embeds * scale_emb, and logits
divided by hidden_size/dim_model_base when the head is untied (:203).

TPU design: subclasses the deepseek_v2 absorbed-MLA decoder (latent
[B,C,r] cache — 1/14th the KV bytes of materialized heads) and sets its
residual-scale hook; only the scalings and config mapping are new.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass

from ..deepseek_v2.deepseek_v2 import LanguageModel as _DSV2LM
from ..deepseek_v2.deepseek_v2 import Model as _DSV2Model
from ..deepseek_v2.deepseek_v2 import ModelConfig as _DSV2Config


@dataclass
class TextConfig(_DSV2Config):
    model_type: str = "minicpm3"
    dim_model_base: int = 256
    scale_depth: float = 1.4
    scale_emb: float = 12.0

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        # MiniCPM3 has no routed experts and derives v_head_dim from the
        # head count (reference Attention:30)
        params.setdefault(
            "v_head_dim",
            params["hidden_size"] // params["num_attention_heads"])
        params.setdefault("qk_nope_head_dim", 64)
        params.setdefault("qk_rope_head_dim", 32)
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


ModelConfig = TextConfig


class LanguageModel(_DSV2LM):
    def __init__(self, args: TextConfig, config=None):
        super().__init__(args, config)
        self.residual_scale = args.scale_depth / args.num_hidden_layers**0.5
        self.logit_div = args.hidden_size / args.dim_model_base

    def embed(self, params, input_ids):
        return super().embed(params, input_ids) * self.args.scale_emb

    def logits(self, params, hidden):
        if self.args.tie_word_embeddings:
            return super().logits(params, hidden)
        return super().logits(params, hidden / self.logit_div)


class Model(_DSV2Model):
    CONFIG_CLS = TextConfig

    def __init__(self, config: TextConfig):
        self.config = config
        self.language_model = LanguageModel(config)


__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel"]
