"""dots.llm1 (rednote) — qk-normed attention + deepseek-v3-style noaux
MoE with first-k-dense layers.

Role parity: reference mlx_vlm/models/dots1/language.py — Dots1Attention
with per-head q/k RMSNorm (:18), sigmoid group_expert_select with
e_score_correction_bias (:78), shared experts (:148).  Field-for-field
this is the glm4_moe decoder with FULL rotary and no attention bias, so
it rides that module's role-split scans.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..glm4_moe.config import TextConfig as _GlmText
from ..glm4_moe.glm4_moe import Model as _GlmModel
from ..glm4_moe.language import LanguageModel


@dataclass
class TextConfig(_GlmText):
    model_type: str = "dots1"
    partial_rotary_factor: float = 1.0
    use_qk_norm: bool = True
    attention_bias: bool = False
    vocab_size: int = 152064
    hidden_size: int = 4608
    num_hidden_layers: int = 62
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    n_routed_experts: int = 128
    num_experts_per_tok: int = 6
    first_k_dense_replace: int = 1


ModelConfig = TextConfig


class Model(_GlmModel):
    def __init__(self, config: TextConfig):
        self.config = config
        self.language_model = LanguageModel(config)
        self._k_dense = config.first_k_dense_replace
