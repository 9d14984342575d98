"""Qwen MoE text config (Qwen1.5/2-MoE checkpoints).

Role parity: reference mlx_vlm/models/qwen2_moe (MoE decoder family; also
covers the MoE-decoder plumbing used by ernie4_5_moe_vl / qwen3_vl_moe)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from ..llama.config import TextConfig as _LlamaText


@dataclass
class TextConfig(_LlamaText):
    model_type: str = "qwen2_moe"
    num_experts: int = 60
    num_experts_per_tok: int = 4
    moe_intermediate_size: int = 1408
    shared_expert_intermediate_size: int = 5632
    norm_topk_prob: bool = False
    decoder_sparse_step: int = 1
    attention_bias: bool = True


ModelConfig = TextConfig
