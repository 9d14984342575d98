"""Qwen3-Next config — reference mlx_vlm/models/qwen3_next/config.py."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Union

from ...core.config import BaseModelConfig


@dataclass
class ModelConfig(BaseModelConfig):
    model_type: str = "qwen3_next"
    hidden_size: int = 2048
    num_hidden_layers: int = 48
    intermediate_size: int = 5120
    num_attention_heads: int = 16
    num_key_value_heads: int = 2
    head_dim: int = 256
    linear_num_value_heads: int = 32
    linear_num_key_heads: int = 16
    linear_key_head_dim: int = 128
    linear_value_head_dim: int = 128
    linear_conv_kernel_dim: int = 4
    num_experts: int = 512
    num_experts_per_tok: int = 10
    decoder_sparse_step: int = 1
    shared_expert_intermediate_size: int = 512
    mlp_only_layers: List[int] = field(default_factory=list)
    moe_intermediate_size: int = 512
    rms_norm_eps: float = 1e-6
    vocab_size: int = 151936
    rope_theta: float = 10000000.0
    partial_rotary_factor: float = 0.25
    max_position_embeddings: int = 262144
    norm_topk_prob: bool = True
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    rope_scaling: Optional[Dict[str, Union[float, str]]] = None
    full_attention_interval: int = 4

    def __post_init__(self):
        if self.num_hidden_layers % self.full_attention_interval != 0:
            raise ValueError(
                "num_hidden_layers must be a multiple of full_attention_interval"
            )
        if self.mlp_only_layers or self.decoder_sparse_step != 1:
            raise ValueError("qwen3_next requires homogeneous (all-MoE) layers")


TextConfig = ModelConfig
