"""Nemotron-H config — reference mlx_vlm/models/nemotron_h/config.py."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from ...core.config import BaseModelConfig

_BLOCK_CHAR = {"mamba": "M", "attention": "*", "moe": "E", "mlp": "-"}


@dataclass
class ModelConfig(BaseModelConfig):
    model_type: str = "nemotron_h"
    vocab_size: int = 131072
    hidden_size: int = 4096
    intermediate_size: int = 21504
    num_hidden_layers: int = 52
    max_position_embeddings: int = 8192
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    attention_bias: bool = False
    mamba_num_heads: int = 128
    mamba_head_dim: int = 64
    mamba_proj_bias: bool = False
    ssm_state_size: int = 128
    conv_kernel: int = 4
    n_groups: int = 8
    mlp_bias: bool = False
    layer_norm_epsilon: float = 1e-5
    use_bias: bool = False
    use_conv_bias: bool = True
    hybrid_override_pattern: Optional[List[str]] = None
    layers_block_type: Optional[List[str]] = None
    head_dim: Optional[int] = None
    time_step_limit: Optional[Tuple[float, float]] = None
    tie_word_embeddings: bool = False
    # MoE ("E" blocks)
    moe_intermediate_size: Optional[int] = None
    moe_shared_expert_intermediate_size: Optional[int] = None
    moe_latent_size: Optional[int] = None
    n_group: Optional[int] = None
    n_routed_experts: Optional[int] = None
    n_shared_experts: Optional[int] = None
    topk_group: Optional[int] = None
    num_experts_per_tok: Optional[int] = None
    norm_topk_prob: Optional[bool] = None
    routed_scaling_factor: Optional[float] = None

    def __post_init__(self):
        if self.time_step_limit is None:
            self.time_step_limit = (0.0, float("inf"))
        if self.hybrid_override_pattern is None:
            if self.layers_block_type is not None:
                self.hybrid_override_pattern = [
                    _BLOCK_CHAR[t] for t in self.layers_block_type
                ]
            else:
                raise ValueError("nemotron_h needs a layer pattern")
        self.num_hidden_layers = len(self.hybrid_override_pattern)
        if self.head_dim is None:
            self.head_dim = self.hidden_size // self.num_attention_heads


TextConfig = ModelConfig
