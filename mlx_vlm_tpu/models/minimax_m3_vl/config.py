"""MiniMax M3 VL configuration.

Role parity: reference mlx_vlm/models/minimax_m3_vl/config.py.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

from ...core.config import BaseModelConfig


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "minimax_m3_vl"
    hidden_size: int = 1152
    num_attention_heads: int = 16
    num_hidden_layers: int = 27
    intermediate_size: int = 4304
    patch_size: int = 14
    temporal_patch_size: int = 1
    num_channels: int = 3
    spatial_merge_size: int = 2
    rope_theta: float = 10000.0
    layer_norm_eps: float = 1e-6
    hidden_act: str = "quick_gelu"
    vision_segment_max_frames: Optional[int] = None


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "minimax_m3"
    hidden_size: int = 6144
    intermediate_size: int = 3072
    dense_intermediate_size: int = 12288
    shared_intermediate_size: int = 3072
    num_attention_heads: int = 64
    num_key_value_heads: int = 4
    head_dim: Optional[int] = 128
    num_hidden_layers: int = 60
    rms_norm_eps: float = 1e-6
    rope_theta: float = 5000000.0
    rotary_dim: Optional[int] = None
    partial_rotary_factor: float = 0.5
    rope_scaling: Optional[Dict[str, Any]] = None
    max_position_embeddings: int = 1048576
    vocab_size: int = 200064
    tie_word_embeddings: bool = False
    # MoE
    num_local_experts: int = 128
    num_experts_per_tok: int = 4
    n_shared_experts: int = 1
    scoring_func: str = "sigmoid"
    use_routing_bias: bool = True
    routed_scaling_factor: float = 2.0
    moe_layer_freq: List[int] = field(default_factory=list)
    mlp_layer_types: Optional[List[str]] = None
    # activation
    swiglu_alpha: float = 1.702
    swiglu_beta: float = 1.0
    swiglu_limit: float = 7.0
    use_qk_norm: bool = True
    use_gemma_norm: bool = True
    # sparse attention (lightning-indexer block selection)
    layer_types: Optional[List[str]] = None
    sparse_attention_config: Optional[Dict[str, Any]] = None
    index_n_heads: Optional[int] = None
    index_head_dim: Optional[int] = None
    index_block_size: Optional[int] = None
    index_topk_blocks: Optional[int] = None
    index_local_blocks: Optional[int] = None

    def __post_init__(self):
        if self.num_key_value_heads is None:
            self.num_key_value_heads = self.num_attention_heads
        if self.head_dim is None:
            self.head_dim = self.hidden_size // self.num_attention_heads
        if self.rotary_dim is None:
            self.rotary_dim = int(self.head_dim * self.partial_rotary_factor)
        if isinstance(self.rope_scaling, dict) and "type" not in self.rope_scaling:
            self.rope_scaling = dict(self.rope_scaling)
            if "rope_type" in self.rope_scaling:
                self.rope_scaling["type"] = self.rope_scaling["rope_type"]
        if not self.moe_layer_freq:
            if self.mlp_layer_types is not None:
                self.moe_layer_freq = [
                    1 if t == "sparse" else 0 for t in self.mlp_layer_types
                ]
            else:
                self.moe_layer_freq = self._default_layer_frequency()
        sc = dict(self.sparse_attention_config or {})
        freq = self._sparse_frequency_from_layer_types()
        if freq is None:
            freq = sc.get("sparse_attention_freq") or sc.get(
                "sparse_disable_index_value"
            )
        if freq is None:
            freq = self._default_layer_frequency()
        sc["sparse_attention_freq"] = list(freq)
        sc.setdefault("use_sparse_attention", True)
        for key, val in (
            ("sparse_index_dim", self.index_head_dim),
            ("sparse_num_index_heads", self.index_n_heads),
            ("sparse_topk_blocks", self.index_topk_blocks),
            ("sparse_block_size", self.index_block_size),
            ("sparse_local_block", self.index_local_blocks),
        ):
            if val is not None and key not in sc:
                sc[key] = val
        sc.setdefault("sparse_index_dim", 128)
        sc.setdefault("sparse_num_index_heads", 4)
        sc.setdefault("sparse_topk_blocks", 16)
        sc.setdefault("sparse_block_size", 128)
        sc.setdefault("sparse_init_block", 0)
        sc.setdefault("sparse_local_block", 1)
        sc.setdefault("sparse_score_type", "max")
        self.sparse_attention_config = sc

    def _default_layer_frequency(self) -> List[int]:
        dense = min(3, self.num_hidden_layers)
        return [0] * dense + [1] * (self.num_hidden_layers - dense)

    def _sparse_frequency_from_layer_types(self) -> Optional[List[int]]:
        if self.layer_types is None:
            return None
        return [
            1 if t == "minimax_m3_sparse" else 0 for t in self.layer_types
        ]

    def is_moe_layer(self, i: int) -> bool:
        return bool(self.moe_layer_freq[i])

    def has_sparse_index(self, i: int) -> bool:
        if not self.sparse_attention_config.get("use_sparse_attention", True):
            return False
        return bool(self.sparse_attention_config["sparse_attention_freq"][i])


@dataclass
class ModelConfig(BaseModelConfig):
    model_type: str = "minimax_m3_vl"
    text_config: TextConfig = None
    vision_config: VisionConfig = None
    image_token_id: Optional[int] = None
    image_token_index: Optional[int] = None
    video_token_id: Optional[int] = None
    video_token_index: Optional[int] = None
    vision_feature_layer: Union[int, List[int]] = -1
    vision_feature_select_strategy: str = "full"
    projector_hidden_size: int = 4096
    projector_hidden_act: str = "gelu"
    multimodal_projector_bias: bool = True
    patch_merge_bias: bool = True
    eos_token_id: Optional[List[int]] = None

    def __post_init__(self):
        if self.image_token_id is None:
            self.image_token_id = self.image_token_index
        if self.video_token_id is None:
            self.video_token_id = self.video_token_index

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {}
        )
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or params
        )
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})
