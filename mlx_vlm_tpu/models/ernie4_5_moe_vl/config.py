"""ERNIE 4.5 VL MoE configuration.

Role parity: reference mlx_vlm/models/ernie4_5_moe_vl/config.py.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Union

from ...core.config import BaseModelConfig


@dataclass
class VisionConfig(BaseModelConfig):
    """DFNRopeVisionTransformer (Qwen2-VL-style ViT, single segment/image)."""

    model_type: str = "DFNRope_vision_transformer"
    depth: int = 32
    embed_dim: int = 1280
    hidden_size: int = 3584
    hidden_act: str = "quick_gelu"
    mlp_ratio: float = 4.0
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    spatial_merge_size: int = 2
    layer_norm_eps: float = 1e-6

    def __post_init__(self):
        # hidden_size tracks embed_dim for this architecture (reference
        # config.py:25-27)
        if self.hidden_size != self.embed_dim:
            self.hidden_size = self.embed_dim


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "ernie"
    hidden_size: int = 3584
    intermediate_size: int = 18944
    max_position_embeddings: int = 131072
    num_attention_heads: int = 28
    num_key_value_heads: int = 4
    num_hidden_layers: int = 56
    rms_norm_eps: float = 1e-6
    vocab_size: int = 151936
    rope_theta: float = 1000000.0
    use_bias: bool = False
    tie_word_embeddings: bool = False
    # MoE
    moe_num_experts: Union[int, List[int]] = 128
    moe_layer_start_index: Union[int, List[int]] = 3
    moe_layer_end_index: Optional[Union[int, List[int]]] = 53
    moe_intermediate_size: Union[int, List[int]] = 1408
    moe_k: int = 2
    moe_layer_interval: int = 1
    moe_num_shared_experts: int = 0
    moe_norm_min: float = 1e-12
    head_dim: Optional[int] = None
    # 3-D RoPE
    rope_3d: bool = True
    freq_allocation: int = 20
    mrope_section: List[int] = field(default_factory=lambda: [22, 22, 20])
    rope_scaling: Optional[Dict] = None
    rope_parameters: Optional[Dict] = None

    def __post_init__(self):
        if self.num_key_value_heads is None:
            self.num_key_value_heads = self.num_attention_heads
        if self.head_dim is None:
            self.head_dim = self.hidden_size // self.num_attention_heads
        for src in (self.rope_scaling, self.rope_parameters):
            if src and "mrope_section" in src:
                self.mrope_section = list(src["mrope_section"])

    # -------- normalized MoE views --------
    @property
    def num_text_experts(self) -> int:
        e = self.moe_num_experts
        return e[0] if isinstance(e, (list, tuple)) else e

    @property
    def num_mm_experts(self) -> int:
        e = self.moe_num_experts
        return e[1] if isinstance(e, (list, tuple)) and len(e) == 2 else 0

    @property
    def text_moe_intermediate_size(self) -> int:
        s = self.moe_intermediate_size
        return s[0] if isinstance(s, (list, tuple)) else s

    @property
    def mm_moe_intermediate_size(self) -> int:
        s = self.moe_intermediate_size
        if isinstance(s, (list, tuple)) and len(s) == 2:
            return s[1]
        return self.text_moe_intermediate_size

    def moe_layer_flags(self) -> List[bool]:
        start = self.moe_layer_start_index
        if isinstance(start, (list, tuple)):
            start = min(start)
        end = self.moe_layer_end_index
        if end is None:
            end = self.num_hidden_layers - 1
        elif isinstance(end, (list, tuple)):
            end = max(end)
        return [
            ((i + 1) % self.moe_layer_interval == 0) and start <= i <= end
            for i in range(self.num_hidden_layers)
        ]


@dataclass
class ModelConfig(BaseModelConfig):
    model_type: str = "ernie4_5_moe_vl"
    text_config: TextConfig = None
    vision_config: VisionConfig = None
    ignore_index: int = -100
    im_patch_id: int = 100295
    image_token_id: int = 100295
    image_start_token_id: int = 101304
    image_end_token_id: int = 101305
    video_token_id: int = 100295
    video_start_token_id: int = 101306
    video_end_token_id: int = 101307
    vision_start_token_id: int = 101304
    vision_end_token_id: int = 101305
    vocab_size: int = 103424
    eos_token_id: Optional[List[int]] = None
    pixel_hidden_size: int = 1280
    hidden_size: int = 2560
    spatial_conv_size: int = 2
    temporal_conv_size: int = 2
    use_temporal_conv: bool = True
    rope_3d: bool = True
    freq_allocation: int = 20

    def __post_init__(self):
        if self.image_token_id != self.im_patch_id:
            self.image_token_id = self.im_patch_id
        if self.vision_start_token_id != self.image_start_token_id:
            self.vision_start_token_id = self.image_start_token_id

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {}
        )
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or params  # flat-config fallback
        )
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})
