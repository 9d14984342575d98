"""Zaya1-VL configs — reference mlx_vlm/models/zaya1_vl/config.py.

The text config lives at the checkpoint ROOT (reference ModelConfig.from_dict
copies all root params into text_config); the vision config is a qwen2_5_vl
vision tower with `in_chans`/`spatial_patch_size` aliases.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass
from typing import List, Optional, Union

from ...core.config import BaseModelConfig
from ..qwen2_5_vl.config import VisionConfig as _Qwen25VisionConfig


@dataclass
class VisionConfig(_Qwen25VisionConfig):
    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params or {})
        if "in_chans" in params and "in_channels" not in params:
            params["in_channels"] = params["in_chans"]
        if "spatial_patch_size" in params and "patch_size" not in params:
            params["patch_size"] = params["spatial_patch_size"]
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "zaya1_vl"
    vocab_size: int = 262272
    hidden_size: int = 2048
    ffn_hidden_size: int = 4096
    num_hidden_layers: int = 40
    num_experts: int = 16
    num_attention_heads: int = 8
    num_key_value_heads: int = 2
    num_query_groups: int = 2
    head_dim: int = 128
    attention_bias: bool = False
    lm_head_bias: bool = False
    add_bias_linear: bool = False
    gated_linear_unit: bool = True
    activation_func: str = "swiglu"
    max_position_embeddings: int = 32768
    norm_epsilon: float = 1e-5
    tie_word_embeddings: bool = True
    rope_theta: float = 1000000.0
    rotary_base: Optional[float] = None
    moe_router_topk: int = 1
    zaya_mlp_expansion: int = 256
    zaya_use_mod: bool = True
    zaya_use_eda: bool = True
    scale_residual_merge: bool = True
    rope_scaling: Optional[dict] = None
    rope_parameters: Optional[dict] = None
    partial_rotary_factor: float = 0.5
    rope_pct: Optional[float] = None
    cca_time0: int = 2
    cca_time1: int = 2
    vision_lora: bool = True
    vision_lora_rank_attn: Optional[int] = 8
    vision_lora_rank_mlp: Optional[int] = 32
    eos_token_id: Union[int, List[int], None] = 262143
    pad_token_id: Optional[int] = 0

    def __post_init__(self):
        if self.rotary_base is not None:
            self.rope_theta = self.rotary_base
        if self.rope_pct is not None:
            self.partial_rotary_factor = self.rope_pct
        if self.num_key_value_heads is None:
            self.num_key_value_heads = self.num_query_groups
        rp = dict(self.rope_parameters or self.rope_scaling or {})
        if "type" in rp and "rope_type" not in rp:
            rp["rope_type"] = rp.pop("type")
        rp.setdefault("rope_type", "default")
        rp.setdefault("rope_theta", self.rope_theta)
        rp.setdefault("partial_rotary_factor", self.partial_rotary_factor)
        self.rope_parameters = rp


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "zaya1_vl"
    image_token_id: int = 262147
    vision_start_token_id: Optional[int] = 255999
    vision_end_token_id: Optional[int] = 256000
    vocab_size: int = 262272
    eos_token_id: Union[int, List[int], None] = 262143
    pad_token_id: int = 0

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        # text params sit at the root (reference config.py:118-131)
        text = {k: v for k, v in params.items() if k != "vision_config"}
        params["text_config"] = TextConfig.from_dict(text)
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {})
        )
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})
