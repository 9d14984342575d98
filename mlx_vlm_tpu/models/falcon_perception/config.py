"""Falcon-Perception configs.

Role parity: reference mlx_vlm/models/falcon_perception/config.py
(VisionConfig:9, TextConfig:17, ModelConfig:37 with the dim/n_layers/
n_heads/ffn_dim/norm_eps/max_seq_len checkpoint aliases at :71-95).
"""

from __future__ import annotations

import dataclasses
import inspect
from typing import List, Optional


@dataclasses.dataclass
class VisionConfig:
    model_type: str = "falcon_perception"
    spatial_patch_size: int = 16
    temporal_patch_size: int = 1
    channel_size: int = 3

    @classmethod
    def from_dict(cls, d: dict) -> "VisionConfig":
        sig = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in d.items() if k in sig})


@dataclasses.dataclass
class TextConfig:
    model_type: str = "falcon_perception"
    hidden_size: int = 1024
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    head_dim: int = 128
    num_key_value_heads: int = 8
    vocab_size: int = 65536
    intermediate_size: int = 3072
    rms_norm_eps: float = 1e-5
    max_position_embeddings: int = 8192
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False

    def __post_init__(self):
        if self.num_key_value_heads is None:
            self.num_key_value_heads = self.num_attention_heads

    @classmethod
    def from_dict(cls, d: dict) -> "TextConfig":
        sig = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in d.items() if k in sig})


@dataclasses.dataclass
class ModelConfig:
    text_config: TextConfig = None
    vision_config: VisionConfig = None
    model_type: str = "falcon_perception"
    vocab_size: int = 65536

    img_id: int = 227
    eos_id: int = 11
    image_cls_token_id: int = 244
    image_reg_1_token_id: int = 245
    image_reg_2_token_id: int = 246
    image_reg_3_token_id: int = 247
    image_reg_4_token_id: int = 248
    img_end_id: int = 230

    coord_token_id: int = 240
    size_token_id: int = 241
    seg_token_id: int = 262

    coord_enc_dim: int = 512
    coord_dec_dim: int = 8192
    coord_out_dim: int = 2048
    size_enc_dim: int = 512
    size_dec_dim: int = 8192
    size_out_dim: int = 2048

    do_segmentation: bool = True
    segm_out_dim: int = 256
    num_segm_layers: int = 3

    eos_token_id: Optional[List[int]] = None

    @classmethod
    def from_dict(cls, params: dict) -> "ModelConfig":
        # the released checkpoints use llama-lab style keys (dim, n_layers,
        # n_heads, ffn_dim, norm_eps, max_seq_len); reference config.py:71
        text_params = {
            "model_type": params.get("model_type", "falcon_perception"),
            "hidden_size": params.get("dim", params.get("hidden_size", 1024)),
            "num_hidden_layers": params.get(
                "n_layers", params.get("num_hidden_layers", 28)),
            "num_attention_heads": params.get(
                "n_heads", params.get("num_attention_heads", 16)),
            "head_dim": params.get("head_dim", 128),
            "num_key_value_heads": params.get(
                "n_kv_heads", params.get("num_key_value_heads", 8)),
            "vocab_size": params.get("vocab_size", 65536),
            "intermediate_size": params.get(
                "ffn_dim", params.get("intermediate_size", 3072)),
            "rms_norm_eps": params.get(
                "norm_eps", params.get("rms_norm_eps", 1e-5)),
            "max_position_embeddings": params.get(
                "max_seq_len", params.get("max_position_embeddings", 8192)),
            "rope_theta": float(params.get("rope_theta", 10000)),
            "tie_word_embeddings": params.get("tie_word_embeddings", False),
        }
        vp = params.get("vision_config") or {}
        vision_params = {
            "model_type": "falcon_perception",
            "spatial_patch_size": params.get(
                "spatial_patch_size", vp.get("spatial_patch_size", 16)),
            "temporal_patch_size": params.get(
                "temporal_patch_size", vp.get("temporal_patch_size", 1)),
            "channel_size": params.get(
                "channel_size", vp.get("channel_size", 3)),
        }
        sig = inspect.signature(cls).parameters
        return cls(
            text_config=TextConfig.from_dict(text_params),
            vision_config=VisionConfig.from_dict(vision_params),
            **{k: v for k, v in params.items()
               if k in sig and k not in ("text_config", "vision_config")},
        )
