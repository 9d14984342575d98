"""Qwen3-Omni-MoE (thinker) configs — reference
mlx_vlm/models/qwen3_omni_moe/config.py."""

from __future__ import annotations

import inspect
from dataclasses import dataclass
from typing import List, Optional

from ...core.config import BaseModelConfig
from ..qwen3_vl.config import VisionConfig as _VLVision
from ..qwen3_vl_moe.qwen3_vl_moe import TextConfig as _MoEText


@dataclass
class AudioConfig(BaseModelConfig):
    model_type: str = "qwen3_omni_moe_audio_encoder"
    d_model: int = 1280
    encoder_layers: int = 32
    encoder_attention_heads: int = 20
    encoder_ffn_dim: int = 5120
    num_mel_bins: int = 128
    output_dim: int = 2048
    downsample_hidden_size: int = 480
    scale_embedding: bool = False
    n_window: int = 50
    n_window_infer: int = 800
    max_source_positions: int = 1500


@dataclass
class VisionConfig(_VLVision):
    model_type: str = "qwen3_omni_moe_vision_encoder"
    patch_size: int = 16
    num_position_embeddings: int = 2304


@dataclass
class TextConfig(_MoEText):
    model_type: str = "qwen3_omni_moe_text_encoder"


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    audio_config: AudioConfig
    model_type: str = "qwen3_omni_moe"
    image_token_id: int = 151655
    video_token_id: int = 151656
    audio_token_id: int = 151675
    vision_start_token_id: int = 151652
    audio_start_token_id: int = 151669
    enable_audio_output: bool = False  # talker/code2wav not yet implemented
    eos_token_id: Optional[List[int]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        thinker = dict(params.get("thinker_config", {}) or {})
        # token ids may live on the thinker or the top level
        for k in ("image_token_id", "video_token_id", "audio_token_id",
                  "vision_start_token_id", "audio_start_token_id"):
            if k in thinker and k not in params:
                params[k] = thinker[k]
        params["text_config"] = TextConfig.from_dict(
            thinker.get("text_config", params.get("text_config", {})) or {}
        )
        params["vision_config"] = VisionConfig.from_dict(
            thinker.get("vision_config", params.get("vision_config", {})) or {}
        )
        params["audio_config"] = AudioConfig.from_dict(
            thinker.get("audio_config", params.get("audio_config", {})) or {}
        )
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})
