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


from ..qwen2_moe.config import TextConfig as _Qwen2MoEText


@dataclass
class TalkerTextConfig(_Qwen2MoEText):
    """Talker MoE decoder (Qwen3-MoE block + shared expert; vocab is the
    codec vocabulary)."""

    model_type: str = "qwen3_omni_moe_talker_text"
    attention_bias: bool = False
    norm_topk_prob: bool = True


from ..llama.config import TextConfig as _LlamaText


@dataclass
class CodePredictorConfig(_LlamaText):
    model_type: str = "qwen3_omni_moe_talker_code_predictor"
    num_hidden_layers: int = 5
    hidden_size: int = 1024
    intermediate_size: int = 3072
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000
    max_position_embeddings: int = 32768
    vocab_size: int = 2048
    num_code_groups: int = 16


@dataclass
class TalkerConfig(BaseModelConfig):
    text_config: Optional[dict] = None
    code_predictor_config: Optional[dict] = None
    model_type: str = "qwen3_omni_moe_talker"
    accept_hidden_layer: int = 24
    num_code_groups: int = 16
    thinker_hidden_size: int = 2048
    codec_bos_id: int = 2149
    codec_eos_token_id: int = 2150
    codec_nothink_id: int = 2155
    codec_pad_id: int = 2148
    codec_think_bos_id: int = 2156
    codec_think_eos_id: int = 2157
    speaker_id: Optional[dict] = None

    def __post_init__(self):
        if isinstance(self.text_config, dict):
            self.text_config = TalkerTextConfig.from_dict(self.text_config)
        elif self.text_config is None:
            self.text_config = TalkerTextConfig.from_dict({})
        if isinstance(self.code_predictor_config, dict):
            self.code_predictor_config = CodePredictorConfig.from_dict(
                self.code_predictor_config)
        elif self.code_predictor_config is None:
            self.code_predictor_config = CodePredictorConfig()
        if self.speaker_id is None:
            self.speaker_id = {"chelsie": 2301, "ethan": 2302, "aiden": 2303}


@dataclass
class Code2WavConfig(BaseModelConfig):
    model_type: str = "qwen3_omni_moe_code2wav"
    hidden_size: int = 1024
    intermediate_size: int = 3072
    num_hidden_layers: int = 8
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    decoder_dim: int = 1536
    attention_bias: bool = False
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000
    sliding_window: Optional[int] = 72
    codebook_size: int = 2048
    num_quantizers: int = 16
    layer_scale_initial_scale: float = 0.01
    upsample_rates: List[int] = None
    upsampling_ratios: List[int] = None

    def __post_init__(self):
        if self.upsample_rates is None:
            self.upsample_rates = [8, 5, 4, 3]
        if self.upsampling_ratios is None:
            self.upsampling_ratios = [2, 2]


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
    enable_audio_output: bool = False
    talker_config: Optional[dict] = None
    code2wav_config: Optional[dict] = None
    im_start_token_id: int = 151644
    tts_bos_token_id: int = 151672
    tts_eos_token_id: int = 151673
    tts_pad_token_id: int = 151671
    assistant_token_id: int = 77091
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
        if params.get("talker_config") is not None:
            params["talker_config"] = TalkerConfig.from_dict(
                params["talker_config"])
        if params.get("code2wav_config") is not None:
            params["code2wav_config"] = Code2WavConfig.from_dict(
                params["code2wav_config"])
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})
