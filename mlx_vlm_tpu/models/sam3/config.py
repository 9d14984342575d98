"""SAM3 configuration.

Role parity: reference mlx_vlm/models/sam3/config.py — HF Sam3 schema:
detector (ViT backbone + FPN + CLIP text + DETR enc/dec + geometry +
mask decoder) and tracker (SAM2-style memory attention/encoder + prompt
encoder + mask decoder).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from ...core.config import BaseModelConfig


@dataclass
class ViTConfig(BaseModelConfig):
    model_type: str = "sam3_vit_model"
    hidden_size: int = 1024
    num_hidden_layers: int = 32
    num_attention_heads: int = 16
    intermediate_size: int = 4736
    hidden_act: str = "gelu"
    image_size: int = 1008
    patch_size: int = 14
    num_channels: int = 3
    window_size: int = 24
    global_attn_indexes: List[int] = field(
        default_factory=lambda: [7, 15, 23, 31])
    qkv_bias: bool = True
    rope_theta: float = 10000.0
    pretrain_image_size: int = 336
    layer_norm_eps: float = 1e-6


@dataclass
class VisionEncoderConfig(BaseModelConfig):
    model_type: str = "sam3_vision_model"
    backbone_config: Optional[dict] = None
    fpn_hidden_size: int = 256
    fpn_kernel_size: int = 2
    fpn_stride: int = 2
    scale_factors: List[float] = field(
        default_factory=lambda: [4.0, 2.0, 1.0, 0.5])
    num_feature_levels: int = 3
    layer_norm_eps: float = 1e-6

    def __post_init__(self):
        if isinstance(self.backbone_config, dict):
            self.backbone_config = ViTConfig.from_dict(self.backbone_config)
        elif self.backbone_config is None:
            self.backbone_config = ViTConfig()


@dataclass
class TextEncoderConfig(BaseModelConfig):
    model_type: str = "clip_text_model"
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    vocab_size: int = 49408
    max_position_embeddings: int = 32
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407


@dataclass
class DETREncoderConfig(BaseModelConfig):
    model_type: str = "sam3_detr_encoder"
    hidden_size: int = 256
    num_layers: int = 6
    num_attention_heads: int = 8
    intermediate_size: int = 2048
    hidden_act: str = "relu"
    layer_norm_eps: float = 1e-6


@dataclass
class DETRDecoderConfig(BaseModelConfig):
    model_type: str = "sam3_detr_decoder"
    hidden_size: int = 256
    num_layers: int = 6
    num_attention_heads: int = 8
    num_queries: int = 200
    intermediate_size: int = 2048
    hidden_act: str = "relu"
    layer_norm_eps: float = 1e-6
    box_rpb_mode: str = "log"
    use_presence_token: bool = True


@dataclass
class GeometryEncoderConfig(BaseModelConfig):
    model_type: str = "sam3_geometry_encoder"
    hidden_size: int = 256
    num_layers: int = 3
    num_attention_heads: int = 8
    intermediate_size: int = 2048
    hidden_act: str = "relu"
    roi_size: int = 7
    layer_norm_eps: float = 1e-6


@dataclass
class DetectorMaskDecoderConfig(BaseModelConfig):
    model_type: str = "sam3_mask_decoder"
    hidden_size: int = 256
    num_attention_heads: int = 8
    num_upsampling_stages: int = 3
    layer_norm_eps: float = 1e-6


@dataclass
class DetectorConfig(BaseModelConfig):
    model_type: str = "sam3"
    vision_config: Optional[dict] = None
    text_config: Optional[dict] = None
    detr_encoder_config: Optional[dict] = None
    detr_decoder_config: Optional[dict] = None
    geometry_encoder_config: Optional[dict] = None
    mask_decoder_config: Optional[dict] = None

    def __post_init__(self):
        for name, cls in (
            ("vision_config", VisionEncoderConfig),
            ("text_config", TextEncoderConfig),
            ("detr_encoder_config", DETREncoderConfig),
            ("detr_decoder_config", DETRDecoderConfig),
            ("geometry_encoder_config", GeometryEncoderConfig),
            ("mask_decoder_config", DetectorMaskDecoderConfig),
        ):
            v = getattr(self, name)
            if isinstance(v, dict):
                setattr(self, name, cls.from_dict(v))
            elif v is None:
                setattr(self, name, cls())


@dataclass
class TrackerMaskDecoderConfig(BaseModelConfig):
    hidden_size: int = 256
    num_hidden_layers: int = 2
    num_attention_heads: int = 8
    attention_downsample_rate: int = 2
    num_multimask_outputs: int = 3
    mlp_dim: int = 2048


@dataclass
class PromptEncoderConfig(BaseModelConfig):
    hidden_size: int = 256
    image_size: int = 1008
    patch_size: int = 14
    mask_input_channels: int = 16
    num_point_embeddings: int = 4


@dataclass
class TrackerConfig(BaseModelConfig):
    model_type: str = "sam3_tracker_video"
    image_size: int = 1008
    vision_config: Optional[dict] = None
    mask_decoder_config: Optional[dict] = None
    prompt_encoder_config: Optional[dict] = None

    memory_attention_hidden_size: int = 256
    memory_attention_num_layers: int = 4
    memory_attention_num_attention_heads: int = 1
    memory_attention_feed_forward_hidden_size: int = 2048
    memory_attention_rope_theta: float = 10000.0
    memory_attention_rope_feat_sizes: List[int] = field(
        default_factory=lambda: [72, 72])
    memory_attention_downsample_rate: int = 1

    memory_encoder_hidden_size: int = 256
    memory_encoder_output_channels: int = 64

    mask_downsampler_kernel_size: int = 3
    mask_downsampler_stride: int = 2
    mask_downsampler_padding: int = 1

    memory_fuser_embed_dim: int = 256
    memory_fuser_kernel_size: int = 7
    memory_fuser_padding: int = 3
    memory_fuser_num_layers: int = 2
    memory_fuser_intermediate_dim: int = 1024

    num_maskmem: int = 7
    sigmoid_bias_for_mem_enc: float = -10.0
    sigmoid_scale_for_mem_enc: float = 20.0
    enable_occlusion_spatial_embedding: bool = True

    def __post_init__(self):
        if isinstance(self.vision_config, dict):
            self.vision_config = VisionEncoderConfig.from_dict(
                self.vision_config)
        elif self.vision_config is None:
            self.vision_config = VisionEncoderConfig()
        if isinstance(self.mask_decoder_config, dict):
            self.mask_decoder_config = TrackerMaskDecoderConfig.from_dict(
                self.mask_decoder_config)
        elif self.mask_decoder_config is None:
            self.mask_decoder_config = TrackerMaskDecoderConfig()
        if isinstance(self.prompt_encoder_config, dict):
            self.prompt_encoder_config = PromptEncoderConfig.from_dict(
                self.prompt_encoder_config)
        elif self.prompt_encoder_config is None:
            self.prompt_encoder_config = PromptEncoderConfig()


@dataclass
class ModelConfig(BaseModelConfig):
    model_type: str = "sam3_video"
    detector_config: Optional[dict] = None
    tracker_config: Optional[dict] = None
    low_res_mask_size: int = 288
    score_threshold_detection: float = 0.5
    det_nms_thresh: float = 0.1
    text_config: Optional[dict] = None
    vision_config: Optional[dict] = None

    def __post_init__(self):
        if isinstance(self.detector_config, dict):
            self.detector_config = DetectorConfig.from_dict(
                self.detector_config)
        elif self.detector_config is None:
            self.detector_config = DetectorConfig()
        if isinstance(self.tracker_config, dict):
            self.tracker_config = TrackerConfig.from_dict(self.tracker_config)
        elif self.tracker_config is None:
            self.tracker_config = TrackerConfig()
        if self.text_config is None:
            self.text_config = self.detector_config.text_config
        if self.vision_config is None:
            self.vision_config = self.detector_config.vision_config
