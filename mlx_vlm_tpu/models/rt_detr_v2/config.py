"""RT-DETRv2 configuration.

Role parity: reference mlx_vlm/models/rt_detr_v2/config.py — the HF
`RTDetrV2Config` schema stored FLAT in config.json (backbone fields under
`backbone_config`, encoder/decoder fields at top level).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Union

from ...core.config import BaseModelConfig


@dataclass
class RTDetrResNetConfig(BaseModelConfig):
    """ResNet-vd backbone: 3-conv stem + stride-2 maxpool; vd downsampling
    shortcuts are AvgPool2x2 + 1x1 conv."""

    model_type: str = "rt_detr_resnet"
    depths: List[int] = field(default_factory=lambda: [3, 4, 6, 3])
    downsample_in_bottleneck: bool = False
    downsample_in_first_stage: bool = False
    embedding_size: int = 64
    hidden_act: str = "relu"
    hidden_sizes: List[int] = field(default_factory=lambda: [256, 512, 1024, 2048])
    layer_type: str = "bottleneck"
    num_channels: int = 3
    out_features: List[str] = field(
        default_factory=lambda: ["stage2", "stage3", "stage4"]
    )


@dataclass
class ModelConfig(BaseModelConfig):
    model_type: str = "rt_detr_v2"
    image_size: int = 640
    num_labels: int = 17
    id2label: Optional[dict] = None
    backbone_config: Optional[Union[dict, RTDetrResNetConfig]] = None
    d_model: int = 256
    encoder_hidden_dim: int = 256
    encoder_in_channels: List[int] = field(default_factory=lambda: [512, 1024, 2048])
    feat_strides: List[int] = field(default_factory=lambda: [8, 16, 32])
    encoder_layers: int = 1
    encoder_ffn_dim: int = 1024
    encoder_attention_heads: int = 8
    encoder_activation_function: str = "gelu"
    encode_proj_layers: List[int] = field(default_factory=lambda: [2])
    positional_encoding_temperature: int = 10000
    activation_function: str = "silu"
    normalize_before: bool = False
    layer_norm_eps: float = 1e-5
    hidden_expansion: float = 1.0
    batch_norm_eps: float = 1e-5
    decoder_layers: int = 6
    decoder_attention_heads: int = 8
    decoder_ffn_dim: int = 1024
    decoder_in_channels: List[int] = field(default_factory=lambda: [256, 256, 256])
    decoder_activation_function: str = "relu"
    decoder_method: str = "default"
    decoder_n_levels: int = 3
    decoder_n_points: int = 4
    decoder_offset_scale: float = 0.5
    num_feature_levels: int = 3
    num_queries: int = 300
    learn_initial_query: bool = False
    with_box_refine: bool = True
    use_focal_loss: bool = True

    def __post_init__(self):
        if self.backbone_config is None:
            self.backbone_config = RTDetrResNetConfig()
        elif isinstance(self.backbone_config, dict):
            self.backbone_config = RTDetrResNetConfig.from_dict(self.backbone_config)
        # framework-compat: generic loader paths probe these
        self.text_config = None
        self.vision_config = None
