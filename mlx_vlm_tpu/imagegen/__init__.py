"""TPU-native image generation (Flux2-class rectified-flow MMDiT).

Role parity: reference mlx_vlm/models/flux2/* and generate/image.py /
edit_image.py — text-to-image generation and reference-image editing.
"""

from .dit import DiT, DiTConfig
from .pipeline import Flux2Pipeline, validate_dimensions
from .params import (Flux2Variant, get_variant, init_dit_params,
                     init_text_encoder_params, init_vae_params,
                     list_variants)
from .scheduler import FlowMatchEulerScheduler
from .text_encoder import TextEncoderConfig, encode_text
from .vae import VAEConfig, decode_packed_latents, vae_decode, vae_encode

__all__ = [
    "DiT", "DiTConfig", "Flux2Pipeline", "Flux2Variant",
    "FlowMatchEulerScheduler", "TextEncoderConfig", "VAEConfig",
    "decode_packed_latents", "encode_text", "get_variant",
    "init_dit_params", "init_text_encoder_params", "init_vae_params",
    "list_variants", "vae_decode", "vae_encode", "validate_dimensions",
]
