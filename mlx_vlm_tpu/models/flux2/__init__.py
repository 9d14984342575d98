"""Flux2 (rectified-flow MMDiT) image generation family.

Role parity: reference mlx_vlm/models/flux2/* — Flux2Image /
Flux2ImageEdit pipelines, klein 4B/9B/base variants, flow-match Euler
scheduler, packed-latent VAE, Mistral-3 text encoder.

The TPU implementation lives in mlx_vlm_tpu/imagegen/ (pipeline.py,
dit.py, vae.py, scheduler.py, text_encoder.py, latent.py, params.py);
this module is the family-facing entry matching the reference's package
layout, plus the model_index.json discovery hooks
(imagegen/discovery.py, reference generate/image.py:320).
"""

from __future__ import annotations

from ...imagegen import (DiT, DiTConfig, Flux2Pipeline, Flux2Variant,
                         FlowMatchEulerScheduler, TextEncoderConfig,
                         VAEConfig, get_variant, list_variants,
                         validate_dimensions)
from ...imagegen.discovery import (is_image_generation_model,
                                   load_image_generation_model)

# image-generation families expose the pipeline as Model; the loader's
# VLM path never routes here (no text `Model(config)` contract)
Model = Flux2Pipeline
is_image_generation_model_type = True

__all__ = [
    "Model", "Flux2Pipeline", "Flux2Variant", "DiT", "DiTConfig",
    "FlowMatchEulerScheduler", "TextEncoderConfig", "VAEConfig",
    "get_variant", "list_variants", "validate_dimensions",
    "is_image_generation_model", "load_image_generation_model",
]
