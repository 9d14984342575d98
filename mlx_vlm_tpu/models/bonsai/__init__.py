"""Bonsai (quantized Flux2-Klein distillation) image generation family.

Role parity: reference mlx_vlm/models/bonsai — the klein_fast
transformer is the flux2-klein MMDiT with ternary / 4-bit quantized
weights and a 4-bit text encoder (pipeline.py BonsaiImage,
weights.py load_text_encoder_4bit / load_transformer); latents,
scheduler, tokenizer, and prompt handling are shared with flux2.

TPU design: BonsaiPipeline rides the shared Flux2Pipeline (imagegen/)
— same jitted denoise step, CFG batching, packed-latent VAE.  MLX
affine-quantized checkpoint tensors (weight + scales + biases triples)
are imported bit-exactly via core.quant.from_mlx_packed and
DEQUANTIZED to the compute dtype at load: the distilled model runs
end-to-end today; a packed-domain MMDiT matmul (the reference's
megakernel.py role) plugs into the same params as an optimization.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax.numpy as jnp

from ...imagegen.pipeline import Flux2Pipeline


def _dequantize_mlx_triples(raw: dict, dtype) -> dict:
    """Collapse {w, w.scales, w.biases} MLX affine triples to dense."""
    from ...core.quant import dequantize, from_mlx_packed

    out = {}
    for k, v in raw.items():
        if k.endswith((".scales", ".biases")):
            continue
        sk, bk = k + ".scales", k + ".biases"
        if sk in raw and bk in raw:
            w = np.asarray(v)
            scales = np.asarray(raw[sk])
            in_dim = _infer_in(w, scales)
            qt = from_mlx_packed(
                w, scales, np.asarray(raw[bk]),
                bits=32 * w.shape[-1] // in_dim,
                group_size=in_dim // scales.shape[-1],
            )
            out[k] = np.asarray(dequantize(qt, dtype))
        else:
            out[k] = v
    return out


def _infer_in(w: np.ndarray, scales: np.ndarray) -> int:
    """True input dim: group_size * n_groups; groups from the scales."""
    n_groups = scales.shape[-1]
    # packed words hold in_dim * bits / 32; bits in {2, 3, 4, 8} — pick
    # the one that makes in_dim a multiple of n_groups
    for bits in (4, 8, 2, 3):
        in_dim = w.shape[-1] * 32 // bits
        if in_dim % n_groups == 0:
            return in_dim
    return w.shape[-1] * 8


class BonsaiPipeline(Flux2Pipeline):
    """Flux2-Klein pipeline over a bonsai (quantized) checkpoint."""

    @classmethod
    def from_pretrained(cls, model_path, variant=None, dtype=jnp.bfloat16,
                        include_encoder: bool = False,
                        max_sequence_length: int = 512) -> "BonsaiPipeline":
        root = Path(model_path).expanduser()
        # bonsai ships the flux2 layout; quantized tensors are expanded
        # in-place by the shared safetensors reader hook below
        from ...imagegen import params as P

        orig = P._read_safetensors

        def read_and_dequant(d):
            return _dequantize_mlx_triples(orig(d), dtype)

        P._read_safetensors = read_and_dequant
        try:
            pipe = super().from_pretrained(
                root, variant=variant, dtype=dtype,
                include_encoder=include_encoder,
                max_sequence_length=max_sequence_length)
        finally:
            P._read_safetensors = orig
        pipe.__class__ = cls
        return pipe


Model = BonsaiPipeline

__all__ = ["Model", "BonsaiPipeline"]
