"""Model-wide quantize / dequantize utilities.

Role parity: reference mlx_vlm/quant_utils.py — quantize_model:35,
dequantize_model:114 (bits-per-weight report), and convert.py's
mixed_quant_predicate_builder:74 (per-layer mixed-precision recipes).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .core.quant import (
    ChannelQuantizedTensor,
    QuantizedTensor,
    channel_dequantize,
    dequantize,
    quantize,
)


def _walk_linears(tree: dict, prefix=""):
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            if "weight" in v and not isinstance(v["weight"], dict):
                yield path, v
            else:
                yield from _walk_linears(v, path)


def default_predicate(path: str, weight) -> bool:
    if isinstance(weight, QuantizedTensor) or weight.ndim < 2:
        return False
    if any(s in path for s in ("vision_tower", "norm", "embed_tokens",
                               "patch_embed", "merger", "multi_modal_projector")):
        return False
    return weight.shape[-1] % 64 == 0


def mixed_quant_predicate_builder(
    low_bits: int = 4, high_bits: int = 8, group_size: int = 64,
    high_layers: Tuple[str, ...] = ("lm_head", "down_proj"),
) -> Callable[[str, object], Optional[dict]]:
    """Mixed recipe: sensitive layers get more bits (reference convert.py:74).

    Returns a predicate mapping path -> {"bits", "group_size"} or None."""

    def pred(path: str, weight) -> Optional[dict]:
        if not default_predicate(path, weight):
            return None
        bits = high_bits if any(h in path for h in high_layers) else low_bits
        return {"bits": bits, "group_size": group_size}

    return pred


def quantize_model(
    model,
    bits: int = 4,
    group_size: int = 64,
    predicate: Optional[Callable] = None,
) -> dict:
    """Quantize eligible linears of a loaded model in place.

    Returns a report incl. achieved bits-per-weight (reference
    quant_utils.py:35)."""
    n_q = 0
    total_params = 0
    total_bits = 0

    def walk(tree: dict, prefix="") -> dict:
        nonlocal n_q, total_params, total_bits
        out = {}
        for k, v in tree.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                if "weight" in v and not isinstance(v["weight"], dict):
                    w = v["weight"]
                    if isinstance(w, QuantizedTensor):
                        out[k] = v
                        total_params += int(jnp.prod(jnp.asarray(w.shape)))
                        total_bits += int(jnp.prod(jnp.asarray(w.shape))) * w.bits
                        continue
                    spec = None
                    if predicate is not None:
                        r = predicate(path, w)
                        if isinstance(r, dict):
                            spec = r
                        elif r:
                            spec = {"bits": bits, "group_size": group_size}
                    elif default_predicate(path, w):
                        spec = {"bits": bits, "group_size": group_size}
                    total_params += w.size
                    if spec is not None:
                        v = {**v, "weight": quantize(w, **spec)}
                        n_q += 1
                        total_bits += w.size * spec["bits"]
                    else:
                        total_bits += w.size * w.dtype.itemsize * 8
                    out[k] = v
                else:
                    out[k] = walk(v, path)
            else:
                out[k] = v
                if hasattr(v, "size") and jnp.issubdtype(v.dtype, jnp.floating):
                    total_params += v.size
                    total_bits += v.size * v.dtype.itemsize * 8
        return out

    model.params = walk(model.params)
    if isinstance(getattr(model, "config_dict", None), dict):
        model.config_dict["quantization"] = {"bits": bits, "group_size": group_size}
    return {
        "quantized_layers": n_q,
        "bits_per_weight": total_bits / max(total_params, 1),
    }


def dequantize_model(model) -> int:
    """Replace every QuantizedTensor with its dequantized dense weight
    (reference quant_utils.py:114)."""
    n = 0

    def walk(tree: dict) -> dict:
        nonlocal n
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif isinstance(v, QuantizedTensor):
                out[k] = dequantize(v)
                n += 1
            elif isinstance(v, ChannelQuantizedTensor):
                out[k] = channel_dequantize(v)
                n += 1
            else:
                out[k] = v
        return out

    model.params = walk(model.params)
    if isinstance(getattr(model, "config_dict", None), dict):
        model.config_dict.pop("quantization", None)
    return n
