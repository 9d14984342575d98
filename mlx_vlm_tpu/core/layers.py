"""Functional neural-net building blocks.

Models in this framework are pure functions over parameter pytrees (nested
dicts whose keys mirror the HF safetensors names).  This file provides the
primitive layers; each takes the parameter subtree as its first argument.

Role parity: reference uses `mlx.nn.{Linear,Embedding,RMSNorm,LayerNorm}` and
`mlx_vlm/models/mlp.py` (SwiGLUMLP).  Here everything is jit-traceable, bf16
by default, with fp32 accumulation where it matters (norms, softmax).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quant import (
    ChannelQuantizedTensor,
    Int4GroupedTensor,
    NVFP4Tensor,
    QuantizedTensor,
    activation_quant_enabled,
    channel_quantized_matmul,
    channel_quantized_matmul_int8,
    int4_grouped_matmul,
    nvfp4_matmul,
    quantized_matmul,
)

__all__ = [
    "linear",
    "embedding",
    "embedding_as_linear",
    "rms_norm",
    "layer_norm",
    "swiglu_mlp",
    "gelu_mlp",
]


def _matmul_wT(x: jax.Array, w) -> jax.Array:
    """x @ w.T for a dense or quantized weight in HF [out, in] layout."""
    from .quant_scan import Int4ScanRef, resolve_scan_ref

    if isinstance(w, Int4ScanRef):
        # stacked-in-scan quantized weight: no-copy scalar-prefetch kernel
        from ..ops.int4_matvec import int4_matvec

        t, idx = resolve_scan_ref(w)
        return int4_matvec(x, t, idx)
    if isinstance(w, Int4GroupedTensor):
        from ..ops.int4_matvec import int4_matvec

        return int4_matvec(x, w)
    if isinstance(w, ChannelQuantizedTensor):
        if activation_quant_enabled():
            return channel_quantized_matmul_int8(x, w)
        return channel_quantized_matmul(x, w)
    if isinstance(w, NVFP4Tensor):
        return nvfp4_matmul(x, w)
    if isinstance(w, QuantizedTensor):
        return quantized_matmul(x, w, transpose=True)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (w.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def linear(p: dict, x: jax.Array) -> jax.Array:
    """HF Linear: y = x @ W.T + b. p = {"weight": [out,in], "bias"?: [out]}.

    If LoRA factors are attached (p["lora_a"] [r,in], p["lora_b"] [out,r],
    scale folded into lora_b), the low-rank path is added — this is how
    LoRA/QLoRA ride every linear, including quantized base weights
    (reference trainer/lora_layers.py:11).
    """
    if "dora_m" in p:
        # DoRA (reference trainer/dora_layers.py:9): column-norm-decomposed
        # update — y = (x @ (W + BA).T) * m / ||W + BA||_row.
        w = p["weight"]
        if isinstance(w, QuantizedTensor):
            from .quant import dequantize

            w = dequantize(w)
        delta = jnp.einsum("...or,...ri->...oi", p["lora_b"], p["lora_a"])
        adapted = w.astype(delta.dtype) + delta
        norm = jnp.sqrt(jnp.sum(jnp.square(adapted), axis=-1) + 1e-12)
        y = _matmul_wT(x, adapted) * (p["dora_m"] / norm).astype(x.dtype)
        b = p.get("bias")
        return y + b.astype(y.dtype) if b is not None else y
    y = _matmul_wT(x, p["weight"])
    b = p.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    if "lora_a" in p:
        z = _matmul_wT(x, p["lora_a"])  # [..., r]
        y = y + _matmul_wT(z, p["lora_b"])
    return y


def embedding(p: dict, ids: jax.Array) -> jax.Array:
    """p = {"weight": [vocab, dim]} -> [..., dim]."""
    w = p["weight"]
    if isinstance(w, ChannelQuantizedTensor):
        # channel layout is [dim, vocab]: gather lanes, dequant the slice
        q = jnp.take(w.q8, ids, axis=1)  # [dim, ...ids]
        s = jnp.take(w.scales, ids, axis=1)
        b = jnp.take(w.biases, ids, axis=1)
        out = q.astype(w.dtype) * s.astype(w.dtype) + b.astype(w.dtype)
        return jnp.moveaxis(out, 0, -1)  # [...ids, dim]
    if isinstance(w, QuantizedTensor):
        from .quant import dequantize

        w = dequantize(w)
    return jnp.take(w, ids, axis=0)


def embedding_as_linear(p: dict, x: jax.Array) -> jax.Array:
    """Tied-embedding head: logits = x @ E.T."""
    return _matmul_wT(x, p["weight"])


def rms_norm(p: dict, x: jax.Array, eps: float = 1e-6, *, offset: float = 0.0) -> jax.Array:
    """RMSNorm with fp32 accumulation.

    `offset=1.0` gives the Gemma convention (weight stored as w-1).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xn = xf * jax.lax.rsqrt(var + eps)
    w = p["weight"].astype(jnp.float32) + offset
    return (xn * w).astype(dtype)


def layer_norm(p: dict, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    if "weight" in p:
        xn = xn * p["weight"].astype(jnp.float32)
    if "bias" in p and p["bias"] is not None:
        xn = xn + p["bias"].astype(jnp.float32)
    return xn.astype(dtype)


def swiglu_mlp(p: dict, x: jax.Array) -> jax.Array:
    """down( silu(gate(x)) * up(x) ) — reference mlx_vlm/models/mlp.py:SwiGLUMLP."""
    g = linear(p["gate_proj"], x)
    u = linear(p["up_proj"], x)
    return linear(p["down_proj"], jax.nn.silu(g) * u)


def gelu_mlp(p: dict, x: jax.Array, approximate: bool = True) -> jax.Array:
    """fc2(gelu(fc1(x))) — ViT-style MLP."""
    h = linear(p["fc1"], x)
    h = jax.nn.gelu(h, approximate=approximate)
    return linear(p["fc2"], h)
