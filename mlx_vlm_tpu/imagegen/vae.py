"""Flux2 VAE (encoder + decoder) as pure NHWC functions.

Role parity: reference mlx_vlm/models/flux2/vae/* — Flux2VAE (vae.py),
Flux2Encoder/Flux2Decoder, ResnetBlock2D / AttentionBlock / UNetMidBlock /
Up(Down)sample2D (vae/common/*), BatchNormStats denorm of packed latents.

TPU design: channels-last everywhere — `lax.conv_general_dilated` with
("NHWC", "HWIO", "NHWC") dimension numbers maps directly onto the MXU with
no layout transposes (the reference transposes NCHW<->NHWC around every
conv).  GroupNorm runs in fp32; convs in the checkpoint dtype (bf16).
Blocks are a static Python loop (4 stages x 3 resnets) — traced once under
jit, so there is no scan/stacking pressure here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .latent import patchify, unpatchify

__all__ = ["VAEConfig", "vae_decode", "vae_encode", "decode_packed_latents",
           "bn_normalize", "bn_denormalize"]


@dataclasses.dataclass
class VAEConfig:
    latent_channels: int = 32
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    eps: float = 1e-6
    scaling_factor: float = 1.0
    shift_factor: float = 0.0
    bn_eps: float = 1e-4
    mid_block_add_attention: bool = True


def _conv(p: dict, x: jax.Array, stride: int = 1, padding="SAME") -> jax.Array:
    """NHWC conv; p["weight"] is HWIO (converted from torch OIHW at load)."""
    w = p["weight"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _group_norm(p: dict, x: jax.Array, groups: int, eps: float) -> jax.Array:
    """PyTorch-compatible GroupNorm on NHWC (normalize over H, W, C/G per
    group), fp32 accumulation."""
    B, H, W, C = x.shape
    xf = x.astype(jnp.float32).reshape(B, H, W, groups, C // groups)
    mu = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps)).reshape(B, H, W, C)
    xn = xn * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return xn.astype(x.dtype)


def _resnet_block(p: dict, x: jax.Array, groups: int, eps: float) -> jax.Array:
    """norm-silu-conv x2 + (projected) residual (Flux2ResnetBlock2D)."""
    residual = x
    h = jax.nn.silu(_group_norm(p["norm1"], x, groups, eps))
    h = _conv(p["conv1"], h)
    h = jax.nn.silu(_group_norm(p["norm2"], h, groups, eps))
    h = _conv(p["conv2"], h)
    if "conv_shortcut" in p:
        residual = _conv(p["conv_shortcut"], residual)
    return h + residual


def _attention_block(p: dict, x: jax.Array, groups: int, eps: float) -> jax.Array:
    """Single-head full self-attention over H*W tokens (Flux2AttentionBlock)."""
    B, H, W, C = x.shape
    n = _group_norm(p["group_norm"], x, groups, eps).reshape(B, H * W, C)

    def lin(q, t):
        y = jnp.einsum("bnc,oc->bno", t, q["weight"].astype(t.dtype),
                       preferred_element_type=jnp.float32).astype(t.dtype)
        return y + q["bias"].astype(y.dtype) if "bias" in q else y

    q, k, v = lin(p["to_q"], n), lin(p["to_k"], n), lin(p["to_v"], n)
    scores = jnp.einsum("bnc,bmc->bnm", q, k,
                        preferred_element_type=jnp.float32) * (C ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    o = jnp.einsum("bnm,bmc->bnc", probs, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return x + lin(p["to_out"], o).reshape(B, H, W, C)


def _mid_block(p: dict, x: jax.Array, groups: int, eps: float) -> jax.Array:
    x = _resnet_block(p["resnets"]["0"], x, groups, eps)
    if "attentions" in p:
        x = _attention_block(p["attentions"]["0"], x, groups, eps)
    return _resnet_block(p["resnets"]["1"], x, groups, eps)


def _upsample(p: dict, x: jax.Array) -> jax.Array:
    """2x nearest then 3x3 conv (Flux2Upsample2D)."""
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return _conv(p["conv"], x)


def _downsample(p: dict, x: jax.Array) -> jax.Array:
    """Asymmetric (0,1) pad then stride-2 VALID conv (Flux2Downsample2D)."""
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return _conv(p["conv"], x, stride=2, padding="VALID")


def vae_decode(params: dict, latents: jax.Array,
               config: Optional[VAEConfig] = None) -> jax.Array:
    """Latents [B, h, w, 32] -> image [B, 8h, 8w, 3] in [-1, 1]
    (Flux2VAE.decode + Flux2Decoder)."""
    cfg = config or VAEConfig()
    g, eps = cfg.norm_num_groups, cfg.eps
    x = (latents / cfg.scaling_factor) + cfg.shift_factor
    x = _conv(params["post_quant_conv"], x, padding="VALID")
    dec = params["decoder"]
    x = _conv(dec["conv_in"], x)
    x = _mid_block(dec["mid_block"], x, g, eps)
    n_up = len(cfg.block_out_channels)
    for i in range(n_up):
        blk = dec["up_blocks"][str(i)]
        for j in range(cfg.layers_per_block + 1):
            x = _resnet_block(blk["resnets"][str(j)], x, g, eps)
        if "upsamplers" in blk:
            x = _upsample(blk["upsamplers"]["0"], x)
    x = jax.nn.silu(_group_norm(dec["conv_norm_out"], x, g, eps))
    return _conv(dec["conv_out"], x)


def vae_encode(params: dict, image: jax.Array,
               config: Optional[VAEConfig] = None) -> jax.Array:
    """Image [B, H, W, 3] in [-1, 1] -> mean latents [B, H/8, W/8, 32]
    (Flux2VAE.encode + Flux2Encoder; deterministic — mean only)."""
    cfg = config or VAEConfig()
    g, eps = cfg.norm_num_groups, cfg.eps
    enc = params["encoder"]
    x = _conv(enc["conv_in"], image)
    n_down = len(cfg.block_out_channels)
    for i in range(n_down):
        blk = enc["down_blocks"][str(i)]
        for j in range(cfg.layers_per_block):
            x = _resnet_block(blk["resnets"][str(j)], x, g, eps)
        if "downsamplers" in blk:
            x = _downsample(blk["downsamplers"]["0"], x)
    x = _mid_block(enc["mid_block"], x, g, eps)
    x = jax.nn.silu(_group_norm(enc["conv_norm_out"], x, g, eps))
    x = _conv(enc["conv_out"], x)
    x = _conv(params["quant_conv"], x, padding="VALID")
    mean, _ = jnp.split(x, 2, axis=-1)
    return (mean - cfg.shift_factor) * cfg.scaling_factor


def bn_denormalize(params: dict, packed: jax.Array, bn_eps: float = 1e-4) -> jax.Array:
    """Undo train-time batch-norm on packed (patchified, C*4-channel)
    latents: x * std + mean (Flux2VAE.decode_packed_latents)."""
    mean = params["bn"]["running_mean"].astype(jnp.float32)
    std = jnp.sqrt(params["bn"]["running_var"].astype(jnp.float32) + bn_eps)
    return (packed.astype(jnp.float32) * std + mean).astype(packed.dtype)


def bn_normalize(params: dict, packed: jax.Array, bn_eps: float = 1e-4) -> jax.Array:
    """(x - mean) / std on patchified latents (reference
    pipeline.py:_bn_normalize_vae_encoded_latents)."""
    mean = params["bn"]["running_mean"].astype(jnp.float32)
    std = jnp.sqrt(params["bn"]["running_var"].astype(jnp.float32) + bn_eps)
    return ((packed.astype(jnp.float32) - mean) / std).astype(packed.dtype)


def decode_packed_latents(params: dict, packed: jax.Array,
                          config: Optional[VAEConfig] = None) -> jax.Array:
    """Packed [B, h, w, C*4] -> image [B, 16h, 16w, 3]: bn denorm ->
    depth-to-space -> decode (Flux2VAE.decode_packed_latents)."""
    cfg = config or VAEConfig()
    latents = unpatchify(bn_denormalize(params, packed, cfg.bn_eps))
    return vae_decode(params, latents, cfg)
