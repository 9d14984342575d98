"""DaViT (Dual-Attention ViT) vision tower for Florence-2.

Role parity: reference mlx_vlm/models/florence2/vision.py — ConvEmbed:99,
ChannelAttention:149, WindowAttention:204, SpatialBlock:308,
ChannelBlock:359, VisionModel:450.

TPU design: channels-last `lax.conv_general_dilated` for patch embeds and
the 3x3 depthwise convs; window attention is a reshape-partition into
[B*nW, w*w, C] followed by one batched SDPA (one MXU matmul per stage, no
per-window loop); channel attention is the same dot-product attention with
the roles of tokens and channel-groups swapped.  Stages are heterogeneous
(different dims), so blocks run as an unrolled python loop over the nested
param tree — at most 12 blocks, traced once per image shape.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp

from ...core.layers import layer_norm, linear


@dataclasses.dataclass
class VisionConfig:
    model_type: str = "davit"
    in_chans: int = 3
    depths: Tuple[int, ...] = (1, 1, 9, 1)
    dim_embed: Tuple[int, ...] = (128, 256, 512, 1024)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    num_groups: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 12
    mlp_ratio: float = 4.0
    patch_size: Tuple[int, ...] = (7, 3, 3, 3)
    patch_stride: Tuple[int, ...] = (4, 2, 2, 2)
    patch_padding: Tuple[int, ...] = (3, 1, 1, 1)
    patch_prenorm: Tuple[bool, ...] = (False, False, False, False)
    qkv_bias: bool = True
    conv_at_attn: bool = True
    conv_at_ffn: bool = True
    projection_dim: int = 768

    @classmethod
    def from_dict(cls, d: dict) -> "VisionConfig":
        import inspect

        sig = inspect.signature(cls).parameters
        return cls(**{k: tuple(v) if isinstance(v, list) else v
                      for k, v in d.items() if k in sig})


def _conv2d(p: dict, x: jax.Array, stride: int, padding: int,
            groups: int = 1) -> jax.Array:
    """NHWC conv; weight stored HWIO (torch OIHW transposed at sanitize)."""
    w = p["weight"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _depthwise(p: dict, x: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """3x3 depthwise conv on a token stream (reference DepthWiseConv2d:62)."""
    B, N, C = x.shape
    H, W = hw
    img = x.reshape(B, H, W, C)
    img = _conv2d(p["dw"], img, stride=1, padding=1, groups=C)
    return img.reshape(B, H * W, C)


def _window_attention(p: dict, x: jax.Array, hw: Tuple[int, int],
                      num_heads: int, window: int) -> jax.Array:
    """Non-overlapping window MHSA as ONE batched SDPA over [B*nW, w*w, C]."""
    B, N, C = x.shape
    H, W = hw
    img = x.reshape(B, H, W, C)
    pad_b = (window - H % window) % window
    pad_r = (window - W % window) % window
    if pad_b or pad_r:
        img = jnp.pad(img, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    Hp, Wp = H + pad_b, W + pad_r
    nh, nw = Hp // window, Wp // window
    win = img.reshape(B, nh, window, nw, window, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(B * nh * nw, window * window, C)

    hd = C // num_heads
    qkv = linear(p["qkv"], win).reshape(-1, window * window, 3, num_heads, hd)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    attn = jax.nn.softmax(
        (q.astype(jnp.float32) * hd**-0.5) @ k.astype(
            jnp.float32).transpose(0, 1, 3, 2), axis=-1)
    o = (attn @ v.astype(jnp.float32)).astype(x.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(-1, window * window, C)
    o = linear(p["proj"], o)

    img = o.reshape(B, nh, nw, window, window, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return img[:, :H, :W].reshape(B, H * W, C)


def _channel_attention(p: dict, x: jax.Array, groups: int) -> jax.Array:
    """Token/channel-transposed attention (reference ChannelAttention:149):
    an [Cg, Cg] attention per group, linear in sequence length."""
    B, N, C = x.shape
    cg = C // groups
    qkv = linear(p["qkv"], x).reshape(B, N, 3, groups, cg).transpose(
        2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # [B, G, N, cg]
    qf = q.astype(jnp.float32) * float(N) ** -0.5
    attn = jax.nn.softmax(
        qf.transpose(0, 1, 3, 2) @ k.astype(jnp.float32), axis=-1)
    o = (attn @ v.astype(jnp.float32).transpose(0, 1, 3, 2)).transpose(
        0, 1, 3, 2)  # [B, G, N, cg]
    o = o.transpose(0, 2, 1, 3).reshape(B, N, C).astype(x.dtype)
    return linear(p["proj"], o)


def _mlp(p: dict, x: jax.Array) -> jax.Array:
    return linear(p["net"]["fc2"], jax.nn.gelu(
        linear(p["net"]["fc1"], x), approximate=False))


class DaViTTower:
    """Functional DaViT; params mirror the HF key layout
    (convs.{i}., blocks.{i}.{j}.{spatial_block,channel_block}.)."""

    def __init__(self, config: VisionConfig):
        self.config = config

    def __call__(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        """pixel_values [B, H, W, 3] (channels-last) -> [B, N, dim[-1]]."""
        c = self.config
        x = pixel_values
        tokens = None
        hw = x.shape[1:3]
        for i in range(len(c.depths)):
            conv = params["convs"][str(i)]
            if tokens is not None:
                x = tokens.reshape(tokens.shape[0], hw[0], hw[1], -1)
                if c.patch_prenorm[i]:
                    x = layer_norm(conv["norm"], x)
            y = _conv2d(conv["proj"], x, c.patch_stride[i], c.patch_padding[i])
            hw = y.shape[1:3]
            tokens = y.reshape(y.shape[0], hw[0] * hw[1], -1)
            if not c.patch_prenorm[i] and "norm" in conv:
                tokens = layer_norm(conv["norm"], tokens)
            for j in range(c.depths[i]):
                bp = params["blocks"][str(i)][str(j)]
                tokens = self._block(bp, tokens, hw, c.num_heads[i],
                                     c.num_groups[i])
        return tokens

    def _block(self, p: dict, x, hw, heads: int, groups: int):
        c = self.config
        sp = p["spatial_block"]
        if c.conv_at_attn:
            x = x + _depthwise(sp["conv1"]["fn"], x, hw)
        x = x + _window_attention(sp["window_attn"]["fn"],
                                  layer_norm(sp["window_attn"]["norm"], x),
                                  hw, heads, c.window_size)
        if c.conv_at_ffn:
            x = x + _depthwise(sp["conv2"]["fn"], x, hw)
        x = x + _mlp(sp["ffn"]["fn"], layer_norm(sp["ffn"]["norm"], x))

        ch = p["channel_block"]
        if c.conv_at_attn:
            x = x + _depthwise(ch["conv1"]["fn"], x, hw)
        x = x + _channel_attention(ch["channel_attn"]["fn"],
                                   layer_norm(ch["channel_attn"]["norm"], x),
                                   groups)
        if c.conv_at_ffn:
            x = x + _depthwise(ch["conv2"]["fn"], x, hw)
        x = x + _mlp(ch["ffn"]["fn"], layer_norm(ch["ffn"]["norm"], x))
        return x

    @staticmethod
    def sanitize(weights: dict) -> dict:
        """torch OIHW convs -> HWIO (reference vision.py:524 does OHWI for
        MLX; ours is HWIO for lax.conv)."""
        import numpy as np

        out = {}
        for k, v in weights.items():
            if "position_ids" in k:
                continue
            if (("convs" in k and "proj.weight" in k)
                    or ("blocks" in k and "dw.weight" in k)):
                # torch OIHW has out-channels first; HWIO has them last
                if v.ndim == 4 and v.shape[0] >= v.shape[3]:
                    out[k] = np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
                else:
                    out[k] = v
            else:
                out[k] = v
        return out
