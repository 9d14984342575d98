"""AnyUp: learned cross-attention feature upsampler for segmentation.

Role parity: reference mlx_vlm/models/falcon_perception/anyup.py —
ResBlock:18, Encoder (reflect pad):55, LearnedFeatureUnification:86,
LFUEncoder:121, AnyUpRoPE:137, CrossAttention (windowed):173,
CrossDecodeBlock:253, adaptive_avg_pool2d:283, AnyUp:311.

TPU design: channels-last NHWC with HWIO kernels (converted from torch
OIHW at sanitize); windowed cross-attention is a single masked einsum —
feature maps are small enough (<=1024x1024 queries against <=64x64 keys)
that one fused attention beats the reference's python chunk loop.
GroupNorm runs in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _conv(p: dict, x: jax.Array, padding="SAME") -> jax.Array:
    """NHWC conv; p["weight"] is HWIO."""
    w = p["weight"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _group_norm(p: dict, x: jax.Array, groups: int = 8,
                eps: float = 1e-5) -> jax.Array:
    B, H, W, C = x.shape
    xf = x.astype(jnp.float32).reshape(B, H, W, groups, C // groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(B, H, W, C)
    return (xn * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _rms(p: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    xn = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    return (xn * p["weight"].astype(jnp.float32)).astype(x.dtype)


def _linear(p: dict, x: jax.Array) -> jax.Array:
    y = x @ p["weight"].astype(x.dtype).T
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _reflect_pad(x: jax.Array, pad: int) -> jax.Array:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                   mode="reflect")


def _res_block(p: dict, x: jax.Array) -> jax.Array:
    h = jax.nn.silu(_group_norm(p["norm1"], x))
    h = _conv(p["conv1"], h)
    h = jax.nn.silu(_group_norm(p["norm2"], h))
    h = _conv(p["conv2"], h)
    sc = _conv(p["shortcut"], x) if "shortcut" in p else x
    return h + sc


def _encoder(p: dict, x: jax.Array, reflect: bool = False) -> jax.Array:
    """Conv + ResBlocks; `reflect` only fires for kernel>1 stems
    (reference Encoder:63)."""
    kh = p["conv"]["weight"].shape[0]
    if reflect and kh > 1:
        x = _reflect_pad(x, kh // 2)
        x = _conv(p["conv"], x, padding="VALID")
    else:
        x = _conv(p["conv"], x)
    for i in sorted(p["blocks"], key=int):
        x = _res_block(p["blocks"][i], x)
    return x


def _lfu(p: dict, x: jax.Array) -> jax.Array:
    """LearnedFeatureUnification: per-input-channel conv with a shared
    basis, count-normalized, softmax over basis channels, mean over input
    channels (reference anyup.py:86)."""
    B, H, W, C = x.shape
    basis = p["basis"]  # HWIO [k, k, 1, out_ch]
    k, out_ch = basis.shape[0], basis.shape[3]
    pad = k // 2
    # each input channel independently: fold C into batch
    xc = x.transpose(0, 3, 1, 2).reshape(B * C, H, W, 1)
    xc = jnp.pad(xc, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xc, basis.astype(xc.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [B*C, H, W, out]
    # normalize by the number of valid (non-padding) taps
    ones = jnp.ones((1, H, W, 1), xc.dtype)
    ones = jnp.pad(ones, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    denom = jax.lax.conv_general_dilated(
        ones, jnp.ones((k, k, 1, 1), xc.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y / denom
    y = y.reshape(B, C, H, W, out_ch)
    # torch grouped-conv channel order: flat = c*out + o, viewed as
    # (out, C) -> softmax over the VIEWED first axis mixes (c, o) pairs
    flat = y.transpose(0, 1, 4, 2, 3).reshape(B, C * out_ch, H, W)
    viewed = flat.reshape(B, out_ch, C, H, W)
    attn = jax.nn.softmax(viewed.astype(jnp.float32), axis=1)
    out = attn.mean(axis=2)  # [B, out, H, W]
    return out.transpose(0, 2, 3, 1).astype(x.dtype)


def _lfu_encoder(p: dict, x: jax.Array) -> jax.Array:
    x = _lfu(p["lfu"], x)
    for i in sorted(p["blocks"], key=int):
        x = _res_block(p["blocks"][i], x)
    return x


def _anyup_rope(p: dict, x: jax.Array, coords: jax.Array) -> jax.Array:
    """2D rope with learned freqs [2, dim]; rotate-half convention."""
    angle = coords.astype(jnp.float32) @ p["freqs"].astype(jnp.float32)
    cos_a, sin_a = jnp.cos(angle), jnp.sin(angle)
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos_a + rotated * sin_a).astype(x.dtype)


def _window_mask(H: int, W: int, h: int, w: int,
                 window_ratio: float) -> jax.Array:
    """[H*W, h*w] bool: each hi-res query attends a low-res window around
    its normalized position (reference _window_mask_chunk:165)."""
    qi = np.arange(H * W)
    qr = (qi // W + 0.5) / H
    qc = (qi % W + 0.5) / W
    r_lo = np.floor(np.clip(qr - window_ratio, 0, 1) * h).astype(np.int32)
    r_hi = np.ceil(np.clip(qr + window_ratio, 0, 1) * h).astype(np.int32)
    c_lo = np.floor(np.clip(qc - window_ratio, 0, 1) * w).astype(np.int32)
    c_hi = np.ceil(np.clip(qc + window_ratio, 0, 1) * w).astype(np.int32)
    kr, kc = np.arange(h), np.arange(w)
    row_ok = (kr[None] >= r_lo[:, None]) & (kr[None] < r_hi[:, None])
    col_ok = (kc[None] >= c_lo[:, None]) & (kc[None] < c_hi[:, None])
    return jnp.asarray(
        (row_ok[:, :, None] & col_ok[:, None, :]).reshape(H * W, h * w))


def _cross_decode(p: dict, q_map: jax.Array, k_map: jax.Array,
                  v_map: jax.Array, num_heads: int = 4,
                  window_ratio: float = 0.1) -> jax.Array:
    """CrossDecodeBlock: 3x3 conv on q, then windowed multi-head
    cross-attention against the low-res keys (reference anyup.py:253)."""
    B, H, W, _ = q_map.shape
    _, h, w, Dv = v_map.shape
    ca = p["cross_attn"]
    q_map = _conv(p["conv"], q_map)
    q = _linear(ca["q_proj"], _rms(ca["norm_q"], q_map.reshape(B, H * W, -1)))
    k = _linear(ca["k_proj"], _rms(ca["norm_k"], k_map.reshape(B, h * w, -1)))
    v = v_map.reshape(B, h * w, Dv)
    hd = q.shape[-1] // num_heads
    vhd = Dv // num_heads
    qh = q.reshape(B, H * W, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, h * w, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, h * w, num_heads, vhd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bnqd,bnkd->bnqk", qh, kh,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    mask = _window_mask(H, W, h, w, window_ratio)
    scores = jnp.where(mask[None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bnqk,bnkd->bnqd", probs, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, H, W, Dv)


def adaptive_avg_pool2d(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    N, H, W, C = x.shape
    if H == out_h and W == out_w:
        return x
    if H % out_h == 0 and W % out_w == 0:
        kh, kw = H // out_h, W // out_w
        return x.reshape(N, out_h, kh, out_w, kw, C).mean(axis=(2, 4))
    rows = []
    for i in range(out_h):
        h0, h1 = (i * H) // out_h, ((i + 1) * H) // out_h
        cols = []
        for j in range(out_w):
            w0, w1 = (j * W) // out_w, ((j + 1) * W) // out_w
            cols.append(x[:, h0:h1, w0:w1].mean(axis=(1, 2), keepdims=True))
        rows.append(jnp.concatenate(cols, axis=2))
    return jnp.concatenate(rows, axis=1)


def anyup(p: dict, images: jax.Array, features: jax.Array,
          num_heads: int = 4) -> jax.Array:
    """images [N, H, W, 3] in [-1, 1]; features [N, h, w, D] low-res segm
    features -> [N, H, W, D] high-res (reference AnyUp.__call__:340)."""
    B, H, W, _ = images.shape
    _, h, w, _ = features.shape
    qk_dim = p["image_encoder"]["conv"]["weight"].shape[3]

    mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 1, 1, 3)
    std = jnp.asarray(IMAGENET_STD).reshape(1, 1, 1, 3)
    img = ((images * 0.5 + 0.5) - mean) / std
    img = img.astype(features.dtype)

    enc = _encoder(p["image_encoder"], img, reflect=True)
    yy, xx = np.meshgrid(np.linspace(0.0, 1.0, H),
                         np.linspace(0.0, 1.0, W), indexing="ij")
    coords = jnp.asarray(
        np.stack([yy.reshape(-1), xx.reshape(-1)], -1,
                 dtype=np.float32))[None]
    enc = _anyup_rope(p["rope"], enc.reshape(B, H * W, qk_dim),
                      coords).reshape(B, H, W, qk_dim)

    q = _encoder(p["query_encoder"], enc, reflect=True)
    k = adaptive_avg_pool2d(_encoder(p["key_encoder"], enc, reflect=True),
                            h, w)
    feat_norm = features / jnp.sqrt(jnp.clip(
        jnp.sum(features * features, -1, keepdims=True), 1e-12))
    k_feat = _lfu_encoder(p["key_features_encoder"], feat_norm)
    k = _encoder(p["aggregation"],
                 jnp.concatenate([k, k_feat], axis=-1), reflect=True)
    return _cross_decode(p["cross_decode"], q, k, features,
                         num_heads=num_heads)
