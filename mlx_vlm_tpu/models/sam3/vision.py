"""SAM3 vision encoder: windowed ViT backbone + FPN neck.

Role parity: reference mlx_vlm/models/sam3/vision.py + position.py —
ViT-det with 2D axial RoPE, window/global attention alternation, tiled
(not interpolated) absolute position embeddings, and an FPN neck whose
upsampling stages are ConvTranspose2d(k=2, s=2).

TPU design:
- Window partition/merge are reshapes; each windowed layer is one
  batched SDPA over [B*nWins, ws*ws] — no per-window loops.
- k=2/s=2 transposed convs lower to ONE einsum + pixel-shuffle reshape
  (y[b,2h+i,2w+j,o] = sum_c x[b,h,w,c] W[c,o,i,j]) — exact, and a single
  MXU matmul instead of a strided scatter.  ConvTranspose weights
  therefore stay in torch (in, out, kH, kW) layout at sanitize time.
- RoPE tables are trace-time constants per (H, W).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..rt_detr_v2.rt_detr_v2 import _layer_norm, _linear
from .config import ViTConfig, VisionEncoderConfig

# ------------------------------------------------------------------- rope


def axial_rope_tables(dim: int, end_x: int, end_y: int,
                      theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """2D axial RoPE (cos, sin) tables [(N, dim)] — HF Sam3ViTRotary.

    Frequencies step by 4 (dim split into x-pair | y-pair quadrants);
    each frequency is repeat-interleaved over its rotation pair."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4, dtype=np.float32) / dim))
    idx = np.arange(end_x * end_y)
    fx = (idx % end_x).astype(np.float32)[:, None] * freqs[None]
    fy = (idx // end_x).astype(np.float32)[:, None] * freqs[None]
    inv = np.concatenate([fx, fy], axis=-1)
    inv = np.stack([inv, inv], axis=-1).reshape(inv.shape[0], -1)
    return np.cos(inv), np.sin(inv)


def _rotate_pairwise(x: jax.Array) -> jax.Array:
    """(x0,x1,x2,x3,...) -> (-x1,x0,-x3,x2,...)."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    return jnp.stack([-x[..., 1], x[..., 0]], axis=-1).reshape(
        *x.shape[:-2], -1)


def _apply_rope2d(q, k, cos, sin):
    q = q * cos + _rotate_pairwise(q) * sin
    k = k * cos + _rotate_pairwise(k) * sin
    return q, k


# ------------------------------------------------------------------ layers


def _vit_attention(p: dict, x: jax.Array, n_heads: int,
                   cos=None, sin=None) -> jax.Array:
    B, N, C = x.shape
    hd = C // n_heads
    q = _linear(p["q_proj"], x).reshape(B, N, n_heads, hd).transpose(0, 2, 1, 3)
    k = _linear(p["k_proj"], x).reshape(B, N, n_heads, hd).transpose(0, 2, 1, 3)
    v = _linear(p["v_proj"], x).reshape(B, N, n_heads, hd).transpose(0, 2, 1, 3)
    if cos is not None:
        q, k = _apply_rope2d(q, k, cos, sin)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5)
    a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", a, v).transpose(0, 2, 1, 3)
    return _linear(p["o_proj"], o.reshape(B, N, C))


def _window_partition(x: jax.Array, ws: int):
    """[B, H, W, C] -> ([B*nH*nW, ws, ws, C], (Hp, Wp))."""
    B, H, W, C = x.shape
    ph = (ws - H % ws) % ws
    pw = (ws - W % ws) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, C), (Hp, Wp)


def _window_unpartition(x: jax.Array, ws: int, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    C = x.shape[-1]
    B = x.shape[0] // ((Hp // ws) * (Wp // ws))
    x = x.reshape(B, Hp // ws, Wp // ws, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, Hp, Wp, C)
    return x[:, :H, :W]


def _vit_block(p: dict, x: jax.Array, cfg: ViTConfig, is_global: bool,
               cos_g, sin_g, cos_w, sin_w) -> jax.Array:
    """One ViT block on spatial [B, H, W, C]."""
    eps = cfg.layer_norm_eps
    r = x
    h = _layer_norm(p["layer_norm1"], x, eps)
    if not is_global:
        ws = cfg.window_size
        H, W = h.shape[1], h.shape[2]
        h, pad_hw = _window_partition(h, ws)
        Bw = h.shape[0]
        h = h.reshape(Bw, ws * ws, -1)
        h = _vit_attention(p["attention"], h, cfg.num_attention_heads,
                           cos_w, sin_w)
        h = _window_unpartition(h.reshape(Bw, ws, ws, -1), ws, pad_hw, (H, W))
    else:
        B, H, W, C = h.shape
        h = h.reshape(B, H * W, C)
        h = _vit_attention(p["attention"], h, cfg.num_attention_heads,
                           cos_g, sin_g)
        h = h.reshape(B, H, W, C)
    x = r + h
    r = x
    h = _layer_norm(p["layer_norm2"], x, eps)
    h = _linear(p["mlp"]["fc2"], jax.nn.gelu(_linear(p["mlp"]["fc1"], h)))
    return r + h


def _tile_pos_embed(pos: jax.Array, th: int, tw: int) -> jax.Array:
    """Tile (repeat) the pretrain-size table to (th, tw) — HF SAM3 tiles,
    it does not interpolate."""
    N, D = pos.shape[1], pos.shape[2]
    g = int(math.sqrt(N))
    if g == th and g == tw:
        return pos
    grid = pos.reshape(1, g, g, D)
    grid = jnp.tile(grid, (1, th // g + 1, tw // g + 1, 1))[:, :th, :tw]
    return grid.reshape(1, th * tw, D)


def vit_backbone(p: dict, cfg: ViTConfig, x: jax.Array) -> jax.Array:
    """[B, H, W, 3] -> [B, H/ps, W/ps, hidden]."""
    B = x.shape[0]
    ps = cfg.patch_size
    H, W = x.shape[1] // ps, x.shape[2] // ps
    w = p["embeddings"]["patch_embeddings"]["projection"]["weight"]
    h = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (ps, ps), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    h = h.reshape(B, H * W, -1)
    h = h + _tile_pos_embed(
        p["embeddings"]["position_embeddings"].astype(h.dtype), H, W)
    h = h.reshape(B, H, W, -1)
    h = _layer_norm(p["layer_norm"], h, cfg.layer_norm_eps)

    hd = cfg.hidden_size // cfg.num_attention_heads
    cos_g, sin_g = (jnp.asarray(a, h.dtype) for a in axial_rope_tables(
        hd, W, H, cfg.rope_theta))
    cos_w, sin_w = (jnp.asarray(a, h.dtype) for a in axial_rope_tables(
        hd, cfg.window_size, cfg.window_size, cfg.rope_theta))

    global_set = set(cfg.global_attn_indexes)
    for i in range(cfg.num_hidden_layers):
        h = _vit_block(p["layers"][str(i)], h, cfg, i in global_set,
                       cos_g, sin_g, cos_w, sin_w)
    return h


# --------------------------------------------------------------------- fpn


def conv_transpose_2x(p: dict, x: jax.Array) -> jax.Array:
    """ConvTranspose2d(k=2, s=2) as einsum + pixel shuffle (exact).

    Weight stays in torch layout (in, out, 2, 2)."""
    w = p["weight"].astype(x.dtype)                     # [C, O, 2, 2]
    B, H, W, C = x.shape
    O = w.shape[1]
    y = jnp.einsum("bhwc,coij->bhwijo", x, w)           # [B,H,W,2,2,O]
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, O)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _conv(p: dict, x: jax.Array, k: int, padding: int = 0,
          stride: int = 1, groups: int = 1) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _fpn_layer(p: dict, x: jax.Array, scale: float) -> jax.Array:
    if scale >= 4.0:
        x = conv_transpose_2x(p["scale_layers"]["0"], x)
        x = jax.nn.gelu(x)
        x = conv_transpose_2x(p["scale_layers"]["2"], x)
    elif scale >= 2.0:
        x = conv_transpose_2x(p["scale_layers"]["0"], x)
    elif scale <= 0.5:
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C).max(axis=(2, 4))
    x = _conv(p["proj1"], x, 1)
    return _conv(p["proj2"], x, 3, padding=1)


def fpn_neck(p: dict, cfg: VisionEncoderConfig,
             x: jax.Array) -> List[jax.Array]:
    return [
        _fpn_layer(p["fpn_layers"][str(i)], x, sf)
        for i, sf in enumerate(cfg.scale_factors)
    ]


def vision_encoder(p: dict, cfg: VisionEncoderConfig,
                   x: jax.Array) -> List[jax.Array]:
    """Backbone + FPN -> multi-scale features (finest first)."""
    feats = vit_backbone(p["backbone"], cfg.backbone_config, x)
    return fpn_neck(p["neck"], cfg, feats)


def sine_pos_2d(B: int, H: int, W: int, num_feats: int,
                dtype=jnp.float32) -> jax.Array:
    """DETR sine position encoding [B, H, W, 2*num_feats] (trace-time
    constant; reference position.py PositionEmbeddingSine)."""
    scale = 2 * math.pi
    y = (np.arange(H, dtype=np.float32) + 1)[None, :, None]
    x = (np.arange(W, dtype=np.float32) + 1)[None, None, :]
    y = np.broadcast_to(y, (1, H, W)) / (H + 1e-6) * scale
    x = np.broadcast_to(x, (1, H, W)) / (W + 1e-6) * scale
    dim_t = np.arange(num_feats, dtype=np.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / num_feats)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])],
                  -1).reshape(1, H, W, -1)
    py = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])],
                  -1).reshape(1, H, W, -1)
    pos = np.concatenate([py, px], axis=-1)
    return jnp.broadcast_to(jnp.asarray(pos, dtype), (B, H, W, pos.shape[-1]))
