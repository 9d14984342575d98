"""RADIO ViT backbone for Nemotron-Nano Omni.

Role parity: reference mlx_vlm/models/nemotron_h_nano_omni/vision.py —
InputConditioner:16, ClsToken:26, ViTPatchGenerator:47 (linear patch +
video embedder, CPE pos-embed resize, cls/register prepend), Block:186,
RadioBackbone:198, RadioModel:221 (features skip cls+registers).

TPU design: patchify is a reshape (NCHW -> [B, gh*gw, C*p*p]) + one
matmul; the transformer is a single lax.scan over stacked blocks; the
CPE position-embedding interpolation runs inside the trace with
jax.image.resize (shapes are static per compile).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ...core.layers import layer_norm, linear


@dataclasses.dataclass
class VisionConfig:
    model_type: str = "radio"
    args: Optional[dict] = None
    hidden_size: int = 1280
    num_hidden_layers: int = 32
    num_attention_heads: int = 16
    intermediate_size: int = 5120
    image_size: int = 224
    patch_size: int = 16
    max_resolution: int = 2048
    video_temporal_patch_size: int = 2

    @classmethod
    def from_dict(cls, d: dict) -> "VisionConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in (d or {}).items() if k in fields})

    @property
    def num_cls_tokens(self) -> int:
        args = self.args or {}
        teachers = args.get("teachers", [])
        if args.get("cls_token_per_teacher", True) and teachers:
            return len({t["name"] for t in teachers})
        return 1

    @property
    def num_registers(self) -> int:
        rm = (self.args or {}).get("register_multiple")
        if rm:
            return rm - (self.num_cls_tokens % rm)
        return 0

    @property
    def num_skip(self) -> int:
        return self.num_cls_tokens + self.num_registers


def _im_to_patches(x: jax.Array, patch: int) -> jax.Array:
    """[B, C, H, W] -> [B, gh*gw, C*p*p] (reference _im_to_patches:96)."""
    B, C, H, W = x.shape
    gh, gw = H // patch, W // patch
    x = x.reshape(B, C, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(B, gh * gw, C * patch * patch)


class VisionModel:
    def __init__(self, config: VisionConfig):
        self.config = config

    # ---------------------------------------------------------- pos embed
    def _pos_embed(self, params: dict, gh: int, gw: int) -> jax.Array:
        """CPE bilinear resize of the [1, R*C, D] table to the input grid
        (reference _get_pos_embeddings:106)."""
        cfg = self.config
        pe = params["pos_embed"].astype(jnp.float32)
        rows = cols = cfg.max_resolution // cfg.patch_size
        if (gh, gw) == (rows, cols):
            return pe
        pe = pe.reshape(rows, cols, -1)
        input_dims = (cfg.image_size // cfg.patch_size,
                      cfg.image_size // cfg.patch_size)
        cpe_mode = (rows, cols) != input_dims
        if cpe_mode:
            m = max(gh, gw)
            pe = jax.image.resize(pe, (m, m, pe.shape[-1]), "bilinear",
                                  antialias=False)
        pe = pe[:gh, :gw]
        if pe.shape[:2] != (gh, gw):
            pe = jax.image.resize(pe, (gh, gw, pe.shape[-1]), "bilinear",
                                  antialias=False)
        return pe.reshape(1, gh * gw, -1)

    # -------------------------------------------------------------- patch
    def _patch_generator(self, params: dict, x: jax.Array,
                         use_video_embedder: bool) -> jax.Array:
        cfg = self.config
        pg = params["patch_generator"]
        patches = _im_to_patches(x, cfg.patch_size)
        key = "video_embedder" if use_video_embedder else "embedder"
        patches = linear(pg[key], patches)
        gh = x.shape[-2] // cfg.patch_size
        gw = x.shape[-1] // cfg.patch_size
        patches = patches + self._pos_embed(pg, gh, gw).astype(patches.dtype)
        tok = pg["cls_token"]["token"].astype(patches.dtype)
        tok = jnp.broadcast_to(tok[None], (patches.shape[0],) + tok.shape)
        return jnp.concatenate([tok, patches], axis=1)

    # ------------------------------------------------------------- blocks
    def _encode(self, params: dict, x: jax.Array) -> jax.Array:
        cfg = self.config
        H = cfg.num_attention_heads
        hd = cfg.hidden_size // H
        scale = hd ** -0.5

        def block(h, lp):
            B, S, D = h.shape
            y = layer_norm(lp["norm1"], h)
            qkv = linear(lp["attn"]["qkv"], y)
            qkv = qkv.reshape(B, S, 3, H, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
            o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
            h = h + linear(lp["attn"]["proj"], o)
            y = layer_norm(lp["norm2"], h)
            y = linear(lp["mlp"]["fc2"],
                       jax.nn.gelu(linear(lp["mlp"]["fc1"], y),
                                   approximate=False))
            return h + y, None

        x, _ = jax.lax.scan(block, x, params["blocks"])
        return x

    # ------------------------------------------------------------ forward
    def __call__(self, params: dict, pixel_values: jax.Array,
                 use_video_embedder: bool = False) -> jax.Array:
        """[B, C, H, W] (conditioned) -> patch features [B, gh*gw, D]."""
        # input_conditioner params are checkpoint passthrough only — the
        # reference never applies them (normalization lives in the image
        # processor; reference vision.py RadioModel.__call__:227)
        m = params["radio_model"]["model"]
        y = self._patch_generator(m, pixel_values, use_video_embedder)
        y = self._encode(m, y)
        return y[:, self.config.num_skip:]


__all__ = ["VisionConfig", "VisionModel"]
