"""Gemma-4 vision encoder: RMSNorm ViT with 2-D rope and position pooling.

Role parity: reference mlx_vlm/models/gemma4/vision.py —
VisionPatchEmbedder:282 (linear patchify on [-1,1] pixels + 2-axis learned
position table), apply_multidimensional_rope:103 (per-axis rotate_half over
head-dim partitions), VisionAttention:161 (q/k RMSNorm + scale-free v-norm,
scale 1.0), sandwich-norm blocks:252, VisionPooler:350 (position-bucketed
average to default_output_length, scaled by sqrt(D)).

TPU design: single static shape per image size — patchify is a reshape, the
pooler's one-hot bucket matmul is a tiny einsum, and the whole tower is a
scan over stacked blocks.  v1 handles whole (unpadded) images; pan-and-scan
style crops enter as extra batch rows.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import linear, rms_norm
from ...ops.attention import sdpa


@dataclasses.dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "gemma4_vision"
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    head_dim: int = 72
    patch_size: int = 16
    position_embedding_size: int = 64
    pooling_kernel_size: int = 2
    default_output_length: int = 256
    rms_norm_eps: float = 1e-6
    rope_theta: float = 100.0
    rope_parameters: Optional[dict] = None
    standardize: bool = False

    def __post_init__(self):
        if self.rope_parameters:
            self.rope_theta = self.rope_parameters.get("rope_theta",
                                                       self.rope_theta)


def rope_2d(x: jax.Array, positions: jax.Array, base: float) -> jax.Array:
    """Per-axis rotate-half rope over head-dim partitions (reference
    apply_multidimensional_rope:103).  x [B, L, N, H], positions [B, L, 2].
    """
    H = x.shape[-1]
    ndim = positions.shape[-1]
    cpd = 2 * (H // (2 * ndim))
    half = cpd // 2
    parts = []
    for d in range(ndim):
        xp = x[..., d * cpd:(d + 1) * cpd]
        expo = (2.0 / cpd) * jnp.arange(half, dtype=jnp.float32)
        timescale = jnp.power(base, expo)
        ang = positions[..., d:d + 1].astype(jnp.float32) / timescale
        cos = jnp.concatenate([jnp.cos(ang)] * 2, -1)[..., None, :]
        sin = jnp.concatenate([jnp.sin(ang)] * 2, -1)[..., None, :]
        x1, x2 = xp[..., :half], xp[..., half:]
        rot = jnp.concatenate([-x2, x1], axis=-1)
        parts.append(xp * cos.astype(x.dtype) + rot * sin.astype(x.dtype))
    if ndim * cpd < H:
        parts.append(x[..., ndim * cpd:])
    return jnp.concatenate(parts, axis=-1)


def _rms_noscale(x, eps):
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
            ).astype(x.dtype)


class Gemma4VisionTower:
    """params = {"patch_embedder": {input_proj, position_embedding_table},
    "encoder": {"layers" (stacked)}, optional std_bias/std_scale}."""

    def __init__(self, config: VisionConfig):
        self.config = config

    def __call__(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        """[B, C, H, W] pixels in [0, 1] -> pooled tokens [B, T, D]."""
        c = self.config
        B, C, H, W = pixel_values.shape
        p = c.patch_size
        pH, pW = H // p, W // p
        patches = pixel_values.reshape(B, C, pH, p, pW, p).transpose(
            0, 2, 4, 3, 5, 1).reshape(B, pH * pW, C * p * p)
        patches = 2 * (patches - 0.5)
        pe = params["patch_embedder"]
        h = linear(pe["input_proj"], patches.astype(
            pe["input_proj"]["weight"].dtype))

        gx, gy = np.meshgrid(np.arange(pW), np.arange(pH), indexing="xy")
        pos_np = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.int32)
        positions = jnp.broadcast_to(jnp.asarray(pos_np)[None],
                                     (B, pH * pW, 2))
        table = pe["position_embedding_table"]  # [2, P, D]
        pos_emb = (jnp.take(table[0], positions[..., 0], axis=0)
                   + jnp.take(table[1], positions[..., 1], axis=0))
        h = h + pos_emb.astype(h.dtype)

        nh, nkv, hd = (c.num_attention_heads, c.num_key_value_heads,
                       c.head_dim)
        eps = c.rms_norm_eps

        def block(h, lp):
            x = rms_norm(lp["input_layernorm"], h, eps)
            ap = lp["self_attn"]
            L = x.shape[1]
            q = linear(ap["q_proj"], x).reshape(B, L, nh, hd)
            k = linear(ap["k_proj"], x).reshape(B, L, nkv, hd)
            v = linear(ap["v_proj"], x).reshape(B, L, nkv, hd)
            q = rms_norm(ap["q_norm"], q, eps)
            k = rms_norm(ap["k_norm"], k, eps)
            v = _rms_noscale(v, eps)
            q = rope_2d(q, positions, c.rope_theta).transpose(0, 2, 1, 3)
            k = rope_2d(k, positions, c.rope_theta).transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
            o = sdpa(q, k, v, 1.0, None)
            o = o.transpose(0, 2, 1, 3).reshape(B, L, -1)
            o = linear(ap["o_proj"], o)
            h = h + rms_norm(lp["post_attention_layernorm"], o, eps)
            f = rms_norm(lp["pre_feedforward_layernorm"], h, eps)
            m = lp["mlp"]
            f = linear(m["down_proj"], jax.nn.gelu(
                linear(m["gate_proj"], f), approximate=True)
                * linear(m["up_proj"], f))
            h = h + rms_norm(lp["post_feedforward_layernorm"], f, eps)
            return h, None

        h, _ = jax.lax.scan(block, h, params["encoder"]["layers"])

        # position-bucketed average pooling (reference VisionPooler:350)
        k = c.pooling_kernel_size
        out_len = (pH * pW) // (k * k)
        kx = pos_np[:, 0] // k
        ky = pos_np[:, 1] // k
        bucket = kx + (pW // k) * ky  # [L]
        onehot = jnp.asarray(
            np.eye(out_len, dtype=np.float32)[bucket] / (k * k))  # [L, T]
        pooled = jnp.einsum("Lt,bLd->btd", onehot,
                            h.astype(jnp.float32)).astype(h.dtype)
        pooled = pooled * (c.hidden_size ** 0.5)
        if c.standardize and "std_bias" in params:
            pooled = (pooled - params["std_bias"]) * params["std_scale"]
        return pooled

    @staticmethod
    def sanitize(weights: dict) -> dict:
        # drop unused activation-clipping calibration params
        return {k: v for k, v in weights.items()
                if not any(s in k for s in ("input_max", "input_min",
                                            "output_max", "output_min"))}
