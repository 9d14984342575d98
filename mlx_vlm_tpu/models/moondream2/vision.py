"""Moondream2 vision encoder + multi-crop reconstruction.

Role parity: reference mlx_vlm/models/moondream2/vision.py —
VisionEncoder:53 (linear patch embed + additive pos table, prenorm blocks),
VisionProjection:85 (concat[global, local-reconstruction] -> MLP),
_reconstruct_local_features:103 (margin-trimmed crop stitch + adaptive
avg-pool back to one grid).

TPU design: the encoder is a scan over stacked blocks with one batched
SDPA; all crops of all images run as ONE encoder batch.  The crop stitch /
adaptive pool is shape-dependent host-side numpy on encoder OUTPUT
(tiny: [G, G, D] tiles), keeping the device program static.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import layer_norm, linear


@dataclasses.dataclass
class VisionConfig:
    model_type: str = "moondream2_vision"
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    patch_size: int = 14
    crop_size: int = 378
    max_crops: int = 12
    overlap_margin: int = 4
    in_channels: int = 3
    proj_inner_dim: int = 8192
    proj_out_dim: int = 2048
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_dict(cls, d: dict) -> "VisionConfig":
        import inspect

        sig = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in d.items() if k in sig})


class MoondreamVisionTower:
    """params = {"encoder": {"patch_emb", "pos_emb", "blocks" (stacked),
    "post_ln"}, "proj_mlp": {"fc1", "fc2"}}."""

    def __init__(self, config: VisionConfig):
        self.config = config
        self.n_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5

    def encode(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        """[B, H, W, 3] crops -> [B, N_patches, D] encoder features."""
        c = self.config
        ep = params["encoder"]
        B, H, W, C = pixel_values.shape
        P = c.patch_size
        x = pixel_values.reshape(B, H // P, P, W // P, P, C).transpose(
            0, 1, 3, 5, 2, 4).reshape(B, (H // P) * (W // P), C * P * P)
        x = linear(ep["patch_emb"], x)
        x = x + ep["pos_emb"].astype(x.dtype)

        def block(h, lp):
            y = layer_norm(lp["ln1"], h, c.layer_norm_eps)
            B_, N, D = y.shape
            qkv = linear(lp["attn"]["qkv"], y).reshape(
                B_, N, 3, self.n_heads, self.head_dim)
            q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
            attn = jax.nn.softmax(
                (q.astype(jnp.float32) * self.scale)
                @ k.astype(jnp.float32).transpose(0, 1, 3, 2), axis=-1)
            o = (attn @ v.astype(jnp.float32)).astype(h.dtype)
            o = o.transpose(0, 2, 1, 3).reshape(B_, N, D)
            h = h + linear(lp["attn"]["proj"], o)
            y = layer_norm(lp["ln2"], h, c.layer_norm_eps)
            h = h + linear(lp["mlp"]["fc2"], jax.nn.gelu(
                linear(lp["mlp"]["fc1"], y), approximate=True))
            return h, None

        x, _ = jax.lax.scan(block, x, ep["blocks"])
        return layer_norm(ep["post_ln"], x, c.layer_norm_eps)

    def project(self, params: dict, global_feats: jax.Array,
                local_feats: jax.Array) -> jax.Array:
        """concat along channels -> 2-layer tanh-GELU MLP (reference
        VisionProjection:85)."""
        combined = jnp.concatenate([global_feats, local_feats], axis=-1)
        h = jax.nn.gelu(linear(params["proj_mlp"]["fc1"], combined),
                        approximate=True)
        return linear(params["proj_mlp"]["fc2"], h)

    def reconstruct_local(self, local: np.ndarray,
                          layout: Tuple[int, int]) -> np.ndarray:
        """[n_local, N, D] crop features -> [N, D] stitched + pooled grid
        (host numpy; reference _reconstruct_local_features:103)."""
        rows, cols = layout
        G = self.config.crop_size // self.config.patch_size
        m = self.config.overlap_margin
        grid_rows = []
        idx = 0
        for r in range(rows):
            row = []
            for c_ in range(cols):
                f = local[idx].reshape(G, G, -1)
                top = m if r > 0 else 0
                bot = G - (m if r < rows - 1 else 0)
                left = m if c_ > 0 else 0
                right = G - (m if c_ < cols - 1 else 0)
                row.append(f[top:bot, left:right])
                idx += 1
            grid_rows.append(np.concatenate(row, axis=1))
        full = np.concatenate(grid_rows, axis=0)
        H, W, D = full.shape
        pooled = np.zeros((G, G, D), full.dtype)
        for i in range(G):
            h0, h1 = round(i * H / G), max(round((i + 1) * H / G),
                                           round(i * H / G) + 1)
            for j in range(G):
                w0, w1 = round(j * W / G), max(round((j + 1) * W / G),
                                               round(j * W / G) + 1)
                pooled[i, j] = full[h0:h1, w0:w1].mean(axis=(0, 1))
        return pooled.reshape(G * G, D)

    @staticmethod
    def sanitize(weights: dict) -> dict:
        return {k: v for k, v in weights.items() if "position_ids" not in k}
