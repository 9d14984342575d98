"""ERNIE 4.5 VL DFNRope vision transformer.

Role parity: reference mlx_vlm/models/ernie4_5_moe_vl/vision.py — a
Qwen2-VL-style ViT with 2-D rotary embeddings, but: linear (not conv) patch
embed, quick_gelu fc1/fc2 MLP, a final LayerNorm `ln` instead of a patch
merger (merging happens in the resampler), and ONE attention segment per
image/video (cu_seqlens step = t*h*w, vision.py:296-300) rather than per
frame.

TPU design: per-image attention is a single batched SDPA with a segment-ID
block-diagonal mask (no Python loop over cu_seqlens splits); blocks run
under `lax.scan` over stacked weights.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import layer_norm, linear
from ...core.rope import apply_rope, default_inv_freq
from ...ops.attention import sdpa
from .config import VisionConfig

STACK_PREFIX = "blocks"


def ernie_vision_rotary_and_segments(
    grid_thw: np.ndarray, spatial_merge_size: int, head_dim: int
):
    """Host-side per-patch 2-D rotary freqs + per-IMAGE segment ids.

    Same position layout as qwen2_vl (merge-window-major h/w grids,
    reference vision.py:219-258) but segments span t*h*w (whole image or
    video clip attends to itself across frames, reference vision.py:296).
    """
    inv_freq = default_inv_freq(head_dim // 2, 10000.0)
    freqs_list, seg_list = [], []
    m = spatial_merge_size
    for seg, (t, h, w) in enumerate(np.asarray(grid_thw).astype(int)):
        hpos = np.repeat(np.arange(h)[:, None], w, axis=1)
        hpos = hpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
        wpos = np.repeat(np.arange(w)[None, :], h, axis=0)
        wpos = wpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
        pos = np.stack([hpos, wpos], axis=-1)  # [h*w, 2]
        pos = np.tile(pos, (t, 1))
        f = pos[..., None].astype(np.float64) * inv_freq[None, None, :]
        freqs_list.append(f.reshape(pos.shape[0], -1))
        seg_list.append(np.full(t * h * w, seg, np.int32))
    freqs = np.concatenate(freqs_list, axis=0).astype(np.float32)
    segs = np.concatenate(seg_list, axis=0)
    return freqs, segs


class VisionModel:
    def __init__(self, config: VisionConfig):
        self.config = config
        if config.model_type not in ("DFNRope_vision_transformer", "ernie4_5_moe_vl"):
            raise ValueError(f"Unsupported vision model type: {config.model_type}")
        self.num_heads = config.num_heads
        self.head_dim = config.embed_dim // config.num_heads
        self.scale = self.head_dim**-0.5

    def __call__(
        self,
        params: dict,
        pixel_values: jax.Array,  # [N, C*P*P] flattened patches
        rotary_freqs: jax.Array,  # [N, head_dim/2]
        segment_ids: jax.Array,  # [N]
    ) -> jax.Array:
        """Returns patch features [N, embed_dim] (resampler merges later)."""
        cfg = self.config
        w = params["patch_embed"]["proj"]["weight"]  # [E, C*P*P]
        h = jnp.dot(
            pixel_values.astype(w.dtype), w.T, preferred_element_type=jnp.float32
        ).astype(w.dtype)

        cos = jnp.cos(rotary_freqs)[None]
        sin = jnp.sin(rotary_freqs)[None]
        mask = (segment_ids[None, :] == segment_ids[:, None])[None, None]

        def block(h, lp):
            x = layer_norm(lp["norm1"], h, cfg.layer_norm_eps)
            x = self._attention(lp["attn"], x, cos, sin, mask)
            h = h + x
            x = layer_norm(lp["norm2"], h, cfg.layer_norm_eps)
            h = h + self._mlp(lp["mlp"], x)
            return h, None

        h, _ = jax.lax.scan(block, h, params[STACK_PREFIX])
        return layer_norm(params["ln"], h, cfg.layer_norm_eps)

    def _mlp(self, p, x):
        h = linear(p["fc1"], x)
        act = self.config.hidden_act
        if act == "quick_gelu":
            h = h * jax.nn.sigmoid(1.702 * h)
        elif act == "gelu":
            h = jax.nn.gelu(h, approximate=False)
        elif act == "silu":
            h = jax.nn.silu(h)
        else:
            raise ValueError(f"unsupported vision hidden_act: {act}")
        return linear(p["fc2"], h)

    def _attention(self, p, x, cos, sin, mask):
        N = x.shape[0]
        qkv = linear(p["qkv"], x).reshape(N, 3, self.num_heads, self.head_dim)
        q = qkv[:, 0].transpose(1, 0, 2)[None]
        k = qkv[:, 1].transpose(1, 0, 2)[None]
        v = qkv[:, 2].transpose(1, 0, 2)[None]
        q, k = apply_rope(q, k, cos, sin)
        out = sdpa(q, k, v, self.scale, mask)
        out = out[0].transpose(1, 0, 2).reshape(N, -1)
        return linear(p["proj"], out)

    @staticmethod
    def sanitize(weights: dict) -> dict:
        return {k: v for k, v in weights.items() if "position_ids" not in k}
