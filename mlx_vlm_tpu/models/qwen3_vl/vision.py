"""Qwen3-VL vision tower (ViT + interpolated learned pos-embeds + deepstack).

Role parity: reference mlx_vlm/models/qwen3_vl/vision.py — PatchEmbed
(Conv3d):70, PatchMerger(linear_fc1/fc2, optional postshuffle norm):106,
fast_pos_embed_interpolate (bilinear over the learned grid):299,
deepstack mergers at deepstack_visual_indexes:395-420.

TPU design:
- Conv3d(stride==kernel) patch embed is one MXU matmul over flattened
  patches (same as qwen2_vl).
- The bilinear pos-embed interpolation is host-side index/weight math (it
  depends only on grid_thw); the device does 4 gathers + a weighted sum.
- Blocks run under lax.scan, split into segments at the (static) deepstack
  indexes so intermediate hidden states are captured without materializing
  every layer's activations.
- Per-frame attention is one batched SDPA with a segment-ID mask instead of
  the reference's Python loop over cu_seqlens splits (vision.py:152-159).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import layer_norm, linear
from ...ops.attention import sdpa
from ..qwen2_vl.vision import vision_rotary_and_segments  # same 2-D rope scheme
from .config import VisionConfig

STACK_PREFIX = "blocks"


def _merge_permute(x: np.ndarray, h: int, w: int, m: int) -> np.ndarray:
    """Raster order -> spatial-merge-block order (leading axis h*w)."""
    rest = x.shape[1:]
    return (
        x.reshape(h // m, m, w // m, m, *rest)
        .transpose(0, 2, 1, 3, *range(4, 4 + len(rest)))
        .reshape(h * w, *rest)
    )


def pos_embed_interp_aux(
    grid_thw: np.ndarray, num_grid_per_side: int, merge: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side bilinear interpolation plan for the learned pos-embed grid.

    For each patch (in spatial-merge-block order, tiled over frames) returns
    4 source indices into the [side*side] embedding table and their weights:
    (idx [4, N] int32, weights [4, N] float32).
    Reference: vision.py:fast_pos_embed_interpolate:299-377.
    """
    idx_all: List[np.ndarray] = []
    w_all: List[np.ndarray] = []
    side = num_grid_per_side
    for t, h, w in np.asarray(grid_thw).astype(int):
        h_idxs = np.linspace(0, side - 1, h)
        w_idxs = np.linspace(0, side - 1, w)
        hf = h_idxs.astype(np.int32)
        wf = w_idxs.astype(np.int32)
        hc = np.minimum(hf + 1, side - 1)
        wc = np.minimum(wf + 1, side - 1)
        dh = (h_idxs - hf).astype(np.float32)
        dw = (w_idxs - wf).astype(np.float32)
        idx = np.stack(
            [
                (hf[:, None] * side + wf[None, :]),
                (hf[:, None] * side + wc[None, :]),
                (hc[:, None] * side + wf[None, :]),
                (hc[:, None] * side + wc[None, :]),
            ]
        ).reshape(4, h * w)
        wgt = np.stack(
            [
                (1 - dh)[:, None] * (1 - dw)[None, :],
                (1 - dh)[:, None] * dw[None, :],
                dh[:, None] * (1 - dw)[None, :],
                dh[:, None] * dw[None, :],
            ]
        ).reshape(4, h * w)
        # to merge-block order, then tile over frames
        idx = _merge_permute(idx.T, h, w, merge).T
        wgt = _merge_permute(wgt.T, h, w, merge).T
        idx_all.append(np.tile(idx, (1, t)))
        w_all.append(np.tile(wgt, (1, t)))
    return (
        np.concatenate(idx_all, axis=1).astype(np.int32),
        np.concatenate(w_all, axis=1).astype(np.float32),
    )


class VisionModel:
    def __init__(self, config: VisionConfig):
        self.config = config
        self.num_heads = config.num_heads
        self.head_dim = config.hidden_size // config.num_heads
        self.scale = self.head_dim**-0.5
        self.merge_unit = config.spatial_merge_size**2
        self.num_grid_per_side = int(config.num_position_embeddings**0.5)
        self.ds_indexes = tuple(config.deepstack_visual_indexes)

    def __call__(
        self,
        params: dict,
        pixel_values: jax.Array,  # [N, C*T*P*P]
        rotary_freqs: jax.Array,  # [N, head_dim/2]
        segment_ids: jax.Array,  # [N]
        pos_idx: jax.Array,  # [4, N]
        pos_weights: jax.Array,  # [4, N]
    ):
        """Returns (features [N/merge_unit, out_D], deepstack [n_ds, N/mu, out_D])."""
        cfg = self.config
        w = params["patch_embed"]["proj"]["weight"]  # [E, C*T*P*P]
        h = jnp.dot(
            pixel_values.astype(w.dtype), w.T, preferred_element_type=jnp.float32
        ).astype(w.dtype)
        if "bias" in params["patch_embed"]["proj"]:
            h = h + params["patch_embed"]["proj"]["bias"]

        table = params["pos_embed"]["weight"]  # [side*side, E]
        pos = jnp.einsum(
            "kn,knd->nd",
            pos_weights.astype(jnp.float32),
            jnp.take(table, pos_idx, axis=0).astype(jnp.float32),
        )
        h = h + pos.astype(h.dtype)

        cos = jnp.cos(rotary_freqs)[None]
        sin = jnp.sin(rotary_freqs)[None]
        mask = (segment_ids[None, :] == segment_ids[:, None])[None, None]

        def block(h, lp):
            x = layer_norm(lp["norm1"], h, cfg.layer_norm_eps)
            x = self._attention(lp["attn"], x, cos, sin, mask)
            h = h + x
            x = layer_norm(lp["norm2"], h, cfg.layer_norm_eps)
            x = linear(lp["mlp"]["linear_fc2"],
                       jax.nn.gelu(linear(lp["mlp"]["linear_fc1"], x),
                                   approximate=True))
            return h + x, None

        # scan in segments bounded by the deepstack capture points
        bounds = [0] + [i + 1 for i in self.ds_indexes] + [cfg.depth]
        ds_feats = []
        for s in range(len(bounds) - 1):
            lo, hi = bounds[s], bounds[s + 1]
            if hi > lo:
                seg = jax.tree.map(lambda a: a[lo:hi], params[STACK_PREFIX])
                h, _ = jax.lax.scan(block, h, seg)
            if s < len(self.ds_indexes):
                ds_feats.append(
                    self._merger(params["deepstack_merger_list"][str(s)], h,
                                 postshuffle=True)
                )
        out = self._merger(params["merger"], h, postshuffle=False)
        if ds_feats:
            return out, jnp.stack(ds_feats)
        return out, None

    def _merger(self, mp, h, *, postshuffle: bool):
        E = self.config.hidden_size
        if postshuffle:
            x = h.reshape(-1, self.merge_unit * E)
            x = layer_norm(mp["norm"], x, 1e-6)
        else:
            x = layer_norm(mp["norm"], h, 1e-6).reshape(-1, self.merge_unit * E)
        x = jax.nn.gelu(linear(mp["linear_fc1"], x), approximate=False)
        return linear(mp["linear_fc2"], x)

    def _attention(self, p, x, cos, sin, mask):
        from ...core.rope import apply_rope

        N = x.shape[0]
        qkv = linear(p["qkv"], x).reshape(N, 3, self.num_heads, self.head_dim)
        q = qkv[:, 0].transpose(1, 0, 2)[None]
        k = qkv[:, 1].transpose(1, 0, 2)[None]
        v = qkv[:, 2].transpose(1, 0, 2)[None]
        q, k = apply_rope(q, k, cos, sin)
        out = sdpa(q, k, v, self.scale, mask)
        out = out[0].transpose(1, 0, 2).reshape(N, -1)
        return linear(p["proj"], out)

    def aux_inputs(self, grid_thw: np.ndarray) -> dict:
        freqs, segs = vision_rotary_and_segments(
            grid_thw, self.config.spatial_merge_size, self.head_dim
        )
        idx, wgt = pos_embed_interp_aux(
            grid_thw, self.num_grid_per_side, self.config.spatial_merge_size
        )
        return {
            "rotary_freqs": freqs,
            "segment_ids": segs,
            "pos_idx": idx,
            "pos_weights": wgt,
        }

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "position_ids" in k:
                continue
            if "patch_embed.proj.weight" in k and v.ndim == 5:
                v = v.reshape(v.shape[0], -1)  # [E, C, T, P, P] -> [E, CTPP]
            out[k] = v
        return out
