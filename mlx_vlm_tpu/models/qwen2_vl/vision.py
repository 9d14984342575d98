"""Qwen2-VL vision tower (ViT with 2-D rotary embeddings and patch merger).

Role parity: reference mlx_vlm/models/qwen2_vl/vision.py.

TPU design decisions vs the reference:
- The Conv3d patch embed has stride == kernel, so it *is* a matmul over the
  flattened (C*T*P*P) patch vector; we run it as a single MXU matmul instead
  of a convolution (vision.py:68-102 in the reference uses Conv3d).
- Per-image attention is one batched SDPA with a segment-ID block-diagonal
  mask instead of the reference's Python loop over `cu_seqlens` splits
  (vision.py:148-158) — no dynamic shapes, one kernel launch for all images.
- Transformer blocks run under `lax.scan` over stacked weights.
- 2-D rotary tables and segment ids are computed host-side (numpy) from
  `grid_thw`, which is host metadata anyway.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import gelu_mlp, layer_norm, linear
from ...core.rope import default_inv_freq
from ...ops.attention import sdpa
from .config import VisionConfig

STACK_PREFIX = "blocks"  # stacked-module prefix inside this tower


def vision_rotary_and_segments(grid_thw: np.ndarray, spatial_merge_size: int, head_dim: int):
    """Host-side: per-patch 2-D rotary freqs + segment ids from grid_thw.

    Returns (freqs [N, head_dim/2] fp32, segment_ids [N] int32) where segments
    separate (image, frame) pairs, matching reference cu_seqlens semantics
    (vision.py:269-279: seqlen = h*w repeated t times per image).
    """
    inv_freq = default_inv_freq(head_dim // 2, 10000.0)  # [head_dim/4]
    freqs_list = []
    seg_list = []
    seg = 0
    m = spatial_merge_size
    for t, h, w in np.asarray(grid_thw).astype(int):
        hpos = np.repeat(np.arange(h)[:, None], w, axis=1)
        hpos = hpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
        wpos = np.repeat(np.arange(w)[None, :], h, axis=0)
        wpos = wpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
        pos = np.stack([hpos, wpos], axis=-1)  # [h*w, 2]
        pos = np.tile(pos, (t, 1))  # [t*h*w, 2]
        f = pos[..., None].astype(np.float64) * inv_freq[None, None, :]
        freqs_list.append(f.reshape(pos.shape[0], -1))  # [t*h*w, head_dim/2]
        for _ in range(t):
            seg_list.append(np.full(h * w, seg, np.int32))
            seg += 1
    freqs = np.concatenate(freqs_list, axis=0).astype(np.float32)
    segs = np.concatenate(seg_list, axis=0)
    return freqs, segs


class VisionModel:
    def __init__(self, config: VisionConfig):
        self.config = config
        if config.model_type not in ("qwen2_vl",):
            raise ValueError(f"Unsupported vision model type: {config.model_type}")
        self.num_heads = config.num_heads
        self.head_dim = config.embed_dim // config.num_heads
        self.scale = self.head_dim**-0.5
        self.merge_unit = config.spatial_merge_size**2

    def __call__(
        self,
        params: dict,
        pixel_values: jax.Array,  # [N, C*T*P*P] flattened patches
        rotary_freqs: jax.Array,  # [N, head_dim/2]
        segment_ids: jax.Array,  # [N]
    ) -> jax.Array:
        """Returns merged features [N / merge_unit, hidden_size]."""
        cfg = self.config
        E = cfg.embed_dim

        # Patch embed: Conv3d(stride=kernel) == matmul over flattened patches.
        w = params["patch_embed"]["proj"]["weight"]  # [E, C*T*P*P] (sanitized)
        h = jnp.dot(
            pixel_values.astype(w.dtype), w.T, preferred_element_type=jnp.float32
        ).astype(w.dtype)

        cos = jnp.cos(rotary_freqs)[None]  # [1, N, head_dim/2]
        sin = jnp.sin(rotary_freqs)[None]
        mask = segment_ids[None, :] == segment_ids[:, None]
        mask = mask[None, None]  # [1, 1, N, N]

        def block(h, lp):
            x = layer_norm(lp["norm1"], h, cfg.layer_norm_eps)
            x = self._attention(lp["attn"], x, cos, sin, mask)
            h = h + x
            x = layer_norm(lp["norm2"], h, cfg.layer_norm_eps)
            h = h + gelu_mlp(lp["mlp"], x, approximate=True)
            return h, None

        h, _ = jax.lax.scan(block, h, params[STACK_PREFIX])

        # Patch merger (reference vision.py:105-120): LN -> group 2x2 -> MLP.
        mp = params["merger"]
        x = layer_norm(mp["ln_q"], h, 1e-6)
        x = x.reshape(-1, self.merge_unit * E)
        x = linear(mp["mlp"]["0"], x)
        x = jax.nn.gelu(x, approximate=False)
        x = linear(mp["mlp"]["2"], x)
        return x

    def _attention(self, p, x, cos, sin, mask):
        N = x.shape[0]
        qkv = linear(p["qkv"], x).reshape(N, 3, self.num_heads, self.head_dim)
        q, k, v = (
            qkv[:, 0].transpose(1, 0, 2)[None],  # [1, heads, N, hd]
            qkv[:, 1].transpose(1, 0, 2)[None],
            qkv[:, 2].transpose(1, 0, 2)[None],
        )
        from ...core.rope import apply_rope

        q, k = apply_rope(q, k, cos, sin)
        out = sdpa(q, k, v, self.scale, mask)
        out = out[0].transpose(1, 0, 2).reshape(N, -1)
        return linear(p["proj"], out)

    @staticmethod
    def sanitize(weights: dict) -> dict:
        """Flatten the conv3d patch-embed weight to a matmul weight.

        Reference vision.py:292-310 transposes torch conv layout for MLX; we
        instead reshape [E, C, T, P, P] -> [E, C*T*P*P].
        """
        out = {}
        for k, v in weights.items():
            if "position_ids" in k:
                continue
            if "patch_embed.proj.weight" in k:
                if v.ndim == 5:
                    # torch layout [E, C, T, P, P]
                    v = v.reshape(v.shape[0], -1)
                elif v.ndim != 2:
                    raise ValueError(f"unexpected patch_embed weight shape {v.shape}")
            out[k] = v
        return out
