"""Pixtral vision tower: variable-size ViT with 2-D rope + SwiGLU blocks.

Role parity: reference mlx_vlm/models/pixtral/vision.py —
PixtralVisionModel:208, position_ids_in_meshgrid:25,
generate_block_attention_mask:37 (per-image block mask),
PixtralRotaryEmbedding:176 (h uses even freqs, w odd freqs).

TPU design: images are patchified host-side into one flattened sequence
(variable sizes welcome — no padded 2-D canvases); per-image isolation is a
segment mask; the 2-D rotary table rows are gathered host-side into dense
[N, head_dim/2] freqs, applied with the shared fused rope.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import linear, rms_norm
from ...core.rope import apply_rope
from ...ops.attention import sdpa
from .config import VisionConfig

STACK_PREFIX = "transformer.layers"


def pixtral_vision_aux(image_grids, cfg: VisionConfig):
    """Host-side: per-patch 2-D rope freqs + segment ids.

    image_grids: list of (h_patches, w_patches) per image.
    """
    d = cfg.head_dim
    base = cfg.rope_theta
    inv = 1.0 / (base ** (np.arange(0, d, 2, dtype=np.float64) / d))  # [d/2]
    freq_h = inv[0::2]  # even-index freqs drive the row coordinate
    freq_w = inv[1::2]
    freqs_list, segs = [], []
    for s, (h, w) in enumerate(image_grids):
        hh = np.repeat(np.arange(h), w)
        ww = np.tile(np.arange(w), h)
        fh = hh[:, None] * freq_h[None, :]  # [N, d/4]
        fw = ww[:, None] * freq_w[None, :]
        # reference concatenates the h-block then the w-block along the freq
        # axis (vision.py:190-198), then duplicates for cos/sin
        f = np.concatenate([fh, fw], axis=-1)  # [N, d/2]
        freqs_list.append(f)
        segs.append(np.full(h * w, s, np.int32))
    return (
        np.concatenate(freqs_list, 0).astype(np.float32),
        np.concatenate(segs, 0),
    )


class VisionModel:
    def __init__(self, config: VisionConfig):
        self.config = config
        if config.model_type not in ("pixtral",):
            raise ValueError(f"Unsupported vision model type: {config.model_type}")
        self.num_heads = config.num_attention_heads
        self.head_dim = config.head_dim
        self.scale = self.head_dim**-0.5

    def __call__(
        self,
        params: dict,
        pixel_values: jax.Array,  # [N, C*P*P] flattened patches
        rotary_freqs: jax.Array,  # [N, head_dim/2]
        segment_ids: jax.Array,  # [N]
    ) -> jax.Array:
        cfg = self.config
        w = params["patch_conv"]["weight"]  # [E, C*P*P]
        h = jnp.dot(
            pixel_values.astype(w.dtype), w.T, preferred_element_type=jnp.float32
        ).astype(w.dtype)
        h = rms_norm(params["ln_pre"], h, cfg.rms_norm_eps)
        cos = jnp.cos(rotary_freqs)[None]
        sin = jnp.sin(rotary_freqs)[None]
        mask = (segment_ids[None, :] == segment_ids[:, None])[None, None]

        def block(h, lp):
            x = rms_norm(lp["attention_norm"], h, cfg.rms_norm_eps)
            x = self._attention(lp["attention"], x, cos, sin, mask)
            h = h + x
            x = rms_norm(lp["ffn_norm"], h, cfg.rms_norm_eps)
            g = linear(lp["feed_forward"]["gate_proj"], x)
            u = linear(lp["feed_forward"]["up_proj"], x)
            h = h + linear(lp["feed_forward"]["down_proj"], jax.nn.silu(g) * u)
            return h, None

        h, _ = jax.lax.scan(block, h, params["transformer"]["layers"])
        return h

    def _attention(self, p, x, cos, sin, mask):
        N = x.shape[0]
        q = linear(p["q_proj"], x).reshape(N, self.num_heads, self.head_dim)
        k = linear(p["k_proj"], x).reshape(N, self.num_heads, self.head_dim)
        v = linear(p["v_proj"], x).reshape(N, self.num_heads, self.head_dim)
        q = q.transpose(1, 0, 2)[None]
        k = k.transpose(1, 0, 2)[None]
        v = v.transpose(1, 0, 2)[None]
        q, k = apply_rope(q, k, cos, sin)
        out = sdpa(q, k, v, self.scale, mask)
        out = out[0].transpose(1, 0, 2).reshape(N, -1)
        return linear(p["o_proj"], out)

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "position_ids" in k:
                continue
            if "patch_conv.weight" in k and v.ndim == 4:
                v = v.reshape(v.shape[0], -1)
            out[k] = v
        return out
