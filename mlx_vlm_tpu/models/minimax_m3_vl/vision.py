"""MiniMax M3 VL vision tower (CLIP-style ViT with 3-axis rotary).

Role parity: reference mlx_vlm/models/minimax_m3_vl/vision.py —
MiniMaxVisionTransformer (:187, _rotary_pos_emb with t/h/w axis freqs),
per-segment attention splits (:107), pre_layrnorm, quick_gelu MLP.

TPU design: 3-axis rotary freqs and segment ids are host-side numpy from
grid_thw; per-segment attention is one batched SDPA with a segment-ID
block-diagonal mask; encoder blocks run under `lax.scan`, optionally
capturing per-layer hidden states (ys) for vision_feature_layer != -1.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import layer_norm, linear
from ...core.rope import apply_rope
from ...ops.attention import sdpa
from .config import VisionConfig

STACK_PREFIX = "encoder.layers"


def minimax_vision_rotary_and_segments(
    grid_thw: np.ndarray,
    spatial_merge_size: int,
    head_dim: int,
    rope_theta: float,
    max_frames: Optional[int] = None,
):
    """Host-side per-patch 3-axis (t, h, w) rotary freqs + segment ids.

    Matches reference _rotary_pos_emb (vision.py:196-233): positions are
    merge-window-major; each axis contributes axis_dim/2 frequencies; video
    clips longer than vision_segment_max_frames split into separate
    attention segments (vision.py:238-247).
    """
    rope_dims = 2 * (head_dim // 2)
    axis_dim = 2 * ((rope_dims // 3) // 2)
    inv = 1.0 / (
        rope_theta ** (np.arange(0, axis_dim, 2, dtype=np.float64) / axis_dim)
    )
    m = spatial_merge_size
    segments = []
    for t, h, w in np.asarray(grid_thw).astype(int):
        if max_frames is None or t <= max_frames:
            segments.append((t, h, w))
        else:
            for s0 in range(0, t, max_frames):
                segments.append((min(max_frames, t - s0), h, w))
    freqs_list, seg_list = [], []
    for seg, (t, h, w) in enumerate(segments):
        mh, mw = h // m, w // m
        tt = np.broadcast_to(
            np.arange(t)[:, None, None, None, None], (t, mh, mw, m, m)
        ).reshape(-1)
        hh = np.broadcast_to(
            (np.arange(mh)[None, :, None, None, None] * m
             + np.arange(m)[None, None, None, :, None]),
            (t, mh, mw, m, m),
        ).reshape(-1)
        ww = np.broadcast_to(
            (np.arange(mw)[None, None, :, None, None] * m
             + np.arange(m)[None, None, None, None, :]),
            (t, mh, mw, m, m),
        ).reshape(-1)
        f = np.concatenate(
            [c[:, None].astype(np.float64) * inv[None, :] for c in (tt, hh, ww)],
            axis=-1,
        )  # [N, 3 * axis_dim/2]
        freqs_list.append(f)
        seg_list.append(np.full(t * h * w, seg, np.int32))
    freqs = np.concatenate(freqs_list, axis=0).astype(np.float32)
    segs = np.concatenate(seg_list, axis=0)
    return freqs, segs


class VisionModel:
    def __init__(self, config: VisionConfig):
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads

    def __call__(
        self,
        params: dict,
        pixel_values: jax.Array,  # [N, C*T*P*P]
        rotary_freqs: jax.Array,  # [N, rot_dim/2]
        segment_ids: jax.Array,  # [N]
        feature_layer: int = -1,
    ) -> jax.Array:
        """Returns hidden states [N, hidden]; feature_layer indexes the
        per-layer outputs (-1 = final, counting embeddings as layer 0 like
        the reference's output_hidden_states tuple)."""
        cfg = self.config
        p = params["vision_model"]
        w = p["embeddings"]["patch_embedding"]["weight"]  # [E, C*T*P*P]
        h = jnp.dot(
            pixel_values.astype(w.dtype), w.T, preferred_element_type=jnp.float32
        ).astype(w.dtype)
        h = layer_norm(p["pre_layrnorm"], h, cfg.layer_norm_eps)

        cos = jnp.cos(rotary_freqs)[None]
        sin = jnp.sin(rotary_freqs)[None]
        mask = (segment_ids[None, :] == segment_ids[:, None])[None, None]
        scale = self.head_dim**-0.5

        def block(h, lp):
            x = layer_norm(lp["layer_norm1"], h, cfg.layer_norm_eps)
            x = self._attention(lp["self_attn"], x, cos, sin, mask, scale)
            h = h + x
            x = layer_norm(lp["layer_norm2"], h, cfg.layer_norm_eps)
            h = h + self._mlp(lp["mlp"], x)
            return h, h

        h_final, ys = jax.lax.scan(block, h, p["encoder"]["layers"])
        if feature_layer in (-1, cfg.num_hidden_layers):
            return h_final
        if feature_layer == 0:
            return h
        idx = feature_layer if feature_layer > 0 else cfg.num_hidden_layers + feature_layer
        return ys[idx - 1]  # ys[j] = output of layer j (0-based)

    def _mlp(self, p, x):
        h = linear(p["fc1"], x)
        act = self.config.hidden_act
        if act == "quick_gelu":
            h = h * jax.nn.sigmoid(1.702 * h)
        elif act == "silu":
            h = jax.nn.silu(h)
        else:
            h = jax.nn.gelu(h, approximate=False)
        return linear(p["fc2"], h)

    def _attention(self, p, x, cos, sin, mask, scale):
        N = x.shape[0]
        nh, hd = self.num_heads, self.head_dim
        q = linear(p["q_proj"], x).reshape(N, nh, hd)
        k = linear(p["k_proj"], x).reshape(N, nh, hd)
        v = linear(p["v_proj"], x).reshape(N, nh, hd)
        q = q.transpose(1, 0, 2)[None]
        k = k.transpose(1, 0, 2)[None]
        v = v.transpose(1, 0, 2)[None]
        rot = 2 * cos.shape[-1]
        q_rot, k_rot = apply_rope(q[..., :rot], k[..., :rot], cos, sin)
        q = jnp.concatenate([q_rot, q[..., rot:]], axis=-1)
        k = jnp.concatenate([k_rot, k[..., rot:]], axis=-1)
        out = sdpa(q, k, v, scale, mask)
        out = out[0].transpose(1, 0, 2).reshape(N, -1)
        return linear(p["out_proj"], out)

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "position_ids" in k:
                continue
            if k.endswith("patch_embedding.weight") and v.ndim == 5:
                v = v.reshape(v.shape[0], -1)
            out[k] = v
        return out
