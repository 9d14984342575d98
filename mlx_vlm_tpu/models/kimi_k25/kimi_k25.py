"""Kimi-K2.5: MoonViT with video (t, h, w) grids over the DeepSeek-V3 MoE.

Role parity: reference mlx_vlm/models/kimi_k25/ — vision.py extends the
kimi_vl MoonViT with InternVideo2-style temporal sin-cos embeddings
(_temporal_sincos_emb:13) added on top of the per-frame interpolated 2-D
pos-emb (Learnable2DInterpPosEmb:87), spatial rope tiled across frames
(get_freqs_cis:365), whole-video attention segments (cu_seqlens over
t*h*w:480) and per-frame patch merging; language.py wraps the
deepseek_v3 decoder; media_placeholder_token_id marks image slots
(config.py:15).

TPU design: all video bookkeeping stays HOST-side aux planning (tiled
bicubic gather plans, precomputed temporal table, per-frame merge
indices) feeding the same scan/packed-attention MoonViT kernel as
kimi_vl — only one new additive input.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..kimi_vl.kimi_vl import (ModelConfig as _KimiConfig,
                               Model as _KimiModel, MoonViT as _MoonViT,
                               bicubic_pos_plan, rope2d_angles)
from ..mistral3.mistral3 import patch_merge_plan


@dataclass
class ModelConfig(_KimiConfig):
    model_type: str = "kimi_k25"
    media_placeholder_token_id: int = 163606

    def __post_init__(self):
        super().__post_init__()
        if getattr(self, "image_token_index", None) is None:
            self.image_token_index = self.media_placeholder_token_id


def temporal_sincos_emb(num_frames: int, dim: int) -> np.ndarray:
    """InternVideo2-style 1-D sin-cos table [t, dim] (reference
    vision.py:13)."""
    pos = np.arange(num_frames, dtype=np.float32)[:, None]
    half = max(dim // 2, 1)
    freq = np.exp(-math.log(10000.0)
                  * np.arange(half, dtype=np.float32) / half)[None]
    ang = pos * freq
    emb = np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)
    if emb.shape[-1] < dim:
        emb = np.concatenate(
            [emb, np.zeros((num_frames, dim - emb.shape[-1]), np.float32)],
            axis=-1)
    return emb[:, :dim].astype(np.float32)


class MoonViTK25(_MoonViT):
    def __call__(self, params, pixel_values, rotary_freqs, segment_ids,
                 pos_idx, pos_weights, merge_idx, temporal_emb=None):
        cfg = self.config
        from ...core.layers import layer_norm, linear

        w = params["patch_embed"]["proj"]["weight"]
        h = jnp.dot(pixel_values.astype(w.dtype), w.T)
        h = h + params["patch_embed"]["proj"]["bias"]
        table = params["patch_embed"]["pos_emb"]["weight"].reshape(
            -1, cfg.embed_dim)
        pos = jnp.einsum(
            "kn,knd->nd", pos_weights.astype(jnp.float32),
            jnp.take(table, pos_idx, axis=0).astype(jnp.float32))
        if temporal_emb is not None:
            pos = pos + temporal_emb.astype(jnp.float32)
        h = h + pos.astype(h.dtype)

        cos = jnp.cos(rotary_freqs)[None]
        sin = jnp.sin(rotary_freqs)[None]
        mask = (segment_ids[None, :] == segment_ids[:, None])[None, None]

        def block(h, lp):
            x = layer_norm(lp["norm0"], h, cfg.layer_norm_eps)
            x = self._attention(lp["attn"], x, cos, sin, mask)
            h = h + x
            x = layer_norm(lp["norm1"], h, cfg.layer_norm_eps)
            x = linear(lp["mlp"]["fc1"],
                       jax.nn.gelu(linear(lp["mlp"]["fc0"], x),
                                   approximate=False))
            return h + x, None

        h, _ = jax.lax.scan(block, h, params["blocks"])
        h = layer_norm(params["final_layernorm"], h, 1e-6)
        return jnp.take(h, merge_idx, axis=0)


def _as_thw(grid) -> List[Tuple[int, int, int]]:
    rows = []
    for r in np.asarray(grid):
        r = [int(x) for x in r]
        rows.append((1, r[0], r[1]) if len(r) == 2 else tuple(r[-3:]))
    return rows


class Model(_KimiModel):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.vision_tower = MoonViTK25(config.vision_config)

    def vision_aux_inputs(self, grid_thw) -> dict:
        cfg = self.config.vision_config
        thw = _as_thw(grid_thw)
        # spatial plans per frame: each (t,h,w) contributes t copies
        frame_grids = [(h, w) for t, h, w in thw for _ in range(t)]
        idx, wgt = bicubic_pos_plan(
            frame_grids, cfg.init_pos_emb_height, cfg.init_pos_emb_width)
        # attention segments span the WHOLE video (t*h*w tokens)
        segs = np.concatenate(
            [np.full(t * h * w, i, np.int32)
             for i, (t, h, w) in enumerate(thw)])
        temporal = np.concatenate(
            [np.repeat(temporal_sincos_emb(t, cfg.embed_dim), h * w, axis=0)
             if t > 1 else np.zeros((h * w, cfg.embed_dim), np.float32)
             for t, h, w in thw])
        return {
            "rotary_freqs": rope2d_angles(
                frame_grids, cfg.embed_dim // cfg.num_heads),
            "segment_ids": segs,
            "pos_idx": idx,
            "pos_weights": wgt,
            "merge_idx": patch_merge_plan(frame_grids, self.mk[0]),
            "temporal_emb": temporal,
        }

    def get_input_embeddings(self, params, input_ids, pixel_values=None,
                             rotary_freqs=None, segment_ids=None,
                             pos_idx=None, pos_weights=None, merge_idx=None,
                             temporal_emb=None, image_features=None,
                             **aux):
        from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features

        embeds = self.language_model.embed(params["language_model"],
                                           input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        if image_features is None:
            blocks = self.vision_tower(
                params["vision_tower"], pixel_values, rotary_freqs,
                segment_ids, pos_idx, pos_weights, merge_idx, temporal_emb)
            from ...core.layers import layer_norm, linear

            mp = params["multi_modal_projector"]
            x = layer_norm(mp["pre_norm"], blocks, 1e-5)
            x = x.reshape(x.shape[0], -1)
            x = jax.nn.gelu(linear(mp["linear_1"], x), approximate=False)
            image_features = linear(mp["linear_2"], x)
        return merge_input_ids_with_image_features(
            self.config.image_token_index, -1, image_features, embeds,
            input_ids)
