"""Kimi-VL: MoonViT (packed NaViT-style tower) + DeepSeek-V3 MLA decoder.

Role parity: reference mlx_vlm/models/kimi_vl — Learnable2DInterpPosEmb
(bicubic-resized learnable grid):vision.py:82, Rope2DPosEmb (interleaved
x/y complex pairs):vision.py:107, patch_merger (per-image 2x2 block
grouping):vision.py:375, KimiVLMultiModalProjector (pre_norm -> flatten
block -> mlp):kimi_vl.py:14-40, wqkv/wo key fixup:vision.py:495.

TPU design: all per-image geometry (bicubic pos-emb taps, 2-D rope angles,
segment ids, merge gather plan) is host-side index/weight math; the tower
itself is one packed scanned encoder with a segment mask, and the language
side reuses the deepseek_v2/v3 MLA module (latent cache + noaux routing).
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import layer_norm, linear
from ...core.rope import apply_rope_traditional
from ...ops.attention import sdpa
from ..deepseek_v2.deepseek_v2 import LanguageModel
from ..deepseek_v2.deepseek_v2 import ModelConfig as _DSConfig
from ..llama.llama import text_position_ids
from ..mistral3.mistral3 import patch_merge_plan
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features

STACK_PREFIX = "vision_tower.blocks"


@dataclass
class TextConfig(_DSConfig):
    model_type: str = "deepseek_v3"


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "moonvit"
    depth: int = 27
    embed_dim: int = 1152
    hidden_size: int = 1152
    num_heads: int = 16
    patch_size: int = 14
    intermediate_size: int = 4304
    init_pos_emb_height: int = 64
    init_pos_emb_width: int = 64
    spatial_merge_size: int = 2
    merge_kernel_size: Optional[List[int]] = None
    layer_norm_eps: float = 1e-6

    def __post_init__(self):
        if self.merge_kernel_size is None:
            self.merge_kernel_size = [self.spatial_merge_size,
                                      self.spatial_merge_size]


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "kimi_vl"
    ignore_index: int = -100
    vocab_size: int = 163840
    media_placeholder_token_id: int = 163606
    image_token_index: Optional[int] = None
    eos_token_id: Optional[List[int]] = None

    def __post_init__(self):
        if self.image_token_index is None:
            self.image_token_index = self.media_placeholder_token_id

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {}
        )
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {}
        )
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


def _cubic(d: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Torch bicubic kernel weights (F.interpolate mode='bicubic')."""
    d = np.abs(d)
    w = np.where(
        d <= 1,
        (a + 2) * d**3 - (a + 3) * d**2 + 1,
        np.where(d < 2, a * d**3 - 5 * a * d**2 + 8 * a * d - 4 * a, 0.0),
    )
    return w


def _axis_taps(src: int, dst: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output 4-tap indices [dst, 4] and weights (align_corners=False)."""
    pos = (np.arange(dst) + 0.5) * (src / dst) - 0.5
    base = np.floor(pos).astype(np.int64)
    taps = base[:, None] + np.arange(-1, 3)[None]
    wgt = _cubic(pos[:, None] - taps)
    taps = np.clip(taps, 0, src - 1)
    return taps, wgt.astype(np.float32)


def bicubic_pos_plan(
    grids: List[Tuple[int, int]], src_h: int, src_w: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(idx [16, N], weights [16, N]) into the flattened [src_h*src_w] grid
    for per-image bicubic resize of the learnable pos-emb table."""
    idx_all, w_all = [], []
    for h, w in grids:
        if (h, w) == (src_h, src_w):
            flat = np.arange(src_h * src_w)
            idx = np.zeros((16, h * w), np.int64)
            wgt = np.zeros((16, h * w), np.float32)
            idx[0] = flat
            wgt[0] = 1.0
        else:
            ty, wy = _axis_taps(src_h, h)  # [h,4]
            tx, wx = _axis_taps(src_w, w)  # [w,4]
            idx = (
                ty[:, None, :, None] * src_w + tx[None, :, None, :]
            ).reshape(h * w, 16).T
            wgt = (wy[:, None, :, None] * wx[None, :, None, :]).reshape(
                h * w, 16).T
        idx_all.append(idx)
        w_all.append(wgt)
    return (
        np.concatenate(idx_all, axis=1).astype(np.int32),
        np.concatenate(w_all, axis=1).astype(np.float32),
    )


def rope2d_angles(grids: List[Tuple[int, int]], head_dim: int,
                  theta: float = 10000.0) -> np.ndarray:
    """Per-pair rope angles [N, head_dim/2]: even pairs rotate by the x
    (width) position, odd pairs by y (reference Rope2DPosEmb:107)."""
    fd = head_dim // 4
    freqs = 1.0 / (theta ** (np.arange(0, head_dim, 4)[:fd] / head_dim))
    out = []
    for h, w in grids:
        y = np.repeat(np.arange(h), w)
        x = np.tile(np.arange(w), h)
        xa = x[:, None] * freqs[None]
        ya = y[:, None] * freqs[None]
        out.append(np.stack([xa, ya], axis=-1).reshape(h * w, -1))
    return np.concatenate(out, axis=0).astype(np.float32)


class MoonViT:
    def __init__(self, config: VisionConfig):
        self.config = config
        self.num_heads = config.num_heads
        self.head_dim = config.embed_dim // config.num_heads
        self.scale = self.head_dim**-0.5

    def __call__(self, params, pixel_values, rotary_freqs, segment_ids,
                 pos_idx, pos_weights, merge_idx):
        """pixel_values [N, C*P*P] -> merged blocks [N_m, mk*mk, E]."""
        cfg = self.config
        w = params["patch_embed"]["proj"]["weight"]  # [E, C*P*P]
        h = jnp.dot(pixel_values.astype(w.dtype), w.T)
        h = h + params["patch_embed"]["proj"]["bias"]
        table = params["patch_embed"]["pos_emb"]["weight"].reshape(
            -1, cfg.embed_dim
        )
        pos = jnp.einsum(
            "kn,knd->nd", pos_weights.astype(jnp.float32),
            jnp.take(table, pos_idx, axis=0).astype(jnp.float32),
        )
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
        # per-image 2x2 block grouping (reference patch_merger:375)
        g = jnp.take(h, merge_idx, axis=0)  # [N_m, mk*mk, E]
        return g

    def _attention(self, p, x, cos, sin, mask):
        N = x.shape[0]
        qkv = linear(p["wqkv"], x).reshape(N, 3, self.num_heads, self.head_dim)
        q = qkv[:, 0].transpose(1, 0, 2)[None]
        k = qkv[:, 1].transpose(1, 0, 2)[None]
        v = qkv[:, 2].transpose(1, 0, 2)[None]
        q, k = apply_rope_traditional(q, k, cos, sin)
        out = sdpa(q, k, v, self.scale, mask)
        out = out[0].transpose(1, 0, 2).reshape(N, -1)
        return linear(p["wo"], out)

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "position_ids" in k:
                continue
            if "patch_embed.proj.weight" in k and v.ndim == 4:
                v = v.reshape(v.shape[0], -1)
            if "pos_emb.weight" in k and v.ndim == 3:
                v = v.reshape(-1, v.shape[-1])
            if "blocks." in k and ".attn." not in k:
                k = k.replace(".wqkv", ".attn.wqkv").replace(".wo", ".attn.wo")
            out[k] = v
        return out


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = MoonViT(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)
        self.mk = tuple(config.vision_config.merge_kernel_size)

    def vision_features(self, params, pixel_values, rotary_freqs, segment_ids,
                        pos_idx, pos_weights, merge_idx):
        blocks = self.vision_tower(
            params["vision_tower"], pixel_values, rotary_freqs, segment_ids,
            pos_idx, pos_weights, merge_idx,
        )  # [N_m, mk*mk, E]
        mp = params["multi_modal_projector"]
        x = layer_norm(mp["pre_norm"], blocks, 1e-5)
        x = x.reshape(x.shape[0], -1)  # token-major flatten
        x = jax.nn.gelu(linear(mp["linear_1"], x), approximate=False)
        return linear(mp["linear_2"], x)

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,
        rotary_freqs=None, segment_ids=None, pos_idx=None, pos_weights=None,
        merge_idx=None, image_features: Optional[jax.Array] = None,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"], input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        feats = (
            image_features
            if image_features is not None
            else self.vision_features(
                params, pixel_values, rotary_freqs, segment_ids,
                pos_idx, pos_weights, merge_idx,
            )
        )
        return merge_input_ids_with_image_features(
            self.config.image_token_index, -1, feats, embeds, input_ids
        )

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache, position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return text_position_ids(input_ids, attention_mask)

    def vision_aux_inputs(self, grid_thw) -> dict:
        cfg = self.config.vision_config
        grids = [(int(r[-2]), int(r[-1])) for r in np.asarray(grid_thw)]
        idx, wgt = bicubic_pos_plan(
            grids, cfg.init_pos_emb_height, cfg.init_pos_emb_width
        )
        segs = np.concatenate(
            [np.full(h * w, i, np.int32) for i, (h, w) in enumerate(grids)]
        )
        return {
            "rotary_freqs": rope2d_angles(
                grids, cfg.embed_dim // cfg.num_heads
            ),
            "segment_ids": segs,
            "pos_idx": idx,
            "pos_weights": wgt,
            "merge_idx": patch_merge_plan(grids, self.mk[0]),
        }

    def sanitize(self, weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            if not k.startswith(("language_model.", "vision_tower.",
                                 "multi_modal_projector.")):
                k = "language_model." + k
            out[k] = v
        vt = {k[len("vision_tower."):]: v for k, v in out.items()
              if k.startswith("vision_tower.")}
        vt = MoonViT.sanitize(vt)
        out = {k: v for k, v in out.items() if not k.startswith("vision_tower.")}
        out.update({"vision_tower." + k: v for k, v in vt.items()})
        return out

    @property
    def stack_patterns(self):
        a = self.config.text_config
        pats = [STACK_PREFIX]
        if a.n_routed_experts:
            pats += [
                (f"language_model.model.layers.{i}.mlp.experts", 0)
                for i in range(a.first_k_dense_replace, a.num_hidden_layers)
            ]
        return tuple(pats)
