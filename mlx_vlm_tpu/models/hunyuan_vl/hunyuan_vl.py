"""Hunyuan-VL: anyres NaViT tower + hunyuan decoder with XD-RoPE.

Role parity: reference mlx_vlm/models/hunyuan_vl/ —
HunyuanRotaryEmbedding NTK-alpha base (language.py:17),
apply_rotary_pos_emb_xdrope (language.py:62: 4 position streams selected
section-modulo across the head dim; prefill only — decode falls back to
1-D rope), PatchEmbed bilinear pos-embed interpolation (vision.py:96),
PatchMerger conv merge + image_newline/begin/end tokens (vision.py:196),
get_xdrope_input_positions (language.py:365).

TPU design: ONE xdrope formulation serves prefill AND decode — with all
four streams equal (the decode case) the section-modulo selection reduces
exactly to standard rope, so there is no phase branch in the compiled
program.  The engine's 3-stream decode positions broadcast to 4 streams.
"""

from __future__ import annotations

import dataclasses
import inspect
from typing import List, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import layer_norm, linear, rms_norm
from ...ops.attention import sdpa
from ..hunyuan_v1_dense.hunyuan_v1_dense import LanguageModel as _HunyuanLM
from ..hunyuan_v1_dense.hunyuan_v1_dense import TextConfig as _HunyuanText
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features

STACK_PATTERNS = (
    "language_model.model.layers",
    "vision_tower.layers",
)


@dataclasses.dataclass
class TextConfig(_HunyuanText):
    model_type: str = "hunyuan_vl_text"


@dataclasses.dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "hunyuan_vl_vision"
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    patch_size: int = 16
    num_channels: int = 3
    max_image_size: int = 2048
    spatial_merge_size: int = 2
    out_hidden_size: int = 4096
    rms_norm_eps: float = 1e-5
    layer_norm_eps: float = 1e-6
    interpolate_mode: str = "bilinear"


@dataclasses.dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "hunyuan_vl"
    image_token_id: int = 120120
    eos_token_id: Optional[Union[int, List[int]]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {})
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {})
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


class XDRope:
    """Multi-stream rope: half-dim sections map to position streams by
    section-index modulo (reference apply_rotary_pos_emb_xdrope:62)."""

    def __init__(self, head_dim: int, base: float,
                 sections: Tuple[int, ...]):
        self.x_dim = len(sections)
        half = head_dim // 2
        assert sum(sections) == half, "xdrope sections must cover dim/2"
        self.inv_freq = jnp.asarray(
            1.0 / base ** (np.arange(0, head_dim, 2) / head_dim), jnp.float32)
        stream = np.concatenate([
            np.full(n, i % self.x_dim) for i, n in enumerate(sections)])
        self.one_hot = jnp.asarray(np.eye(self.x_dim)[stream].T, jnp.float32)
        self.mrope_sections = None  # plain-rope protocol compat
        self.attention_scaling = 1.0

    def cos_sin(self, position_ids: jax.Array):
        pos = position_ids
        if pos.ndim == 2:
            pos = pos[None]
        if pos.shape[0] < self.x_dim:  # decode path: all streams equal
            pos = jnp.broadcast_to(pos[:1], (self.x_dim, *pos.shape[1:]))
        ang = pos.astype(jnp.float32)[..., None] * self.inv_freq
        cos = jnp.einsum("xbsd,xd->bsd", jnp.cos(ang), self.one_hot)
        sin = jnp.einsum("xbsd,xd->bsd", jnp.sin(ang), self.one_hot)
        return cos, sin


class LanguageModel(_HunyuanLM):
    def __init__(self, args: TextConfig, config=None):
        scaling = args.rope_scaling or {}
        # the base constructors don't know "xdrope"; the rope is replaced
        # below anyway
        args.rope_scaling = None
        try:
            super().__init__(args, config)
        finally:
            args.rope_scaling = scaling or None
        alpha = scaling.get("alpha", 1.0)
        d = self.head_dim
        base = args.rope_theta * alpha ** (d / (d - 2))
        sections = tuple(scaling.get("xdrope_section",
                                     (d // 8,) * 4))
        self.rope = XDRope(d, base, sections)

    # --------------------------------------------------------------- host
    def get_xdrope_input_positions(self, input_ids: np.ndarray,
                                   image_grid_thw, image_token_id: int,
                                   spatial_merge_size: int) -> np.ndarray:
        """[4, B, S] (p, w, h, t) streams (reference language.py:365)."""
        ids = np.asarray(input_ids)
        B, S = ids.shape
        out = np.broadcast_to(np.arange(S, dtype=np.int64),
                              (4, B, S)).copy()
        if image_grid_thw is None:
            return out
        grids = np.asarray(image_grid_thw).reshape(-1, 3)
        for b in range(B):
            starts = np.where(ids[b] == image_token_id)[0]
            # first image token of each run
            runs = [s for i, s in enumerate(starts)
                    if i == 0 or s != starts[i - 1] + 1]
            for img_i, s0 in enumerate(runs[: len(grids)]):
                _, h, w = grids[img_i]
                gh, gw = h // spatial_merge_size, w // spatial_merge_size
                n = (gw + 1) * gh
                pos = s0 + 1
                end = min(pos + n, S)
                cnt = end - pos
                if cnt <= 0:
                    continue
                out[1, b, pos:end] = np.tile(np.arange(gw + 1), gh)[:cnt]
                out[2, b, pos:end] = np.repeat(np.arange(gh), gw + 1)[:cnt]
                out[3, b, pos:end] = img_i
        return out.astype(np.int32)


class HunyuanVisionTower:
    """params = {"embeddings": {patch_embedding, position_embedding},
    "layers" (stacked), "perceive": {...}}."""

    def __init__(self, config: VisionConfig):
        self.config = config
        self.n_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5

    def _pos_embed(self, params, gh: int, gw: int) -> jax.Array:
        """Bilinear-interpolated position table (reference vision.py:158)."""
        table = params["embeddings"]["position_embedding"]["weight"][1:]
        edge = int(round(table.shape[0] ** 0.5))
        E = table.shape[-1]
        base = table.reshape(edge, edge, E).astype(jnp.float32)
        hs = edge / (gh + 0.1)
        ws = edge / (gw + 0.1)
        hc = (jnp.arange(gh) + 0.5) * hs - 0.5
        wc = (jnp.arange(gw) + 0.5) * ws - 0.5
        i0 = jnp.clip(hc.astype(jnp.int32), 0, edge - 1)
        j0 = jnp.clip(wc.astype(jnp.int32), 0, edge - 1)
        i1 = jnp.minimum(i0 + 1, edge - 1)
        j1 = jnp.minimum(j0 + 1, edge - 1)
        di = (hc - i0)[:, None, None]
        dj = (wc - j0)[None, :, None]
        p00 = base[i0][:, j0]
        p01 = base[i0][:, j1]
        p10 = base[i1][:, j0]
        p11 = base[i1][:, j1]
        out = ((1 - di) * (1 - dj) * p00 + (1 - di) * dj * p01
               + di * (1 - dj) * p10 + di * dj * p11)
        return out.reshape(1, gh * gw, E)

    def __call__(self, params, pixel_values: jax.Array,
                 grid_hw: Tuple[int, int]) -> jax.Array:
        """pixel_values [N_patches, C*P*P] (one image) -> merged tokens
        [1, T, out_hidden]."""
        c = self.config
        gh, gw = grid_hw
        P, C = c.patch_size, c.num_channels
        N = pixel_values.shape[0]
        x = pixel_values.reshape(N, C, P, P).transpose(0, 2, 3, 1)
        w = params["embeddings"]["patch_embedding"]["weight"]  # HWIO
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(P, P), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        x = x.reshape(1, N, -1)
        x = x + params["embeddings"]["patch_embedding"]["bias"].astype(
            x.dtype)
        x = x + self._pos_embed(params, gh, gw).astype(x.dtype)

        def block(h, lp):
            y = layer_norm(lp["layer_norm1"], h, self.config.layer_norm_eps)
            B, L, E = y.shape
            q = linear(lp["self_attn"]["q_proj"], y).reshape(
                B, L, self.n_heads, self.head_dim).transpose(0, 2, 1, 3)
            k = linear(lp["self_attn"]["k_proj"], y).reshape(
                B, L, self.n_heads, self.head_dim).transpose(0, 2, 1, 3)
            v = linear(lp["self_attn"]["v_proj"], y).reshape(
                B, L, self.n_heads, self.head_dim).transpose(0, 2, 1, 3)
            o = sdpa(q, k, v, self.scale, None)
            o = o.transpose(0, 2, 1, 3).reshape(B, L, E)
            h = h + linear(lp["self_attn"]["out_proj"], o)
            y = layer_norm(lp["layer_norm2"], h, self.config.layer_norm_eps)
            h = h + linear(lp["mlp"]["fc2"], jax.nn.gelu(
                linear(lp["mlp"]["fc1"], y), approximate=True))
            return h, None

        x, _ = jax.lax.scan(block, x, params["layers"])
        return self._merge(params["perceive"], x, gh, gw)

    def _merge(self, p, x, gh: int, gw: int) -> jax.Array:
        """Conv spatial merge + newline/begin/end tokens (reference
        PatchMerger:196)."""
        c = self.config
        sm = c.spatial_merge_size
        x = rms_norm(p["before_rms"], x, c.rms_norm_eps)
        B = x.shape[0]
        E = c.hidden_size
        img = x.reshape(B, gh, gw, E)
        w0 = p["proj"]["0"]["weight"]
        img = jax.lax.conv_general_dilated(
            img, w0.astype(img.dtype), window_strides=(sm, sm),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(img.dtype)
        img = img + p["proj"]["0"]["bias"].astype(img.dtype)
        img = jax.nn.gelu(img, approximate=True)
        w2 = p["proj"]["2"]["weight"]
        img = jax.lax.conv_general_dilated(
            img, w2.astype(img.dtype), window_strides=(1, 1),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(img.dtype)
        img = img + p["proj"]["2"]["bias"].astype(img.dtype)
        mh, mw = gh // sm, gw // sm
        fh = img.shape[-1]
        nl = jnp.broadcast_to(p["image_newline"].astype(img.dtype),
                              (B, mh, 1, fh))
        img = jnp.concatenate([img, nl], axis=2).reshape(B, mh * (mw + 1),
                                                         fh)
        img = linear(p["mlp"], img)
        begin = jnp.broadcast_to(p["image_begin"].astype(img.dtype),
                                 (B, 1, img.shape[-1]))
        end = jnp.broadcast_to(p["image_end"].astype(img.dtype),
                               (B, 1, img.shape[-1]))
        img = jnp.concatenate([begin, img, end], axis=1)
        return rms_norm(p["after_rms"], img, c.rms_norm_eps)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = HunyuanVisionTower(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,
        grid_hw: Optional[Tuple[int, int]] = None,
        image_features: Optional[jax.Array] = None,
        **aux,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"],
                                           input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        feats = (image_features if image_features is not None
                 else self.vision_tower(params["vision_tower"],
                                        pixel_values, grid_hw))
        feats = feats.reshape(-1, feats.shape[-1])
        return merge_input_ids_with_image_features(
            self.config.image_token_id, -1, feats, embeds, input_ids)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache,
                                            position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        ids = np.asarray(input_ids)
        pos = self.language_model.get_xdrope_input_positions(
            ids, image_grid_thw, self.config.image_token_id,
            self.config.vision_config.spatial_merge_size)
        deltas = np.zeros((ids.shape[0], 1), np.int32)
        return pos, deltas

    def vision_aux_inputs(self, grid_thw):
        g = np.asarray(grid_thw).reshape(-1, 3)
        return {"grid_hw": (int(g[0, 1]), int(g[0, 2]))}

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            if k.startswith("vision_model."):
                k = "vision_tower." + k[len("vision_model."):]
            elif k.startswith("model.vision_model."):
                k = "vision_tower." + k[len("model.vision_model."):]
            elif k.startswith("model."):
                k = "language_model." + k
            elif k.startswith("lm_head"):
                k = "language_model." + k
            if ("patch_embedding.weight" in k or "proj.0.weight" in k
                    or "proj.2.weight" in k):
                if getattr(v, "ndim", 0) == 4 and not (
                        v.shape[0] == v.shape[1] <= 16):
                    v = np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
