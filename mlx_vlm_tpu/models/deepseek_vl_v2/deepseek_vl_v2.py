"""DeepSeek-VL2: timm-SigLIP tower + downsample MLP projector + 2D tile
layout + DeepSeek MLA decoder.

Role parity: reference mlx_vlm/models/deepseek_vl_v2 — SigLipVisionModel
(no-CLS timm ViT, ignore_head):vision.py:222-275, MlpProjector
downsample_mlp_gelu:deepseek_vl_v2.py:38-131, process_image_features (2D
tile tag: per-row image_newline, view_separator between global/local
views):deepseek_vl_v2.py:178-305.

TPU design: the tile arrangement is a Python loop over the (static, host)
images_spatial_crop metadata building one packed feature sequence; the
tower runs batched over fixed-size tiles under a scanned encoder; the
decoder reuses the deepseek_v2/v3 MLA module.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import layer_norm, linear
from ..clip_vision import patchify_images
from ..deepseek_v2.deepseek_v2 import LanguageModel
from ..deepseek_v2.deepseek_v2 import ModelConfig as _DSConfig
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from ...ops.attention import sdpa

STACK_PATTERNS = ("vision.vision_tower.blocks",)


@dataclass
class TextConfig(_DSConfig):
    model_type: str = "deepseek_v2"


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "vision"
    layers: int = 27
    width: int = 1152
    intermediate_size: int = 4304
    num_attention_heads: int = 16
    image_size: int = 384
    patch_size: int = 16
    num_channels: int = 3
    layer_norm_eps: float = 1e-6


@dataclass
class ProjectorConfig(BaseModelConfig):
    projector_type: str = "downsample_mlp_gelu"
    input_dim: int = 1152
    n_embed: int = 2048
    depth: int = 2
    mlp_ratio: int = 1
    downsample_ratio: int = 2


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    projector_config: ProjectorConfig
    model_type: str = "deepseek_vl_v2"
    tile_tag: str = "2D"
    global_view_pos: str = "head"
    image_token_index: int = 100015
    eos_token_id: Optional[List[int]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("language_config", params.get("text_config", {})) or {}
        )
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {}
        )
        params["projector_config"] = ProjectorConfig.from_dict(
            params.get("projector_config", {}) or {}
        )
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


class SigLipTower:
    """timm-style no-CLS ViT; features = LayerNorm(last hidden)."""

    def __init__(self, config: VisionConfig):
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.width // config.num_attention_heads
        self.scale = self.head_dim**-0.5

    def __call__(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        cfg = self.config
        vt = params["vision_tower"]
        patches = patchify_images(pixel_values, cfg.patch_size)
        w = vt["patch_embed"]["proj"]["weight"]  # [E, C*P*P]
        x = jnp.einsum("bnd,ed->bne", patches.astype(w.dtype), w)
        if "bias" in vt["patch_embed"]["proj"]:
            x = x + vt["patch_embed"]["proj"]["bias"]
        x = x + vt["pos_embed"].reshape(1, -1, cfg.width).astype(x.dtype)

        def block(h, lp):
            y = layer_norm(lp["norm1"], h, cfg.layer_norm_eps)
            y = self._attention(lp["attn"], y)
            h = h + y
            y = layer_norm(lp["norm2"], h, cfg.layer_norm_eps)
            y = linear(lp["mlp"]["fc2"],
                       jax.nn.gelu(linear(lp["mlp"]["fc1"], y),
                                   approximate=True))
            return h + y, None

        x, _ = jax.lax.scan(block, x, vt["blocks"])
        return layer_norm(vt["norm"], x, 1e-6)  # ignore_head path

    def _attention(self, p, x):
        B, N, D = x.shape
        qkv = linear(p["qkv"], x).reshape(B, N, 3, self.num_heads, self.head_dim)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        out = sdpa(q, k, v, self.scale, None)
        return linear(p["proj"], out.transpose(0, 2, 1, 3).reshape(B, N, D))


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = SigLipTower(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)
        if config.tile_tag != "2D":
            raise ValueError("only the 2D tile layout is supported")

    def _project(self, params, feats):
        """downsample_mlp_gelu projector (reference dsvl2.py:38-131)."""
        pc = self.config.projector_config
        B, N, C = feats.shape
        side = int(N**0.5)
        ds = pc.downsample_ratio
        x = feats.reshape(B, side, side, C)
        # 2x2 block grouping, channel-major within block (torch unfold)
        x = x.reshape(B, side // ds, ds, side // ds, ds, C)
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(
            B, (side // ds) ** 2, C * ds * ds
        )
        mp = params["projector"]["layers"]
        keys = sorted(mp.keys(), key=int)
        for i, kk in enumerate(keys):
            if i:
                x = jax.nn.gelu(x, approximate=False)
            x = linear(mp[kk], x)
        return x

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,  # [n_tiles, C, H, W]
        images_spatial_crop: Optional[tuple] = None,  # ((w_t, h_t), ...)
        image_features: Optional[jax.Array] = None,
        **aux,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"], input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        if image_features is None:
            feats = self.vision_tower(params["vision"],
                                      pixel_values.astype(embeds.dtype))
            feats = self._project(params, feats)  # [n_tiles, hw, D]
            hw = feats.shape[1]
            gh = int(hw**0.5)
            D = feats.shape[-1]
            newline = params["image_newline"].reshape(1, D)
            sep = params["view_separator"].reshape(1, D)
            parts = []
            idx = 0
            for (wt, ht) in images_spatial_crop:
                glb = feats[idx].reshape(gh, gh, D)
                glb = jnp.concatenate(
                    [glb, jnp.tile(newline[None], (gh, 1, 1))], axis=1
                ).reshape(-1, D)
                loc = feats[idx + 1: idx + 1 + wt * ht]
                loc = loc.reshape(ht, wt, gh, gh, D).transpose(0, 2, 1, 3, 4)
                loc = loc.reshape(ht * gh, wt * gh, D)
                loc = jnp.concatenate(
                    [loc, jnp.tile(newline[None], (ht * gh, 1, 1))], axis=1
                ).reshape(-1, D)
                if self.config.global_view_pos == "head":
                    parts.append(jnp.concatenate([glb, sep, loc], axis=0))
                else:
                    parts.append(jnp.concatenate([loc, sep, glb], axis=0))
                idx += 1 + wt * ht
            image_features = jnp.concatenate(parts, axis=0)
        return merge_input_ids_with_image_features(
            self.config.image_token_index, -1, image_features, embeds, input_ids
        )

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache, position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return text_position_ids(input_ids, attention_mask)

    def vision_aux_inputs(self, grid_thw) -> dict:
        """grid rows: (w_tiles, h_tiles) per image -> static tuple."""
        return {"images_spatial_crop": tuple(
            (int(r[-2]), int(r[-1])) for r in np.asarray(grid_thw)
        )}

    def sanitize(self, weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k or "position_ids" in k \
                    or ".attn_pool." in k:
                continue
            k = k.replace("view_seperator", "view_separator")
            if k.startswith("language.model"):
                k = k.replace("language.model", "language_model.model")
            elif k.startswith("language.lm_head"):
                k = k.replace("language.", "language_model.")
            if k.startswith("vision.") and not k.startswith(
                    "vision.vision_tower."):
                k = "vision.vision_tower." + k[len("vision."):]
            if "patch_embed.proj.weight" in k and v.ndim == 4:
                v = v.reshape(v.shape[0], -1)
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        a = self.config.text_config
        pats = [STACK_PATTERNS[0]]
        if a.n_routed_experts:
            pats += [
                (f"language_model.model.layers.{i}.mlp.experts", 0)
                for i in range(a.first_k_dense_replace, a.num_hidden_layers)
            ]
        return tuple(pats)
