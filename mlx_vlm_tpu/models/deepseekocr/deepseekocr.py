"""DeepSeek-OCR: SAM + CLIP dual towers over the deepseek (MLA) decoder.

Role parity: reference mlx_vlm/models/deepseekocr/ — SAM features injected
as the CLIP tower's patch embeddings (vision.py:167), fused feature =
concat(clip[:, 1:], sam_flat) (deepseekocr.py:175), downsample-MLP-GELU
projector (deepseekocr.py:27), global-view layout with per-row
image_newline + trailing view_separator (deepseekocr.py:258-293),
deepseek_v2 text decoder.

v1 covers the global view (single resized image); pan-and-scan local crops
ride the same feature path batched when the processor supplies them.
"""

from __future__ import annotations

import dataclasses
import inspect
import math
from typing import List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import layer_norm, linear
from ...ops.attention import sdpa
from ..deepseek_v2.deepseek_v2 import LanguageModel as _DeepseekLM
from ..deepseek_v2.deepseek_v2 import ModelConfig as _DeepseekText
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from .sam import SAMConfig, SAMEncoder


@dataclasses.dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "vision"
    layers: int = 24
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    num_channels: int = 3
    layer_norm_eps: float = 1e-6


@dataclasses.dataclass
class ProjectorConfig(BaseModelConfig):
    model_type: str = "projector"
    projector_type: str = "linear"
    input_dim: int = 2048
    n_embed: int = 1280
    depth: int = 2
    mlp_ratio: int = 1
    downsample_ratio: int = 2


@dataclasses.dataclass
class ModelConfig(BaseModelConfig):
    text_config: _DeepseekText
    vision_config: VisionConfig
    sam_config: SAMConfig
    projector_config: ProjectorConfig
    model_type: str = "deepseekocr"
    image_token_id: int = 128815
    eos_token_id: Optional[Union[int, List[int]]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = _DeepseekText.from_dict(
            params.get("text_config", params.get("language_config", {}))
            or {})
        vc = params.get("vision_config", {}) or {}
        params["vision_config"] = VisionConfig.from_dict(vc)
        params["sam_config"] = SAMConfig.from_dict(
            params.get("sam_config", {}) or {})
        pc = params.get("projector_config", {}) or {}
        if "projector_config" in pc:  # reference nests one level
            pc = pc["projector_config"]
        params["projector_config"] = ProjectorConfig.from_dict(pc)
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


class ClipTower:
    """CLIP-L-ish tower whose patch embeddings can be INJECTED (from the
    SAM neck) instead of computed from pixels (reference vision.py:161)."""

    def __init__(self, config: VisionConfig):
        self.config = config
        self.n_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5

    def __call__(self, params, pixel_values: jax.Array,
                 patch_embeds: Optional[jax.Array] = None) -> jax.Array:
        c = self.config
        E = c.hidden_size
        if patch_embeds is not None:
            B = patch_embeds.shape[0]
            patches = patch_embeds.reshape(B, -1, E)
        else:
            w = params["embeddings"]["patch_embedding"]["weight"]
            y = jax.lax.conv_general_dilated(
                pixel_values, w.astype(pixel_values.dtype),
                window_strides=(c.patch_size, c.patch_size),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(
                pixel_values.dtype)
            B = y.shape[0]
            patches = y.reshape(B, -1, E)
        cls = jnp.broadcast_to(
            params["embeddings"]["class_embedding"].astype(patches.dtype),
            (B, 1, E))
        x = jnp.concatenate([cls, patches], axis=1)
        # abs pos (bilinear-resized when grid differs, reference :124)
        table = params["embeddings"]["position_embedding"]["weight"]
        n_tgt = x.shape[1]
        if table.shape[0] != n_tgt:
            cls_pos, grid = table[:1], table[1:]
            src = int(round(grid.shape[0] ** 0.5))
            tgt = int(round((n_tgt - 1) ** 0.5))
            grid = jax.image.resize(
                grid.reshape(src, src, E).astype(jnp.float32),
                (tgt, tgt, E), "bilinear").reshape(tgt * tgt, E)
            table = jnp.concatenate([cls_pos.astype(jnp.float32), grid])
        x = x + table[None].astype(x.dtype)
        x = layer_norm(params["pre_layrnorm"], x)

        def block(h, lp):
            y = layer_norm(lp["layer_norm1"], h, self.config.layer_norm_eps)
            B_, L, _ = y.shape
            qkv = linear(lp["self_attn"]["qkv_proj"], y).reshape(
                B_, L, 3, self.n_heads, self.head_dim)
            q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
            o = sdpa(q, k, v, self.scale, None)
            o = o.transpose(0, 2, 1, 3).reshape(B_, L, -1)
            h = h + linear(lp["self_attn"]["out_proj"], o)
            y = layer_norm(lp["layer_norm2"], h, self.config.layer_norm_eps)
            h = h + linear(lp["mlp"]["fc2"], jax.nn.gelu(
                linear(lp["mlp"]["fc1"], y), approximate=False))
            return h, None

        x, _ = jax.lax.scan(block, x, params["transformer"]["layers"])
        return x


def projector_forward(params, cfg: ProjectorConfig, x: jax.Array):
    """downsample_mlp_gelu / linear projector (reference MlpProjector:16)."""
    if cfg.projector_type == "linear":
        return linear(params["layers"], x)
    B, hw, D = x.shape
    h = w = int(math.isqrt(hw))
    ds = cfg.downsample_ratio
    pad = 0 if h % ds == 0 else ds - h % ds
    img = x.reshape(B, h, w, D)
    if pad:
        img = jnp.pad(img, ((0, 0), (0, pad), (0, pad), (0, 0)))
    hp = img.shape[1]
    img = img.reshape(B, hp // ds, ds, hp // ds, ds, D).transpose(
        0, 1, 3, 2, 4, 5).reshape(B, (hp // ds) ** 2, ds * ds * D)
    y = img
    n = cfg.depth
    for i in range(n):
        y = linear(params["layers"][str(2 * i)], y)
        if i < n - 1:
            y = jax.nn.gelu(y, approximate=False)
    return y


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.sam_model = SAMEncoder(config.sam_config)
        self.vision_model = ClipTower(config.vision_config)
        self.language_model = _DeepseekLM(config.text_config, config)

    def vision_features(self, params, pixel_values: jax.Array) -> jax.Array:
        """[B, H, W, 3] global view -> layouted tokens
        [B*(h*(w+1)+1), n_embed]."""
        cfg = self.config
        sam = self.sam_model(params["sam_model"], pixel_values)
        B, sh, sw, SC = sam.shape
        clip = self.vision_model(params["vision_model"], pixel_values,
                                 patch_embeds=sam)
        fused = jnp.concatenate(
            [clip[:, 1:], sam.reshape(B, sh * sw, SC)], axis=-1)
        feats = projector_forward(params["projector"],
                                  cfg.projector_config, fused)
        _, hw, D = feats.shape
        h = w = int(math.isqrt(hw))
        grid = feats.reshape(B, h, w, D)
        nl = jnp.broadcast_to(params["image_newline"].astype(grid.dtype),
                              (B, h, 1, D))
        grid = jnp.concatenate([grid, nl], axis=2).reshape(B, h * (w + 1),
                                                           D)
        sep = jnp.broadcast_to(params["view_separator"].astype(grid.dtype),
                               (B, 1, D))
        out = jnp.concatenate([grid, sep], axis=1)
        return out.reshape(-1, D)

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,  # [B, 3, H, W]
        image_features: Optional[jax.Array] = None,
        **aux,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"],
                                           input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        if image_features is None:
            px = pixel_values
            if px.ndim == 4 and px.shape[1] in (1, 3):
                px = px.transpose(0, 2, 3, 1)
            image_features = self.vision_features(params, px)
        return merge_input_ids_with_image_features(
            self.config.image_token_id, -1, image_features, embeds,
            input_ids)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache,
                                            position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return text_position_ids(input_ids, attention_mask)

    def vision_aux_inputs(self, grid_thw):
        return {}

    def sanitize(self, weights: dict) -> dict:
        out = {}
        conv_keys = ("patch_embed.proj.weight", "neck.0.weight",
                     "neck.2.weight", "net_2.weight", "net_3.weight",
                     "embeddings.patch_embedding.weight")
        for k, v in weights.items():
            if "position_ids" in k:
                continue
            if k.startswith("model."):
                rest = k[len("model."):]
                if rest.startswith(("vision_model.", "sam_model.",
                                    "projector.", "image_newline",
                                    "view_seperator", "view_separator")):
                    k = rest
                else:
                    k = "language_model.model." + rest
            elif k.startswith("lm_head"):
                k = "language_model." + k
            k = k.replace("view_seperator", "view_separator")
            if any(k.endswith(s) for s in conv_keys) and getattr(
                    v, "ndim", 0) == 4:
                # torch OIHW: square kernel LAST and out-channels first
                if v.shape[-1] == v.shape[-2] and v.shape[0] > v.shape[-1]:
                    v = np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
            out[k] = v
        out = SAMEncoder.split_blocks(out, self.config.sam_config,
                                      "sam_model.")
        return out

    @property
    def stack_patterns(self):
        # deepseek MLA layers stay unstacked (deepseek_v2 STACK_PATTERNS)
        return (
            "vision_model.transformer.layers",
            "sam_model.window_blocks",
            "sam_model.global_blocks",
        )
