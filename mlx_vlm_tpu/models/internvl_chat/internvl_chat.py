"""InternVL-Chat: InternViT tower + pixel-shuffle projector + qwen2/llama LLM.

Role parity: reference mlx_vlm/models/internvl_chat — InternViT
(qkv fused, flattened qk norms, layer scales ls1/ls2):vision.py:27-133,
pos-embed interpolation:vision.py:188, pixel_shuffle (transposing
variant):base.py:423, mlp1 projector:internvl_chat.py:25-31.

TPU design: tiles are fixed-size so the tower runs batched (no packed
sequences); encoder blocks scan over stacked weights with layer scales as
scanned leaves; the pos-embed interpolation is jax.image.resize (static
target shape).
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import layer_norm, linear, rms_norm
from ...ops.attention import sdpa
from ..llama.config import TextConfig as _LlamaText
from ..llama.language import LanguageModel
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features

STACK_PATTERNS = (
    "language_model.model.layers",
    "vision_model.encoder.layers",
)


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "intern_vit_6b"
    hidden_size: int = 1024
    num_attention_heads: int = 16
    patch_size: int = 14
    num_hidden_layers: int = 24
    intermediate_size: int = 4096
    image_size: int = 448
    num_channels: int = 3
    layer_norm_eps: float = 1e-6
    qkv_bias: bool = True
    qk_normalization: bool = False
    norm_type: str = "layer_norm"

    @classmethod
    def from_dict(cls, params):
        p = dict(params)
        for key in ("image_size", "patch_size"):
            v = p.get(key)
            if isinstance(v, (list, tuple)) and v:
                p[key] = int(v[0])
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in p.items() if k in allowed})


@dataclass
class TextConfig(_LlamaText):
    model_type: str = "qwen2"
    attention_bias: bool = True
    rope_theta: float = 1000000.0


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig = field(default_factory=TextConfig)
    vision_config: VisionConfig = field(default_factory=VisionConfig)
    model_type: str = "internvl_chat"
    ignore_index: int = -100
    image_token_index: int = 151667
    video_token_index: int = 151656
    vision_feature_select_strategy: str = "default"
    vision_feature_layer: int = -1
    downsample_ratio: float = 0.5
    eos_token_id: Optional[List[int]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        text = params.get("llm_config") or params.get("text_config") or {}
        params["text_config"] = TextConfig.from_dict(text)
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {}
        )
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


def pixel_shuffle_internvl(x: jax.Array, ratio: float) -> jax.Array:
    """Reference base.py:423 — transposing pixel shuffle, [B, N, C] ->
    [B, N*r*r, C/(r*r)]."""
    B, N, C = x.shape
    side = int(N**0.5)
    x = x.reshape(B, side, side, C)
    x = x.reshape(B, side, int(side * ratio), int(C / ratio))
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(B, int(side * ratio), int(side * ratio), int(C / ratio**2))
    x = x.transpose(0, 2, 1, 3)
    return x.reshape(B, -1, x.shape[-1])


class InternViT:
    def __init__(self, config: VisionConfig):
        self.config = config
        if config.model_type not in ("intern_vit_6b", "siglip_vision_model"):
            raise ValueError(f"Unsupported vision model type: {config.model_type}")
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5
        self.base_grid = config.image_size // config.patch_size

    def _norm(self, p, x):
        cfg = self.config
        if cfg.norm_type == "rms_norm":
            return rms_norm(p, x, cfg.layer_norm_eps)
        return layer_norm(p, x, cfg.layer_norm_eps)

    def __call__(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        """pixel_values [B, C, H, W] -> last hidden [B, 1+N, E]."""
        cfg = self.config
        from ..clip_vision import patchify_images

        emb = params["embeddings"]
        w = emb["patch_embedding"]["weight"]  # [E, C*P*P]
        patches = patchify_images(pixel_values, cfg.patch_size)
        x = jnp.einsum("bnd,ed->bne", patches.astype(w.dtype), w)
        if "bias" in emb["patch_embedding"]:
            x = x + emb["patch_embedding"]["bias"]
        B, N, E = x.shape
        H = pixel_values.shape[2] // cfg.patch_size
        W = pixel_values.shape[3] // cfg.patch_size
        cls = jnp.broadcast_to(
            emb["class_embedding"].reshape(1, 1, E), (B, 1, E)
        ).astype(x.dtype)
        pos = emb["position_embedding"].reshape(1, -1, E)  # [1, 1+base^2, E]
        pos_cls, pos_grid = pos[:, :1], pos[:, 1:]
        if (H, W) != (self.base_grid, self.base_grid):
            g = pos_grid.reshape(1, self.base_grid, self.base_grid, E)
            g = jax.image.resize(g, (1, H, W, E), method="bicubic")
            pos_grid = g.reshape(1, H * W, E)
        x = jnp.concatenate([cls, x], axis=1) + jnp.concatenate(
            [pos_cls, pos_grid], axis=1
        ).astype(x.dtype)

        def block(h, lp):
            y = self._norm(lp["norm1"], h)
            y = self._attention(lp["attn"], y)
            h = h + y * lp["ls1"]
            y = self._norm(lp["norm2"], h)
            y = linear(lp["mlp"]["fc2"],
                       jax.nn.gelu(linear(lp["mlp"]["fc1"], y), approximate=True))
            return h + y * lp["ls2"], None

        x, _ = jax.lax.scan(block, x, params["encoder"]["layers"])
        return x

    def _attention(self, p, x):
        cfg = self.config
        B, N, C = x.shape
        qkv = linear(p["qkv"], x).reshape(B, N, 3, C)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if cfg.qk_normalization:
            # norms apply over the FLATTENED head dims (reference vision.py:63)
            q = rms_norm(p["q_norm"], q, cfg.layer_norm_eps)
            k = rms_norm(p["k_norm"], k, cfg.layer_norm_eps)
        hd = self.head_dim
        q = q.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)
        out = sdpa(q, k, v, self.scale, None)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return linear(p["proj"], out)

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "position_ids" in k:
                continue
            if "patch_embedding.weight" in k and v.ndim == 4:
                v = v.reshape(v.shape[0], -1)
            out[k] = v
        return out


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_model = InternViT(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)
        self.ratio = config.downsample_ratio

    def vision_features(self, params, pixel_values):
        hidden = self.vision_model(params["vision_model"], pixel_values)
        hidden = hidden[:, 1:, :]  # drop CLS
        hidden = pixel_shuffle_internvl(hidden, self.ratio)
        mp = params["mlp1"]
        x = layer_norm(mp["0"], hidden, 1e-5)
        # reference uses exact-erf GELU here (nn.GELU() default)
        x = jax.nn.gelu(linear(mp["1"], x), approximate=False)
        x = linear(mp["3"], x)
        return x.reshape(-1, x.shape[-1])

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,  # [B_tiles, C, H, W]
        image_features: Optional[jax.Array] = None,
        **aux,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"], input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        feats = (
            image_features
            if image_features is not None
            else self.vision_features(params, pixel_values.astype(embeds.dtype))
        )
        return merge_input_ids_with_image_features(
            self.config.image_token_index, self.config.video_token_index,
            feats, embeds, input_ids,
        )

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache, position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return text_position_ids(input_ids, attention_mask)

    def vision_aux_inputs(self, grid_thw):
        return {}

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            out[k] = v
        vt = {k: v for k, v in out.items() if k.startswith("vision_model.")}
        vt = InternViT.sanitize(vt)
        out = {k: v for k, v in out.items() if not k.startswith("vision_model.")}
        out.update(vt)
        return out

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
