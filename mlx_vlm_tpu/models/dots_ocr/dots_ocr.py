"""dots.ocr: RMSNorm NaViT (SwiGLU FFN) + qwen2 decoder.

Role parity: reference mlx_vlm/models/dots_ocr — DotsPatchEmbed (frame-0 of
the temporal patch + RMSNorm):vision.py:158, DotsVisionBlock (RMSNorm +
fused qkv + SwiGLU FFN):196, qwen2_vl-style 2-D rotary/merge ordering:246,
PatchMerger (LayerNorm -> 2x2 merge -> MLP):71, qwen2 text decoder
(dots_ocr.py:7 via llava_bunny.language).

TPU design: packed-sequence scanned tower with segment masks and host-side
rotary (shared with qwen2_vl); the decoder is the shared llama/qwen2 scan.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import layer_norm, linear, rms_norm
from ...core.rope import apply_rope
from ...ops.attention import sdpa
from ..llama.config import TextConfig as _LlamaText
from ..llama.language import LanguageModel
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from ..qwen2_vl.vision import vision_rotary_and_segments

STACK_PATTERNS = (
    "language_model.model.layers",
    "vision_tower.blocks",
)


@dataclass
class TextConfig(_LlamaText):
    model_type: str = "qwen2"
    attention_bias: bool = True
    rope_theta: float = 1000000.0


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "dots_vit"
    embed_dim: int = 1536
    hidden_size: int = 1536
    intermediate_size: int = 4224
    num_hidden_layers: int = 42
    num_attention_heads: int = 12
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 1
    rms_norm_eps: float = 1e-5
    use_bias: bool = False
    post_norm: bool = True
    num_channels: int = 3


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "dots_ocr"
    image_token_id: int = 151665
    video_token_id: int = 151656
    eos_token_id: Optional[list] = None

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


class VisionModel:
    def __init__(self, config: VisionConfig):
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.embed_dim // config.num_attention_heads
        self.scale = self.head_dim**-0.5
        self.mu = config.spatial_merge_size**2

    def __call__(self, params, pixel_values, rotary_freqs, segment_ids):
        """pixel_values [N, C*T*P*P] -> merged features [N/mu, hidden]."""
        cfg = self.config
        E = cfg.embed_dim
        # frame 0 of the temporal patch (reference DotsPatchEmbed:174-178)
        pv = pixel_values.reshape(
            pixel_values.shape[0], cfg.num_channels, cfg.temporal_patch_size,
            cfg.patch_size * cfg.patch_size,
        )[:, :, 0].reshape(pixel_values.shape[0], -1)
        pe = params["patch_embed"]["patchifier"]
        w = pe["proj"]["weight"]  # [E, C*P*P]
        h = jnp.dot(pv.astype(w.dtype), w.T)
        if "bias" in pe["proj"]:
            h = h + pe["proj"]["bias"]
        h = rms_norm(pe["norm"], h, cfg.rms_norm_eps)

        cos = jnp.cos(rotary_freqs)[None]
        sin = jnp.sin(rotary_freqs)[None]
        mask = (segment_ids[None, :] == segment_ids[:, None])[None, None]

        def block(h, lp):
            x = rms_norm(lp["norm1"], h, cfg.rms_norm_eps)
            x = self._attention(lp["attn"], x, cos, sin, mask)
            h = h + x
            x = rms_norm(lp["norm2"], h, cfg.rms_norm_eps)
            g = linear(lp["mlp"]["fc1"], x)
            u = linear(lp["mlp"]["fc3"], x)
            h = h + linear(lp["mlp"]["fc2"], jax.nn.silu(g) * u)
            return h, None

        h, _ = jax.lax.scan(block, h, params["blocks"])
        if cfg.post_norm:
            h = rms_norm(params["post_trunk_norm"], h, cfg.rms_norm_eps)
        mp = params["merger"]
        x = layer_norm(mp["ln_q"], h, 1e-6).reshape(-1, self.mu * E)
        x = jax.nn.gelu(linear(mp["mlp"]["0"], x), approximate=False)
        return linear(mp["mlp"]["2"], x)

    def _attention(self, p, x, cos, sin, mask):
        N = x.shape[0]
        qkv = linear(p["qkv"], x).reshape(N, 3, self.num_heads, self.head_dim)
        q = qkv[:, 0].transpose(1, 0, 2)[None]
        k = qkv[:, 1].transpose(1, 0, 2)[None]
        v = qkv[:, 2].transpose(1, 0, 2)[None]
        q, k = apply_rope(q, k, cos, sin)
        out = sdpa(q, k, v, self.scale, mask)
        out = out[0].transpose(1, 0, 2).reshape(N, -1)
        return linear(p["proj"], out)

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "position_ids" in k:
                continue
            if "patchifier.proj.weight" in k and v.ndim == 4:
                v = v.reshape(v.shape[0], -1)
            out[k] = v
        return out


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = VisionModel(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)

    def vision_features(self, params, pixel_values, rotary_freqs, segment_ids):
        return self.vision_tower(
            params["vision_tower"], pixel_values, rotary_freqs, segment_ids
        )

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,
        rotary_freqs=None, segment_ids=None,
        image_features: Optional[jax.Array] = None,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"], input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        feats = (
            image_features
            if image_features is not None
            else self.vision_features(params, pixel_values, rotary_freqs,
                                      segment_ids)
        )
        return merge_input_ids_with_image_features(
            self.config.image_token_id, self.config.video_token_id,
            feats, embeds, input_ids,
        )

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache, position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return text_position_ids(input_ids, attention_mask)

    def vision_aux_inputs(self, grid_thw: np.ndarray) -> dict:
        freqs, segs = vision_rotary_and_segments(
            grid_thw, self.config.vision_config.spatial_merge_size,
            self.vision_tower.head_dim,
        )
        return {"rotary_freqs": freqs, "segment_ids": segs}

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            if k.startswith("model."):
                k = "language_model." + k
            elif k.startswith("lm_head"):
                k = "language_model." + k
            out[k] = v
        vt = {k: v for k, v in out.items() if k.startswith("vision_tower.")}
        vt = VisionModel.sanitize(vt)
        out = {k: v for k, v in out.items() if not k.startswith("vision_tower.")}
        out.update(vt)
        return out

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
