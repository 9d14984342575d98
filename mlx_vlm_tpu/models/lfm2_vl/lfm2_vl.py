"""LFM2-VL: SigLIP2-NaViT tower + pixel unshuffle + LFM2 hybrid decoder.

Role parity: reference mlx_vlm/models/lfm2_vl — VisionEmbeddings (linear
patch embed + per-image bicubic-resized pos embeds):vision.py:53-121,
PixelUnshuffleBlock:lfm2_vl.py:41, Lfm2VlMultiModalProjector (LN + 2-layer
MLP):14-38, LFM2 text (models/lfm2).

TPU design: per-image pos-embed resize is the shared host-side 16-tap
bicubic plan (kimi_vl helper); patches arrive packed per image with static
spatial shapes, so the unshuffle is a static reshape.
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
from ...ops.attention import sdpa
from ..kimi_vl.kimi_vl import bicubic_pos_plan
from ..lfm2.lfm2 import LanguageModel
from ..lfm2.lfm2 import TextConfig as _Lfm2Text
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features

STACK_PATTERNS_VISION = ("vision_tower.encoder.layers",)


@dataclass
class TextConfig(_Lfm2Text):
    model_type: str = "lfm2"


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "lfm2_vl"
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    num_channels: int = 3
    patch_size: int = 16
    num_patches: int = 256
    layer_norm_eps: float = 1e-6


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "lfm2_vl"
    downsample_factor: int = 2
    image_token_index: int = 396
    projector_hidden_size: int = 2560
    projector_bias: bool = True
    projector_use_layernorm: bool = True
    vision_feature_layer: int = -1
    eos_token_id: Optional[List[int]] = None

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
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5
        self.side = int(config.num_patches**0.5)

    def __call__(self, params, pixel_values, segment_ids, pos_idx,
                 pos_weights):
        """pixel_values [N, C*P*P] packed patches -> last hidden [N, E]."""
        cfg = self.config
        emb = params["embeddings"]
        w = emb["patch_embedding"]["weight"]
        x = jnp.dot(pixel_values.astype(w.dtype), w.T)
        if "bias" in emb["patch_embedding"]:
            x = x + emb["patch_embedding"]["bias"]
        table = emb["position_embedding"]["weight"]
        pos = jnp.einsum(
            "kn,knd->nd", pos_weights.astype(jnp.float32),
            jnp.take(table, pos_idx, axis=0).astype(jnp.float32),
        )
        x = x + pos.astype(x.dtype)
        mask = (segment_ids[None, :] == segment_ids[:, None])[None, None]

        def layer(h, lp):
            y = layer_norm(lp["layer_norm1"], h, cfg.layer_norm_eps)
            y = self._attention(lp["self_attn"], y, mask)
            h = h + y
            y = layer_norm(lp["layer_norm2"], h, cfg.layer_norm_eps)
            y = linear(lp["mlp"]["fc2"],
                       jax.nn.gelu(linear(lp["mlp"]["fc1"], y),
                                   approximate=True))
            return h + y, None

        x, _ = jax.lax.scan(layer, x, params["encoder"]["layers"])
        return layer_norm(params["post_layernorm"], x, cfg.layer_norm_eps)

    def _attention(self, p, x, mask):
        N = x.shape[0]
        q = linear(p["q_proj"], x).reshape(N, self.num_heads, self.head_dim)
        k = linear(p["k_proj"], x).reshape(N, self.num_heads, self.head_dim)
        v = linear(p["v_proj"], x).reshape(N, self.num_heads, self.head_dim)
        out = sdpa(q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
                   v.transpose(1, 0, 2)[None], self.scale, mask)
        out = out[0].transpose(1, 0, 2).reshape(N, -1)
        return linear(p["out_proj"], out)

    @staticmethod
    def sanitize(weights: dict) -> dict:
        return {k: v for k, v in weights.items() if "position_ids" not in k}


def pixel_unshuffle(x: jax.Array, h: int, w: int, f: int) -> jax.Array:
    """[N=h*w, C] -> [h*w/f^2, C*f^2] — transposing pixel unshuffle
    (reference PixelUnshuffleBlock:41; h, w static)."""
    C = x.shape[-1]
    x = x.reshape(h, w, C)
    x = x.reshape(h, w // f, C * f)  # group adjacent columns
    x = x.transpose(1, 0, 2)
    x = x.reshape(w // f, h // f, C * f * f)  # group adjacent rows
    x = x.transpose(1, 0, 2)
    return x.reshape(-1, C * f * f)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = VisionModel(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)
        self.f = config.downsample_factor

    def vision_features(self, params, pixel_values, segment_ids, pos_idx,
                        pos_weights, spatial_shapes):
        hidden = self.vision_tower(
            params["vision_tower"], pixel_values, segment_ids, pos_idx,
            pos_weights,
        )
        parts = []
        off = 0
        for (h, w) in spatial_shapes:
            img = hidden[off:off + h * w]
            parts.append(pixel_unshuffle(img, h, w, self.f))
            off += h * w
        x = jnp.concatenate(parts, axis=0)
        mp = params["multi_modal_projector"]
        if self.config.projector_use_layernorm and "layer_norm" in mp:
            x = layer_norm(mp["layer_norm"], x, 1e-5)
        x = jax.nn.gelu(linear(mp["linear_1"], x), approximate=False)
        return linear(mp["linear_2"], x)

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,  # [N, C*P*P]
        segment_ids=None, pos_idx=None, pos_weights=None,
        spatial_shapes: Optional[tuple] = None,
        image_features: Optional[jax.Array] = None,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"], input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        feats = (
            image_features
            if image_features is not None
            else self.vision_features(
                params, pixel_values, segment_ids, pos_idx, pos_weights,
                spatial_shapes,
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
        grids = [(int(r[-2]), int(r[-1])) for r in np.asarray(grid_thw)]
        side = self.vision_tower.side
        idx, wgt = bicubic_pos_plan(grids, side, side)
        segs = np.concatenate(
            [np.full(h * w, i, np.int32) for i, (h, w) in enumerate(grids)]
        )
        return {
            "segment_ids": segs,
            "pos_idx": idx,
            "pos_weights": wgt,
            "spatial_shapes": tuple(grids),
        }

    def sanitize(self, weights: dict) -> dict:
        vt = {}
        rest = {}
        for k, v in weights.items():
            if k.startswith("model.vision_tower."):
                k = k[len("model."):]
            if k.startswith("model.multi_modal_projector."):
                k = k[len("model."):]
            if k.startswith("vision_tower."):
                vt[k] = v
            elif k.startswith("multi_modal_projector."):
                rest[k] = v
            else:
                if k.startswith("model.language_model."):
                    k = "model." + k[len("model.language_model."):]
                rest[k] = v
        vt = VisionModel.sanitize(vt)
        # language keys go through the lfm2 role-split sanitize
        from ..lfm2.lfm2 import Model as _Lfm2Model

        lm = _Lfm2Model.__new__(_Lfm2Model)
        lm.config = self.config.text_config
        lm.language_model = self.language_model
        lang = lm.sanitize(
            {k: v for k, v in rest.items()
             if not k.startswith("multi_modal_projector.")}
        )
        out = dict(lang)
        out.update(vt)
        out.update({k: v for k, v in rest.items()
                    if k.startswith("multi_modal_projector.")})
        return out

    @property
    def stack_patterns(self):
        return (
            "language_model.model.conv_layers",
            "language_model.model.attn_layers",
        ) + STACK_PATTERNS_VISION
