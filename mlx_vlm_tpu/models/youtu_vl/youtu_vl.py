"""Youtu-VL: SigLIP2 NaViT tower (2-D rope, no abs pos) over an MLA MoE
decoder.

Role parity: reference mlx_vlm/models/youtu_vl/ — vision.py is a
variable-resolution SigLIP2 whose patches are LINEARLY embedded (no conv,
no positional table; qwen2-vl-style merge-interleaved 2-D rope instead,
rot_pos_emb:190) with packed per-image attention segments and an
RMSNorm+MLP VLPatchMerger (:364); language.py is DeepSeek-V2/V3 MLA with
noaux_tc sigmoid MoE routing (YoutuAttention:19, MoEGate:194) — reused
from our deepseek_v2 module (absorbed-latent decode).

TPU design: like qwen2_vl, all variable-resolution bookkeeping (rotary
angles, segment ids) is host-side planning; the tower itself is one
packed scan with a block-diagonal segment mask.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import layer_norm, linear, rms_norm
from ...core.rope import apply_rope
from ...ops.attention import sdpa
from ..deepseek_v2.deepseek_v2 import LanguageModel
from ..deepseek_v2.deepseek_v2 import ModelConfig as _DSConfig
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from ..qwen2_vl.vision import vision_rotary_and_segments


@dataclass
class TextConfig(_DSConfig):
    model_type: str = "youtu_vl"


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "siglip2_vision_model"
    hidden_size: int = 1152
    out_hidden_size: int = 2560
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    num_channels: int = 3
    patch_size: int = 16
    spatial_merge_size: int = 2
    layer_norm_eps: float = 1e-6
    temporal_patch_size: int = 1


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "youtu_vl"
    image_token_id: int = 128264
    video_token_id: int = 128265
    vision_start_token_id: int = 128262
    vision_end_token_id: int = 128263
    eos_token_id: Optional[List[int]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {})
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {})
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


class VisionModel:
    def __init__(self, config: VisionConfig):
        self.config = config
        self.n_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5

    def __call__(self, params, pixel_values, rotary_freqs, segment_ids):
        cfg = self.config
        h = linear(params["embeddings"]["patch_embedding"],
                   pixel_values.reshape(-1, pixel_values.shape[-1]))
        cos = jnp.cos(rotary_freqs)[None]
        sin = jnp.sin(rotary_freqs)[None]
        mask = (segment_ids[None, :] == segment_ids[:, None])[None, None]

        def block(h, lp):
            x = layer_norm(lp["layer_norm1"], h, cfg.layer_norm_eps)
            x = self._attention(lp["self_attn"], x, cos, sin, mask)
            h = h + x
            x = layer_norm(lp["layer_norm2"], h, cfg.layer_norm_eps)
            x = linear(lp["mlp"]["fc2"],
                       jax.nn.gelu(linear(lp["mlp"]["fc1"], x)))
            return h + x, None

        h, _ = jax.lax.scan(block, h, params["encoder"]["layers"])
        h = layer_norm(params["post_layernorm"], h, cfg.layer_norm_eps)
        # VLPatchMerger: RMSNorm then merge-group flatten + 2-layer MLP
        m = params["merger"]
        h = rms_norm(m["ln_q"], h, 1e-6)
        h = h.reshape(-1, cfg.hidden_size * cfg.spatial_merge_size**2)
        h = jax.nn.gelu(linear(m["mlp"]["0"], h), approximate=False)
        return linear(m["mlp"]["2"], h)

    def _attention(self, p, x, cos, sin, mask):
        N = x.shape[0]
        q = linear(p["q_proj"], x).reshape(N, self.n_heads, self.head_dim)
        k = linear(p["k_proj"], x).reshape(N, self.n_heads, self.head_dim)
        v = linear(p["v_proj"], x).reshape(N, self.n_heads, self.head_dim)
        q = q.transpose(1, 0, 2)[None]
        k = k.transpose(1, 0, 2)[None]
        v = v.transpose(1, 0, 2)[None]
        q, k = apply_rope(q, k, cos, sin)
        out = sdpa(q, k, v, self.scale, mask)
        out = out[0].transpose(1, 0, 2).reshape(N, -1)
        return linear(p["out_proj"], out)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = VisionModel(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)

    def vision_features(self, params, pixel_values, rotary_freqs,
                        segment_ids):
        return self.vision_tower(params["vision_tower"], pixel_values,
                                 rotary_freqs, segment_ids)

    def get_input_embeddings(self, params, input_ids, pixel_values=None,
                             rotary_freqs=None, segment_ids=None,
                             image_features=None, **aux):
        embeds = self.language_model.embed(params["language_model"],
                                           input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        if image_features is None:
            image_features = self.vision_features(
                params, pixel_values, rotary_freqs, segment_ids)
        return merge_input_ids_with_image_features(
            self.config.image_token_id, self.config.video_token_id,
            image_features, embeds, input_ids)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache,
                                            position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return text_position_ids(input_ids, attention_mask)

    def vision_aux_inputs(self, grid_thw):
        cfg = self.config.vision_config
        freqs, segs = vision_rotary_and_segments(
            np.asarray(grid_thw), cfg.spatial_merge_size,
            cfg.hidden_size // cfg.num_attention_heads)
        return {"rotary_freqs": freqs, "segment_ids": segs}

    def sanitize(self, weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "position_ids" in k or "position_embedding.weight" in k:
                continue
            if k.startswith("siglip2.vision_model."):
                k = k.replace("siglip2.vision_model.", "vision_tower.")
            elif k.startswith("siglip2."):
                k = k.replace("siglip2.", "vision_tower.")
            if k.startswith("merger."):
                k = "vision_tower." + k
            if k.startswith("model."):
                k = k.replace("model.", "language_model.model.", 1)
            if k.startswith("lm_head."):
                k = "language_model." + k
            out[k] = v
        if self.config.text_config.tie_word_embeddings:
            out.pop("language_model.lm_head.weight", None)
        return out

    @property
    def stack_patterns(self):
        a = self.config.text_config
        pats = ["vision_tower.encoder.layers"]
        if a.n_routed_experts:
            pats += [
                (f"language_model.model.layers.{i}.mlp.experts", 0)
                for i in range(a.first_k_dense_replace, a.num_hidden_layers)
            ]
        return tuple(pats)
