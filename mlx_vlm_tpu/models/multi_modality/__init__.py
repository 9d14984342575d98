"""DeepSeek-VL v1 ("multi_modality"): timm-SigLIP tower + llama decoder.

Role parity: reference mlx_vlm/models/multi_modality/ — timm-style
SigLIP (conv patchify, learned pos, biased-qkv pre-LN blocks with
fast-gelu MLP, final LayerNorm, vision.py:241), mlp_gelu aligner
(multi_modality.py:127), llama text decoder, image tokens spliced at
image_token_index.

The 7B HybridVisionTower (SAM high-res + SigLIP low-res with
hd-alpha mixing, vision.py:381) is not yet ported; plain-SigLIP
checkpoints (deepseek-vl-1.3b line) are covered.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import layer_norm, linear
from ...ops.attention import sdpa
from ..llama.config import TextConfig as _LlamaText
from ..llama.language import LanguageModel
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features


@dataclass
class TextConfig(_LlamaText):
    model_type: str = "llama"


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "vision"
    cls: Optional[str] = None
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 384
    patch_size: int = 16
    num_channels: int = 3
    layer_norm_eps: float = 1e-6
    params: dict = field(default_factory=dict)

    def __post_init__(self):
        p = self.params or {}
        for k in ("image_size", "patch_size"):
            if k in p:
                setattr(self, k, p[k])
        if "width" in p:
            self.hidden_size = p["width"]
        if "layers" in p:
            self.num_hidden_layers = p["layers"]


@dataclass
class ProjectorConfig(BaseModelConfig):
    model_type: str = "aligner"
    cls: str = "MlpProjector"
    params: dict = field(default_factory=dict)


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    projector_config: ProjectorConfig
    model_type: str = "multi_modality"
    image_token_index: int = 100015
    num_image_tokens: int = 576
    select_layer: int = -1
    vision_feature_select_strategy: str = "default"
    eos_token_id: Optional[Union[int, List[int]]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("language_config", params.get("text_config", {}))
            or {})
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {})
        params["projector_config"] = ProjectorConfig.from_dict(
            params.get("aligner_config",
                       params.get("projector_config", {})) or {})
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


class SigLipTower:
    def __init__(self, config: VisionConfig):
        self.config = config
        if config.cls == "HybridVisionTower":
            raise NotImplementedError(
                "multi_modality HybridVisionTower (SAM+SigLIP) is not "
                "ported yet; plain SigLIP checkpoints are supported")
        self.n_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5

    def __call__(self, params, pixel_values):
        cfg = self.config
        P = cfg.patch_size
        w = params["patch_embed"]["proj"]["weight"]  # HWIO (sanitized)
        x = jax.lax.conv_general_dilated(
            pixel_values, w.astype(pixel_values.dtype), (P, P), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(pixel_values.dtype)
        x = x + params["patch_embed"]["proj"]["bias"].astype(x.dtype)
        B = x.shape[0]
        x = x.reshape(B, -1, cfg.hidden_size)
        x = x + params["pos_embed"].astype(x.dtype)

        def block(h, lp):
            y = layer_norm(lp["norm1"], h, cfg.layer_norm_eps)
            B_, L, _ = y.shape
            qkv = linear(lp["attn"]["qkv"], y).reshape(
                B_, L, 3, self.n_heads, self.head_dim)
            q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3)
                       for i in range(3))
            o = sdpa(q, k, v, self.scale, None)
            o = o.transpose(0, 2, 1, 3).reshape(B_, L, -1)
            h = h + linear(lp["attn"]["proj"], o)
            y = layer_norm(lp["norm2"], h, cfg.layer_norm_eps)
            # timm fast-gelu MLP (reference FastGELUActivation:165)
            z = linear(lp["mlp"]["fc1"], y)
            z = 0.5 * z * (1.0 + jnp.tanh(
                z * 0.7978845608 * (1.0 + 0.044715 * z * z)))
            h = h + linear(lp["mlp"]["fc2"], z)
            return h, None

        x, _ = jax.lax.scan(block, x, params["blocks"])
        return layer_norm(params["norm"], x, 1e-5)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_model = SigLipTower(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)
        self.proj_depth = int(
            (config.projector_config.params or {}).get("depth", 2))

    def _project(self, params, x):
        al = params["aligner"]["layers"]
        x = linear(al["0"], x)
        for d in range(1, self.proj_depth):
            x = linear(al[str(2 * d)],
                       jax.nn.gelu(x, approximate=False))
        return x

    def vision_features(self, params, pixel_values):
        feats = self.vision_model(params["vision_model"], pixel_values)
        return self._project(params, feats).reshape(
            -1, self.config.text_config.hidden_size)

    def get_input_embeddings(self, params, input_ids, pixel_values=None,
                             image_features=None, **aux):
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
            self.config.image_token_index, -1, image_features, embeds,
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
        for k, v in weights.items():
            if "attn_pool" in k or "position_ids" in k:
                continue  # pooling head unused (ignore_head)
            if k.startswith("vision_model.vision_tower."):
                k = "vision_model." + k[len("vision_model.vision_tower."):]
            if k == "vision_model.pos_embed" and getattr(v, "ndim",
                                                         0) == 3:
                v = np.asarray(v)[0][None]
            if (k == "vision_model.patch_embed.proj.weight"
                    and getattr(v, "ndim", 0) == 4):
                v = np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
            if k.startswith("language_model.model.") or k.startswith(
                    "language_model.lm_head"):
                pass
            elif k.startswith("language_model."):
                k = ("language_model.model."
                     + k[len("language_model."):])
                if "lm_head" in k:
                    k = k.replace("model.lm_head", "lm_head")
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return ("vision_model.blocks", "language_model.model.layers")
