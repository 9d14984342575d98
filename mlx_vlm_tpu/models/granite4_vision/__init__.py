"""Granite-4 Vision VLM.

Role parity: reference mlx_vlm/models/granite4_vision — SigLIP tower
(conv patch embed + learned positions, post-LN features), the
WindowQFormer projector (downsampling.py:80): features are layer-normed,
split into window_side^2 windows, a query grid (query_side^2 learned
queries + area-interpolated downsampled features) cross-attends to each
window through a BLIP2 QFormer layer (self-attn -> cross-attn -> GELU
FFN, qformer.py:148), un-windowed and projected to the LLM width; the
text decoder is Granite (attention/residual/embedding multipliers,
logits_scaling) with the optional fused SharedMLP (language.py:57).

TPU design: the tower and the decoder ride the shared scan substrate
(granite = llama subclass with multiplier hooks); window partitioning
is static reshape/transpose; the QFormer batches every window of every
image through one attention call.  The fused SharedMLP checkpoint
layout is split to gate/up/down at sanitize so the decoder stays the
standard swiglu scan.  downsample_rate "q/w" interpolation is the area
mean over (w/q)-sized blocks.
"""

from __future__ import annotations

import inspect
import re
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import layer_norm, linear
from ...ops.attention import sdpa
from ..granite.granite import LanguageModel as _GraniteLM
from ..granite.granite import TextConfig as _GraniteText
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features


@dataclass
class TextConfig(_GraniteText):
    model_type: str = "granitemoehybrid"
    shared_intermediate_size: Optional[int] = None


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "siglip_vision_model"
    num_hidden_layers: int = 27
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_attention_heads: int = 16
    image_size: int = 384
    patch_size: int = 16
    num_channels: int = 3
    layer_norm_eps: float = 1e-6


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig = None
    vision_config: VisionConfig = None
    model_type: str = "granite4_vision"
    image_token_index: int = 100352
    vision_feature_select_strategy: str = "full"
    image_grid_pinpoints: Optional[List[List[int]]] = None
    downsample_rate: str = "4/8"
    use_image_newline_parameter: bool = True
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
    """SigLIP encoder: [B, H, W, 3] -> pre-pool features [B, N, E]."""

    def __init__(self, config: VisionConfig):
        self.config = config
        self.n_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5
        self.side = config.image_size // config.patch_size

    def __call__(self, params, pixel_values):
        cfg = self.config
        vm = params["vision_model"]
        emb = vm["embeddings"]
        P = cfg.patch_size
        w = emb["patch_embedding"]["weight"]  # HWIO
        x = jax.lax.conv_general_dilated(
            pixel_values.astype(w.dtype), w, (P, P), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + emb["patch_embedding"]["bias"]
        B = x.shape[0]
        x = x.reshape(B, -1, cfg.hidden_size)
        x = x + emb["position_embedding"]["weight"][None]

        def layer(h, lp):
            y = layer_norm(lp["layer_norm1"], h, cfg.layer_norm_eps)
            y = self._attention(lp["self_attn"], y)
            h = h + y
            y = layer_norm(lp["layer_norm2"], h, cfg.layer_norm_eps)
            y = linear(lp["mlp"]["fc2"],
                       jax.nn.gelu(linear(lp["mlp"]["fc1"], y),
                                   approximate=True))
            return h + y, None

        x, _ = jax.lax.scan(layer, x, vm["encoder"]["layers"])
        return x  # "full" select strategy: pre-post-LN features

    def _attention(self, p, x):
        B, N, _ = x.shape
        q = linear(p["q_proj"], x).reshape(B, N, self.n_heads, self.head_dim)
        k = linear(p["k_proj"], x).reshape(B, N, self.n_heads, self.head_dim)
        v = linear(p["v_proj"], x).reshape(B, N, self.n_heads, self.head_dim)
        out = sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                   v.transpose(0, 2, 1, 3), self.scale, None)
        return linear(p["out_proj"], out.transpose(0, 2, 1, 3
                                                   ).reshape(B, N, -1))


def _win(x, side, win):
    """[B, side*side, C] -> [B*n*n, win*win, C]."""
    B, _, C = x.shape
    n = side // win
    x = x.reshape(B, n, win, n, win, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B * n * n, win * win, C)


def _unwin(xw, n, win):
    Bnn, _, C = xw.shape
    B = Bnn // (n * n)
    xw = xw.reshape(B, n, n, win, win, C).transpose(0, 1, 3, 2, 4, 5)
    return xw.reshape(B, (n * win) ** 2, C)


def _qformer_attn(p, x, kv, n_heads):
    B, L, E = x.shape
    hd = E // n_heads
    q = linear(p["query"], x).reshape(B, L, n_heads, hd).transpose(0, 2, 1, 3)
    k = linear(p["key"], kv).reshape(B, -1, n_heads, hd).transpose(0, 2, 1, 3)
    v = linear(p["value"], kv).reshape(B, -1, n_heads, hd
                                       ).transpose(0, 2, 1, 3)
    out = sdpa(q, k, v, hd**-0.5, None)
    return out.transpose(0, 2, 1, 3).reshape(B, L, E)


class Model:
    CONFIG_CLS = ModelConfig

    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = _GraniteLM(config.text_config, config)
        self.vision_tower = VisionModel(config.vision_config)
        q, w = config.downsample_rate.split("/")
        self.query_side, self.window_side = int(q), int(w)

    # ----------------------------------------------------------- projector
    def _downsample(self, feats, side):
        """Area-interpolate [B, side^2, C] to the query grid (reference
        InterpolateDownsampler)."""
        B, _, C = feats.shape
        n = side // self.window_side
        new_side = n * self.query_side
        ratio = side // new_side
        x = feats.reshape(B, new_side, ratio, new_side, ratio, C)
        return x.mean(axis=(2, 4)).reshape(B, new_side * new_side, C)

    def _project(self, params, feats):
        cfg = self.config
        vp = params["multi_modal_projector"]
        side = self.vision_tower.side
        n = side // self.window_side
        x = layer_norm(vp["norm"], feats, 1e-6)
        enc = _win(x, side, self.window_side) + vp["image_positions"][0]
        down = self._downsample(x, side)
        qry = _win(down, n * self.query_side, self.query_side)
        qry = qry + vp["query"][0]
        qf = vp["qformer"]
        nh = max(1, cfg.vision_config.hidden_size // 64)
        h = layer_norm(qf["layernorm"], qry, 1e-6)
        for i in range(len(qf["encoder"]["layer"])):
            lp = qf["encoder"]["layer"][str(i)]
            a = lp["attention"]
            y = _qformer_attn(a["attention"], h, h, nh)
            h = layer_norm(a["output"]["LayerNorm"],
                           linear(a["output"]["dense"], y) + h, 1e-5)
            ca = lp["crossattention"]
            y = _qformer_attn(ca["attention"], h, enc, nh)
            h = layer_norm(ca["output"]["LayerNorm"],
                           linear(ca["output"]["dense"], y) + h, 1e-5)
            y = jax.nn.gelu(linear(lp["intermediate_query"]["dense"], h),
                            approximate=False)
            h = layer_norm(lp["output_query"]["LayerNorm"],
                           linear(lp["output_query"]["dense"], y) + h, 1e-5)
        out = _unwin(h, n, self.query_side)
        return linear(vp["out_linear"], out)

    # ------------------------------------------------------------- model
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
            feats = self.vision_tower(params["vision_tower"], px)
            image_features = self._project(params, feats)
            image_features = image_features.reshape(
                -1, image_features.shape[-1])
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
            if "position_ids" in k or "rotary_emb.inv_freq" in k:
                continue
            if k.startswith("model."):
                k = k[len("model."):]
            if ".shared_mlp.input_linear." in k:
                half = v.shape[0] // 2
                base = k.replace(".shared_mlp.input_linear.", ".mlp.")
                if not base.startswith("language_model."):
                    base = "language_model." + base
                suf = base.rsplit(".", 1)[-1]
                stem = base[: -(len(suf) + 1)]
                out[stem + ".gate_proj." + suf] = v[:half]
                out[stem + ".up_proj." + suf] = v[half:]
                continue
            k = k.replace(".shared_mlp.output_linear.", ".mlp.down_proj.")
            if "patch_embedding.weight" in k and getattr(v, "ndim", 0) == 4:
                v = np.transpose(np.asarray(v), (2, 3, 1, 0))  # OIHW->HWIO
            if k.startswith(("vision_tower.", "multi_modal_projector.")):
                out[k] = v
                continue
            if k.startswith("language_model."):
                out[k] = v
                continue
            out["language_model." + k] = v
        return out

    @property
    def stack_patterns(self):
        return ("language_model.model.layers",
                "vision_tower.vision_model.encoder.layers")


LanguageModel = _GraniteLM

__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig",
           "LanguageModel", "VisionModel"]
