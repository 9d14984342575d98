"""PaddleOCR-VL: NaViT tower (abs+rotary positions) + ernie-class decoder
with sectioned M-RoPE.

Role parity: reference mlx_vlm/models/paddleocr_vl/ —
PaddleOCRRotaryEmbedding "sectioned_half_split" (language.py:19 — the
section-modulo layout over [freqs|freqs] reduces to the chunked t/h/w map
on the half dim, i.e. our standard M-RoPE), biased attention projections
(language.py:54), PaddleOCRVisionEmbeddings bilinear-interpolated absolute
positions + 2-D rotary (vision.py:63), spatial-merge MLP projector
(vision.py:149).
"""

from __future__ import annotations

import dataclasses
import inspect
from typing import List, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import layer_norm, linear
from ...core.rope import apply_rope, default_inv_freq
from ...ops.attention import sdpa
from ..llama.config import TextConfig as _LlamaText
from ..llama.language import LanguageModel as _LlamaLM
from ..qwen2_vl.language import mrope_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features

STACK_PATTERNS = (
    "language_model.model.layers",
    "vision_tower.encoder.layers",
)


@dataclasses.dataclass
class TextConfig(_LlamaText):
    model_type: str = "paddleocr_vl_text"
    use_bias: bool = True

    @classmethod
    def from_dict(cls, d: dict) -> "TextConfig":
        d = dict(d)
        rp = d.pop("rope_parameters", None) or d.get("rope_scaling") or {}
        if rp and "mrope_section" in rp:
            d["rope_scaling"] = {"type": "default",
                                 "mrope_section": rp["mrope_section"]}
            d.setdefault("rope_theta", rp.get("rope_theta",
                                              d.get("rope_theta", 500000)))
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in d.items() if k in allowed})


@dataclasses.dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "paddleocr_vl_vision"
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    patch_size: int = 14
    num_channels: int = 3
    image_size: int = 384
    spatial_merge_size: int = 2
    layer_norm_eps: float = 1e-6


@dataclasses.dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "paddleocr_vl"
    image_token_id: int = 100295
    video_token_id: int = -1
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


class PaddleOCRVisionTower:
    """params = {"embeddings": {patch_embedding, position_embedding},
    "encoder": {"layers"(stacked)}, "post_layernorm", "projector"}."""

    def __init__(self, config: VisionConfig):
        self.config = config
        self.n_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5

    def _interp_pos(self, params, gh: int, gw: int) -> jax.Array:
        """Bilinear interpolation of the square position table
        (reference interpolate_pos_encoding:86)."""
        table = params["embeddings"]["position_embedding"]["weight"]
        edge = int(round(table.shape[0] ** 0.5))
        E = table.shape[-1]
        base = table.reshape(edge, edge, E).astype(jnp.float32)
        hc = (jnp.arange(gh) + 0.5) * (edge / gh) - 0.5
        wc = (jnp.arange(gw) + 0.5) * (edge / gw) - 0.5
        i0 = jnp.clip(jnp.floor(hc).astype(jnp.int32), 0, edge - 1)
        j0 = jnp.clip(jnp.floor(wc).astype(jnp.int32), 0, edge - 1)
        i1 = jnp.minimum(i0 + 1, edge - 1)
        j1 = jnp.minimum(j0 + 1, edge - 1)
        di = jnp.clip(hc - i0, 0, 1)[:, None, None]
        dj = jnp.clip(wc - j0, 0, 1)[None, :, None]
        out = ((1 - di) * (1 - dj) * base[i0][:, j0]
               + (1 - di) * dj * base[i0][:, j1]
               + di * (1 - dj) * base[i1][:, j0]
               + di * dj * base[i1][:, j1])
        return out.reshape(gh * gw, E)

    def _rotary(self, gh: int, gw: int) -> np.ndarray:
        """Raster-order 2-D rotary freqs [N, head_dim/2]."""
        inv = default_inv_freq(self.head_dim // 2, 10000.0)
        hpos = np.repeat(np.arange(gh), gw)
        wpos = np.tile(np.arange(gw), gh)
        pos = np.stack([hpos, wpos], -1)  # [N, 2]
        f = pos[..., None] * inv[None, None, :]
        return f.reshape(pos.shape[0], -1).astype(np.float32)

    def __call__(self, params, pixel_values: jax.Array,
                 grid_hw: Tuple[int, int]) -> jax.Array:
        """[N, C*P*P] patches of one image -> projected tokens
        [N/merge^2, D_text]."""
        c = self.config
        gh, gw = grid_hw
        P, C = c.patch_size, c.num_channels
        N = pixel_values.shape[0]
        x = pixel_values.reshape(N, C, P, P).transpose(0, 2, 3, 1)
        w = params["embeddings"]["patch_embedding"]["weight"]
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(P, P), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        x = x.reshape(1, N, -1)
        if "bias" in params["embeddings"]["patch_embedding"]:
            x = x + params["embeddings"]["patch_embedding"]["bias"].astype(
                x.dtype)
        x = x + self._interp_pos(params, gh, gw)[None].astype(x.dtype)

        freqs = jnp.asarray(self._rotary(gh, gw))
        cos, sin = jnp.cos(freqs)[None], jnp.sin(freqs)[None]

        def block(h, lp):
            y = layer_norm(lp["layer_norm1"], h, c.layer_norm_eps)
            B, L, E = y.shape
            qkv = linear(lp["self_attn"]["qkv"], y).reshape(
                B, L, 3, self.n_heads, self.head_dim)
            q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
            q, k = apply_rope(q, k, cos, sin)
            o = sdpa(q, k, v, self.scale, None)
            o = o.transpose(0, 2, 1, 3).reshape(B, L, E)
            h = h + linear(lp["self_attn"]["out_proj"], o)
            y = layer_norm(lp["layer_norm2"], h, c.layer_norm_eps)
            h = h + linear(lp["mlp"]["fc2"], jax.nn.gelu(
                linear(lp["mlp"]["fc1"], y), approximate=False))
            return h, None

        x, _ = jax.lax.scan(block, x, params["encoder"]["layers"])
        x = layer_norm(params["post_layernorm"], x, c.layer_norm_eps)

        # spatial-merge projector (reference PaddleOCRProjector:149)
        pp = params["projector"]
        m = c.spatial_merge_size
        E = c.hidden_size
        x = layer_norm(pp["pre_norm"], x, 1e-6)
        x = x.reshape(gh // m, m, gw // m, m, E).transpose(
            0, 2, 1, 3, 4).reshape(-1, m * m * E)
        x = jax.nn.gelu(linear(pp["linear_1"], x), approximate=False)
        return linear(pp["linear_2"], x)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = PaddleOCRVisionTower(config.vision_config)
        self.language_model = _LlamaLM(config.text_config, config)

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
        return merge_input_ids_with_image_features(
            self.config.image_token_id, self.config.video_token_id, feats,
            embeds, input_ids)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache,
                                            position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return mrope_position_ids(
            np.asarray(input_ids), image_grid_thw, video_grid_thw,
            attention_mask,
            merge=self.config.vision_config.spatial_merge_size,
            image_token_id=self.config.image_token_id,
            video_token_id=self.config.video_token_id,
        )

    def vision_aux_inputs(self, grid_thw):
        g = np.asarray(grid_thw).reshape(-1, 3)
        return {"grid_hw": (int(g[0, 1]), int(g[0, 2]))}

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            if k.startswith("visual.") or k.startswith("vision_model."):
                k = "vision_tower." + k.split(".", 1)[1]
            elif k.startswith("model.visual."):
                k = "vision_tower." + k[len("model.visual."):]
            elif k.startswith("model."):
                k = "language_model." + k
            elif k.startswith("lm_head"):
                k = "language_model." + k
            if "patch_embedding.weight" in k and getattr(v, "ndim", 0) == 4:
                if not (v.shape[0] == v.shape[1] <= 16):
                    v = np.transpose(v, (2, 3, 1, 0))
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
