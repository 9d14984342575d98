"""MiniCPM-V 4.6: variable-resolution SigLIP + windowed mergers over the
qwen3_5 hybrid (GDN + attention) decoder.

Role parity: reference mlx_vlm/models/minicpmv4_6/ — SigLIP embeddings
with fractional-bucket position ids per target grid (vision.py:176),
VitMerger 2x2 windowed self-attention + wide MLP with mean-residual
(minicpmv4_6.py:90), Merger MLP stack halving the grid again (:105),
qwen3_5 decoder reused (language.py:8).

TPU design: position buckets are HOST-side planning (pos_ids aux); the
image grid is captured at prepare_position_ids so the merger reshapes
stay static.  v1 ports the single-image path; features replace the
image-token positions via the standard masked scatter.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import List, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import layer_norm, linear
from ...ops.attention import sdpa
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from ..qwen3_5.config import ModelConfig as _Q35ModelConfig
from ..qwen3_5.config import TextConfig as _Q35Text
from ..qwen3_5.qwen3_5 import Model as _Q35Model


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "siglip_vision_model"
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    image_size: int = 448
    patch_size: int = 14
    num_channels: int = 3
    layer_norm_eps: float = 1e-6
    window_kernel_size: Tuple[int, int] = (2, 2)

    @property
    def window_intermediate_size(self):
        return (self.intermediate_size * self.window_kernel_size[0]
                * self.window_kernel_size[1])


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: _Q35Text
    vision_config: VisionConfig
    model_type: str = "minicpmv4_6"
    image_token_id: int = 0  # processor's <unk> fill token
    query_num: int = 64
    merge_kernel_size: Tuple[int, int] = (2, 2)
    merger_times: int = 1
    eos_token_id: Optional[Union[int, List[int]]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = _Q35Text.from_dict(
            params.get("text_config", {}) or {})
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {})
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


def position_bucket_ids(h: int, w: int, side: int) -> np.ndarray:
    """Fractional-bucket pos ids for an (h, w) patch grid against the
    side x side learned table (reference vision.py:_build_position_buckets).
    """
    bounds = np.arange(1, side) / side
    fh = np.clip(np.arange(h) / max(h, 1), 0, 1 - 1e-6)
    fw = np.clip(np.arange(w) / max(w, 1), 0, 1 - 1e-6)
    bh = (fh[:, None] >= bounds[None, :]).sum(1)
    bw = (fw[:, None] >= bounds[None, :]).sum(1)
    return (bh[:, None] * side + bw[None, :]).reshape(-1).astype(np.int32)


class SiglipTower:
    def __init__(self, config: VisionConfig):
        self.config = config
        self.n_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5

    def __call__(self, params, pixel_values, pos_ids):
        cfg = self.config
        P = cfg.patch_size
        emb = params["embeddings"]
        w = emb["patch_embedding"]["weight"]  # HWIO
        x = jax.lax.conv_general_dilated(
            pixel_values, w.astype(pixel_values.dtype), (P, P), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(pixel_values.dtype)
        x = x + emb["patch_embedding"]["bias"].astype(x.dtype)
        B = x.shape[0]
        x = x.reshape(B, -1, cfg.hidden_size)
        table = emb["position_embedding"]["weight"]
        x = x + jnp.take(table, pos_ids, axis=0)[None].astype(x.dtype)

        def block(h, lp):
            y = layer_norm(lp["layer_norm1"], h, cfg.layer_norm_eps)
            B_, L, _ = y.shape
            sa = lp["self_attn"]
            q = linear(sa["q_proj"], y).reshape(B_, L, self.n_heads,
                                                self.head_dim)
            k = linear(sa["k_proj"], y).reshape(B_, L, self.n_heads,
                                                self.head_dim)
            v = linear(sa["v_proj"], y).reshape(B_, L, self.n_heads,
                                                self.head_dim)
            o = sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                     v.transpose(0, 2, 1, 3), self.scale, None)
            o = o.transpose(0, 2, 1, 3).reshape(B_, L, -1)
            h = h + linear(sa["out_proj"], o)
            y = layer_norm(lp["layer_norm2"], h, cfg.layer_norm_eps)
            z = linear(lp["mlp"]["fc1"], y)
            z = jax.nn.gelu(z, approximate=True)
            h = h + linear(lp["mlp"]["fc2"], z)
            return h, None

        x, _ = jax.lax.scan(block, x, params["encoder"]["layers"])
        return layer_norm(params["post_layernorm"], x, cfg.layer_norm_eps)


def vit_merger(params, x, grid_h: int, grid_w: int, n_heads: int):
    """2x2 windowed self-attention + wide MLP with mean residual
    (reference VitMerger:90)."""
    E = x.shape[-1]
    gh, gw = 2, 2
    mh, mw = grid_h // gh, grid_w // gw
    win = x.reshape(grid_h, grid_w, E).reshape(mh, gh, mw, gw, E)
    win = win.transpose(0, 2, 1, 3, 4).reshape(mh * mw, gh * gw, E)
    normed = layer_norm(params["layer_norm1"], win, 1e-6)
    hd = E // n_heads
    q = linear(params["self_attn"]["q_proj"], normed).reshape(
        -1, gh * gw, n_heads, hd).transpose(0, 2, 1, 3)
    k = linear(params["self_attn"]["k_proj"], normed).reshape(
        -1, gh * gw, n_heads, hd).transpose(0, 2, 1, 3)
    v = linear(params["self_attn"]["v_proj"], normed).reshape(
        -1, gh * gw, n_heads, hd).transpose(0, 2, 1, 3)
    o = sdpa(q, k, v, hd**-0.5, None)
    o = o.transpose(0, 2, 1, 3).reshape(-1, gh * gw, E)
    win = win + linear(params["self_attn"]["out_proj"], o)
    residual = win.mean(axis=1)
    merged = layer_norm(params["pre_norm"], win.reshape(mh * mw, -1), 1e-6)
    merged = jax.nn.gelu(linear(params["linear_1"], merged),
                         approximate=False)
    merged = linear(params["linear_2"], merged)
    return merged + residual, mh, mw


def merger(params, x, grid_h: int, grid_w: int, times: int):
    """Window-flatten MLP stack halving the grid per step
    (reference Merger:105)."""
    cur_h, cur_w = grid_h, grid_w
    for i in range(times):
        E = x.shape[-1]
        mh, mw = cur_h // 2, cur_w // 2
        win = x.reshape(cur_h, cur_w, E).reshape(mh, 2, mw, 2, E)
        win = win.transpose(0, 2, 1, 3, 4).reshape(mh * mw, 4 * E)
        p = params["mlp"][str(i)]
        y = layer_norm(p["pre_norm"], win, 1e-6)
        y = jax.nn.gelu(linear(p["linear_1"], y), approximate=False)
        x = linear(p["linear_2"], y)
        cur_h, cur_w = mh, mw
    return x


class Model(_Q35Model):
    def __init__(self, config: ModelConfig):
        # qwen3_5 hybrid decoder without its own vision tower
        self.config = config
        from ..qwen3_next.language import LanguageModel as _HybridLM

        self.language_model = _HybridLM(config.text_config, config)
        self.vision_tower = SiglipTower(config.vision_config)
        self.interval = config.text_config.full_attention_interval
        self._grid: Tuple[int, int] = (0, 0)

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        if image_grid_thw is not None:
            g = np.asarray(image_grid_thw)[0]
            self._grid = (int(g[-2]), int(g[-1]))
        return text_position_ids(input_ids, attention_mask)

    def vision_aux_inputs(self, grid_thw):
        cfg = self.config.vision_config
        g = np.asarray(grid_thw)[0]
        h, w = int(g[-2]), int(g[-1])
        self._grid = (h, w)
        side = cfg.image_size // cfg.patch_size
        return {"pos_ids": position_bucket_ids(h, w, side)}

    def vision_features(self, params, pixel_values, pos_ids):
        cfg = self.config.vision_config
        h, w = self._grid
        feats = self.vision_tower(params["vision_tower"], pixel_values,
                                  pos_ids)[0]
        x, mh, mw = vit_merger(params["vit_merger"], feats, h, w,
                               cfg.num_attention_heads)
        return merger(params["merger"], x, mh, mw,
                      self.config.merger_times)

    def get_input_embeddings(self, params, input_ids, pixel_values=None,
                             pos_ids=None, image_features=None, **aux):
        lm = params["language_model"]
        embeds = self.language_model.embed(lm, input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        if image_features is None:
            px = pixel_values
            if px.ndim == 4 and px.shape[1] in (1, 3):
                px = px.transpose(0, 2, 3, 1)
            image_features = self.vision_features(params, px, pos_ids)
        return merge_input_ids_with_image_features(
            self.config.image_token_id, -1, image_features, embeds,
            input_ids)

    def sanitize(self, weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "position_ids" in k:
                continue
            # vision/merger namespaces (with or without a model. prefix)
            kv = k[len("model."):] if k.startswith("model.") else k
            if kv.startswith(("vpm.", "vision_tower.", "vit_merger.",
                              "merger.")):
                k = kv.replace("vpm.", "vision_tower.", 1)
                if k.startswith("vision_tower.vit_merger."):
                    k = k[len("vision_tower."):]
            elif k.startswith("llm."):
                # route through the qwen3_5 HF-style remap (keeps its
                # zero-centered-norm shift heuristic consistent)
                k = "model.language_model." + k[len("llm.model."):] if (
                    k.startswith("llm.model.")) else k.replace(
                    "llm.", "", 1)
            if (k == "vision_tower.embeddings.patch_embedding.weight"
                    and getattr(v, "ndim", 0) == 4):
                v = np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
            out[k] = v
        # the qwen3_5 text side handles its own renames/role split
        lm = {k: v for k, v in out.items()
              if k.startswith(("language_model.", "model.language_model.",
                               "lm_head."))}
        lm = super().sanitize(lm)
        out = {k: v for k, v in out.items()
               if not k.startswith(("language_model.",
                                    "model.language_model.", "lm_head."))}
        out.update(lm)
        return out

    @property
    def stack_patterns(self):
        pats = tuple(p for p in super().stack_patterns
                     if p != "vision_tower.blocks")
        return pats + ("vision_tower.encoder.layers",)
