"""CLIP / SigLIP vision encoder (shared: llava family, gemma3, idefics, ...).

Role parity: reference mlx_vlm/models/llava/vision.py (ClipVisionModel:158,
VisionEmbeddings:108) which doubles as the SigLIP tower; and gemma3's SigLIP
(models/gemma3/vision.py:97).

TPU design:
- Conv2d(stride=kernel) patch embedding is a single MXU matmul over
  flattened patches.
- Encoder layers run under lax.scan over stacked weights; all intermediate
  hidden states fall out of the scan's ys, so `vision_feature_layer=-2`
  selection is a static index instead of a Python-loop capture.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import BaseModelConfig
from ..core.layers import layer_norm, linear
from ..ops.attention import sdpa

STACK_PREFIX = "vision_model.encoder.layers"


class TowerOutput(NamedTuple):
    pooled: "jax.Array"
    last_hidden: "jax.Array"  # pre-post_layernorm
    hidden_states: "jax.Array"  # [L+1, B, N, D]
    post_norm: "jax.Array"  # post_layernorm(last_hidden)


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "clip_vision_model"
    num_hidden_layers: int = 24
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    projection_dim: int = 768
    vocab_size: int = 32000
    num_channels: int = 3
    layer_norm_eps: float = 1e-5
    hidden_act: Optional[str] = None  # default by model_type


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name in ("gelu_pytorch_tanh", "gelu_tanh"):
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(f"unknown activation {name}")


def patchify_images(pixel_values: jax.Array, patch_size: int) -> jax.Array:
    """[B, C, H, W] -> [B, gh*gw, C*P*P] in torch-conv flatten order."""
    B, C, H, W = pixel_values.shape
    P = patch_size
    gh, gw = H // P, W // P
    x = pixel_values.reshape(B, C, gh, P, gw, P)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # B, gh, gw, C, P, P
    return x.reshape(B, gh * gw, C * P * P)


class ClipVisionTower:
    """Functional CLIP/SigLIP tower. Params keyed as HF `vision_model.*`."""

    def __init__(self, config: VisionConfig):
        self.config = config
        if config.model_type not in ("clip_vision_model", "siglip_vision_model"):
            raise ValueError(f"Unsupported vision model type: {config.model_type}")
        self.is_clip = config.model_type == "clip_vision_model"
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5
        act_name = config.hidden_act or (
            "quick_gelu" if self.is_clip else "gelu_pytorch_tanh"
        )
        self.act = _act(act_name)

    def __call__(self, params: dict, pixel_values: jax.Array) -> "TowerOutput":
        """pixel_values [B, C, H, W] -> TowerOutput(pooled, last_hidden,
        hidden_states [L+1, B, N, D], post_norm)."""
        cfg = self.config
        vm = params["vision_model"]
        emb = vm["embeddings"]
        patches = patchify_images(pixel_values, cfg.patch_size)
        w = emb["patch_embedding"]["weight"]  # [E, C*P*P]
        x = jnp.einsum(
            "bnd,ed->bne", patches.astype(w.dtype), w,
            preferred_element_type=jnp.float32,
        ).astype(w.dtype)
        if "bias" in emb["patch_embedding"]:
            x = x + emb["patch_embedding"]["bias"]
        B = x.shape[0]
        if self.is_clip:
            cls = jnp.broadcast_to(
                emb["class_embedding"][None, None, :], (B, 1, cfg.hidden_size)
            ).astype(x.dtype)
            x = jnp.concatenate([cls, x], axis=1)
        x = x + emb["position_embedding"]["weight"][None, : x.shape[1]]
        if self.is_clip and "pre_layrnorm" in vm:
            x = layer_norm(vm["pre_layrnorm"], x, cfg.layer_norm_eps)

        def layer(h, lp):
            y = layer_norm(lp["layer_norm1"], h, cfg.layer_norm_eps)
            y = self._attention(lp["self_attn"], y)
            h = h + y
            y = layer_norm(lp["layer_norm2"], h, cfg.layer_norm_eps)
            y = linear(lp["mlp"]["fc2"], self.act(linear(lp["mlp"]["fc1"], y)))
            h = h + y
            return h, h

        x0 = x
        x, states = jax.lax.scan(layer, x, vm["encoder"]["layers"])
        all_hidden = jnp.concatenate([x0[None], states], axis=0)  # [L+1,B,N,D]
        post = layer_norm(vm["post_layernorm"], x, cfg.layer_norm_eps)
        pooled = post[:, 0] if self.is_clip else post.mean(axis=1)
        return TowerOutput(pooled, x, all_hidden, post)

    def _attention(self, p, x):
        B, N, D = x.shape
        q = linear(p["q_proj"], x).reshape(B, N, self.num_heads, self.head_dim)
        k = linear(p["k_proj"], x).reshape(B, N, self.num_heads, self.head_dim)
        v = linear(p["v_proj"], x).reshape(B, N, self.num_heads, self.head_dim)
        out = sdpa(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            self.scale,
            None,
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
        return linear(p["out_proj"], out)

    @staticmethod
    def sanitize(weights: dict) -> dict:
        """Drop position_ids; flatten conv2d patch weight [E,C,P,P]->[E,CPP]."""
        out = {}
        for k, v in weights.items():
            if "position_ids" in k:
                continue
            if "patch_embedding.weight" in k and v.ndim == 4:
                v = v.reshape(v.shape[0], -1)
            out[k] = v
        return out
