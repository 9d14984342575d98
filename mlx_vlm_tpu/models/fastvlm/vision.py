"""FastViT-HD conv-hybrid tower (inference/reparameterized form).

Role parity: reference mlx_vlm/models/fastvlm/vision.py — MobileOne
convolutional stem (:519), five metaformer stages (RepMixer token mixers
for the first three, MHSA for the last two, token_mixers config :44),
RepCPE conditional position conv before the attention stages,
ReparamLargeKernelConv+MobileOne patch-merging between stages, SE-gated
MobileOne expansion (conv_exp) before the feature output.

TPU design: every structurally-repeated stage runs as ONE `lax.scan`
over its stacked block weights; ConvFFN BatchNorms are folded into the
depthwise conv at sanitize (inference form), so the hot path is pure
conv/matmul + gelu with static shapes throughout.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import linear
from ...ops.attention import sdpa


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "fastvithd"
    hidden_size: int = 1024
    image_size: int = 1024
    patch_size: int = 64
    down_patch_size: int = 7
    down_stride: int = 2
    cls_ratio: float = 2.0
    layers: List[int] = field(default_factory=lambda: [2, 12, 24, 4, 2])
    embed_dims: List[int] = field(
        default_factory=lambda: [96, 192, 384, 768, 1536])
    mlp_ratios: List[int] = field(default_factory=lambda: [4, 4, 4, 4, 4])
    pos_embs_shapes: List[Optional[Tuple[int, int]]] = field(
        default_factory=lambda: [None, None, None, (7, 7), (7, 7)])
    token_mixers: List[str] = field(
        default_factory=lambda: ["repmixer", "repmixer", "repmixer",
                                 "attention", "attention"])
    repmixer_kernel_size: int = 3
    head_dim: int = 32


def conv2d(p, x, stride=1, padding=0, groups=1):
    """NHWC conv with HWIO kernel (sanitized from torch OIHW)."""
    w = p["weight"]
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def se_block(p, x):
    """Squeeze-excite gate (reference SEBlock:430)."""
    g = x.mean(axis=(1, 2), keepdims=True)
    g = jax.nn.relu(conv2d(p["reduce"], g))
    g = jax.nn.sigmoid(conv2d(p["expand"], g))
    return x * g


def mobileone(p, x, stride=1, padding=0, groups=1, use_se=False):
    y = conv2d(p["reparam_conv"], x, stride, padding, groups)
    if use_se:
        y = se_block(p["se"], y)
    return jax.nn.gelu(y, approximate=False)


def conv_ffn(p, x, dim):
    """7x7 depthwise (BN folded) + 1x1 fc1/gelu/fc2 (reference :79)."""
    y = conv2d(p["conv"]["conv"], x, padding=3, groups=dim)
    y = conv2d(p["fc1"], y)
    y = jax.nn.gelu(y, approximate=False)
    return conv2d(p["fc2"], y)


def norm_channel(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xn * p["weight"] + p["bias"]).astype(x.dtype)


class VisionModel:
    def __init__(self, config: VisionConfig):
        self.config = config
        # network index plan mirroring reference build_fast_vit_network
        plan = []
        idx = 0
        n_stage = len(config.layers)
        for i in range(n_stage):
            if config.pos_embs_shapes[i] is not None:
                plan.append(("cpe", idx, i))
                idx += 1
            plan.append(("stage", idx, i))
            idx += 1
            if i < n_stage - 1:
                plan.append(("pe", idx, i))
                idx += 1
        self.plan = plan

    def _mhsa(self, p, x, dim):
        B, H, W, C = x.shape
        hd = self.config.head_dim
        nh = dim // hd
        t = x.reshape(B, H * W, C)
        qkv = linear(p["qkv"], t).reshape(B, H * W, 3, nh, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        o = sdpa(q, k, v, hd**-0.5, None)
        o = o.transpose(0, 2, 1, 3).reshape(B, H * W, C)
        return linear(p["proj"], o).reshape(B, H, W, C)

    def __call__(self, params, pixel_values):
        """[B, H, W, 3] -> feature map [B, h, w, C_out]."""
        cfg = self.config
        vp = params["vision_model"]
        x = pixel_values
        stem = vp["patch_embed"]["blocks"]
        d0 = cfg.embed_dims[0]
        x = mobileone(stem["0"], x, stride=2, padding=1)
        x = mobileone(stem["1"], x, stride=2, padding=1, groups=d0)
        x = mobileone(stem["2"], x)

        net = vp["network"]
        for kind, idx, i in self.plan:
            p = net[str(idx)]
            dim = cfg.embed_dims[i]
            if kind == "cpe":
                ks = cfg.pos_embs_shapes[i][0]
                x = conv2d(p["reparam_conv"], x, padding=ks // 2,
                           groups=dim)
            elif kind == "pe":
                nxt = cfg.embed_dims[i + 1]
                y = conv2d(p["proj"]["0"]["lkb_reparam"], x,
                           stride=cfg.down_stride,
                           padding=cfg.down_patch_size // 2, groups=dim)
                y = jax.nn.gelu(y, approximate=False)
                x = mobileone(p["proj"]["1"], y)
            elif cfg.token_mixers[i] == "repmixer":
                def rep_block(x, lp):
                    y = conv2d(lp["token_mixer"]["reparam_conv"], x,
                               padding=cfg.repmixer_kernel_size // 2,
                               groups=dim)
                    y = y + lp["layer_scale"] * conv_ffn(lp["convffn"], y,
                                                         dim)
                    return y, None

                x, _ = jax.lax.scan(rep_block, x, p["blocks"])
            else:
                def attn_block(x, lp):
                    y = x + lp["layer_scale_1"] * self._mhsa(
                        lp["token_mixer"], norm_channel(lp["norm"], x),
                        dim)
                    y = y + lp["layer_scale_2"] * conv_ffn(lp["convffn"],
                                                           y, dim)
                    return y, None

                x, _ = jax.lax.scan(attn_block, x, p["blocks"])

        # SE-gated depthwise expansion (conv_exp)
        dl = cfg.embed_dims[-1]
        x = mobileone(vp["conv_exp"], x, padding=1, groups=dl, use_se=True)
        return x

    @staticmethod
    def fold_bn(weights: dict, eps: float = 1e-5) -> dict:
        """Fold ConvFFN BatchNorms into the preceding depthwise conv
        (inference reparameterization)."""
        out = dict(weights)
        bn_bases = {k[: -len(".conv.bn.weight")]
                    for k in weights if k.endswith(".conv.bn.weight")}
        for base in bn_bases:
            gamma = np.asarray(out.pop(f"{base}.conv.bn.weight"))
            beta = np.asarray(out.pop(f"{base}.conv.bn.bias"))
            mean = np.asarray(out.pop(f"{base}.conv.bn.running_mean"))
            var = np.asarray(out.pop(f"{base}.conv.bn.running_var"))
            out.pop(f"{base}.conv.bn.num_batches_tracked", None)
            scale = gamma / np.sqrt(var + eps)
            wk = f"{base}.conv.conv.weight"
            w = np.asarray(out[wk])  # torch OIHW [O, I/g, kh, kw]
            out[wk] = (w * scale[:, None, None, None]).astype(w.dtype)
            out[f"{base}.conv.conv.bias"] = (
                beta - mean * scale).astype(w.dtype)
        return out
