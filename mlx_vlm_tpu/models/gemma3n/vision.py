"""Gemma3n vision tower: MobileNetV5 + multi-scale fusion adapter.

Role parity: reference mlx_vlm/models/gemma3n/vision.py —
gemma3n_mobilenet_def:834 (4 stages: edge residuals, universal inverted
residuals, and multi-query attention pairs), RMSNormAct2d:137 (per-pixel
channel RMS + GELU), EdgeResidual:406, UniversalInvertedResidual:160,
MobileAttention:474 / MultiQueryAttention2d:619 (single shared K/V head),
MobileNetV5MultiScaleFusionAdapter:19 (stage-3/4 fuse -> UIR ffn -> pool).

TPU design: the block plan is STATIC (hard-coded in the architecture
definition), so the whole tower traces once into a single XLA program of
fused conv+norm+act ops; channels-last everywhere.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig


@dataclasses.dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "gemma3n_vision"
    hidden_size: int = 2048
    vocab_size: int = 128
    vocab_offset: int = 262144
    rms_norm_eps: float = 1e-6


# ------------------------------------------------------------------- blocks

def _same_pad(x, k: int, s: int):
    """TF-SAME padding for spatial dims of NHWC."""
    ih, iw = x.shape[1], x.shape[2]

    def pad_amt(i):
        return max((-(-i // s)) * s - s + k - i, 0) if s > 1 else max(k - 1,
                                                                      0)
    ph, pw = pad_amt(ih), pad_amt(iw)
    return jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                       (pw // 2, pw - pw // 2), (0, 0)))


def _conv(p, x, stride=1, groups=1, same=False, k=None):
    w = p["weight"].astype(x.dtype)  # HWIO
    kh = w.shape[0]
    if same:
        x = _same_pad(x, kh, stride)
        pad = "VALID"
    else:
        pad = [(kh // 2, kh // 2)] * 2 if kh > 1 else "VALID"
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _rms_act(p, x, act=True, eps=1e-5):
    """Per-pixel channel RMS norm (+ optional GELU) on NHWC."""
    xf = x.astype(jnp.float32)
    v = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = (xf * jax.lax.rsqrt(v + eps)).astype(x.dtype)
    if "weight" in p:
        y = y * p["weight"].astype(x.dtype)
    return jax.nn.gelu(y, approximate=False) if act else y


def _conv_norm_act(p, x, stride=1, groups=1, same=False, act=True):
    return _rms_act(p["bn"], _conv(p["conv"], x, stride, groups, same), act)


# static block plan (reference gemma3n_mobilenet_def:834)
def _er(k, f, s=1, e=4.0):
    return ("er", k, f, s, e)


def _uir(ks, km, f, s=1, e=4.0):
    return ("uir", ks, km, f, s, e)


def _mqa(nh, kd, kvs):
    return ("mqa", nh, kd, kvs)


def mobilenet_def():
    return [
        [_er(3, 128, 2)] + [_er(3, 128, 1)] * 2,
        [_uir(3, 5, 256, 2, 6.0)] + [_uir(k, 0, 256) for k in
                                     (5, 3, 5, 3)],
        [_uir(5, 5, 640, 2, 6.0)] + [_uir(5, 0, 640)] * 7
        + [_uir(0, 0, 640, 1, 1.0)]
        + [_mqa(12, 64, 2), _uir(0, 0, 640, 1, 2.0)] * 14,
        [_uir(5, 5, 1280, 2, 6.0)]
        + [_mqa(16, 96, 1), _uir(0, 0, 1280, 1, 2.0)] * 19,
    ]


def _make_divisible(v, divisor=8, round_limit=0.9):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < round_limit * v:
        new_v += divisor
    return new_v


def _edge_residual(p, x, k, stride):
    shortcut = x
    y = _conv(p["conv_exp"], x, stride, same=True)
    y = _rms_act(p["bn1"], y, act=True)
    y = _conv(p["conv_pwl"], y)
    y = _rms_act(p["bn2"], y, act=False)
    if stride == 1 and shortcut.shape == y.shape:
        y = y + shortcut
    return y


def _uir_block(p, x, ks, km, stride):
    shortcut = x
    if "dw_start" in p:
        c = x.shape[-1]
        y = _conv_norm_act(p["dw_start"], x,
                           stride=stride if not km else 1, groups=c,
                           act=False)
    else:
        y = x
    y = _conv_norm_act(p["pw_exp"], y, act=True)
    if "dw_mid" in p:
        y = _conv_norm_act(p["dw_mid"], y, stride=stride,
                           groups=y.shape[-1], same=True, act=True)
    y = _conv_norm_act(p["pw_proj"], y, act=False)
    if "layer_scale" in p:
        y = y * p["layer_scale"]["gamma"].astype(y.dtype)
    if stride == 1 and shortcut.shape == y.shape:
        y = y + shortcut
    return y


def _mqa_block(p, x, num_heads, key_dim, kv_stride):
    """Mobile multi-query attention: per-head queries, ONE shared K/V."""
    shortcut = x
    B, H, W, C = x.shape
    y = _rms_act(p["norm"], x, act=False)
    ap = p["attn"]
    q = _conv(ap["query"]["proj"], y)  # [B, H, W, nh*kd]
    q = q.reshape(B, H * W, num_heads, key_dim).transpose(0, 2, 1, 3)

    def kv(side):
        z = y
        if "down_conv" in ap[side]:
            z = _conv(ap[side]["down_conv"], z, stride=kv_stride,
                      groups=C, same=True)
            z = _rms_act(ap[side]["norm"], z, act=False, eps=1e-6)
        z = _conv(ap[side]["proj"], z)  # [B, h', w', kd]
        return z.reshape(B, 1, -1, z.shape[-1])

    k = kv("key")
    v = kv("value")
    logits = (q.astype(jnp.float32) * (key_dim ** -0.5)) @ k.astype(
        jnp.float32).transpose(0, 1, 3, 2)
    probs = jax.nn.softmax(logits, axis=-1)
    o = (probs @ v.astype(jnp.float32)).astype(x.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(B, H, W, num_heads * key_dim)
    o = _conv(ap["output"]["proj"], o)
    if "layer_scale" in p:
        o = o * p["layer_scale"]["gamma"].astype(o.dtype)
    return o + shortcut


class VisionTower:
    """params mirror the HF timm layout under `timm_model.`."""

    def __init__(self, config: VisionConfig):
        self.config = config
        self.plan = mobilenet_def()
        self.msfa_output_resolution = (16, 16)

    def __call__(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        """[B, C, H, W] -> fused feature map [B, 16, 16, 2048]."""
        tm = params["timm_model"]
        x = pixel_values.transpose(0, 2, 3, 1)  # NHWC
        x = _conv_norm_act(tm["conv_stem"], x, stride=2, same=True,
                           act=True)
        intermediates = []
        for stage, blocks in enumerate(self.plan):
            sp = tm["blocks"][str(stage)]
            for i, spec in enumerate(blocks):
                p = sp[str(i)]
                if spec[0] == "er":
                    _, k, f, s, e = spec
                    x = _edge_residual(p, x, k, s)
                elif spec[0] == "uir":
                    _, ks, km, f, s, e = spec
                    x = _uir_block(p, x, ks, km, s)
                else:
                    _, nh, kd, kvs = spec
                    x = _mqa_block(p, x, nh, kd, kvs)
            if stage + 1 in (3, 4):
                intermediates.append(x)

        # multi-scale fusion: upsample later stages to the first's res,
        # concat channels, UIR ffn, pool to 16x16, norm
        hi_h, hi_w = intermediates[0].shape[1:3]
        ups = [intermediates[0]]
        for t in intermediates[1:]:
            rep_h, rep_w = hi_h // t.shape[1], hi_w // t.shape[2]
            ups.append(jnp.repeat(jnp.repeat(t, rep_h, 1), rep_w, 2))
        fused = jnp.concatenate(ups, axis=-1)
        mp = params["msfa"]
        y = _uir_block(mp["ffn"], fused, 0, 0, 1)
        oh, ow = self.msfa_output_resolution
        if (hi_h, hi_w) != (oh, ow):
            sh, sw = hi_h // oh, hi_w // ow
            B, Hh, Ww, Cc = y.shape
            y = y.reshape(B, oh, sh, ow, sw, Cc).mean(axis=(2, 4))
            y = _rms_act(mp["norm"], y, act=False, eps=1e-6)
        return y

    @staticmethod
    def sanitize(weights: dict) -> dict:
        """torch OIHW convs -> HWIO."""
        out = {}
        for k, v in weights.items():
            if (("conv" in k or "proj" in k or "down_conv" in k)
                    and k.endswith(".weight") and getattr(v, "ndim",
                                                          0) == 4):
                # HWIO is recognisable by its leading square small kernel
                if not (v.shape[0] == v.shape[1] <= 7):
                    v = np.transpose(v, (2, 3, 1, 0))
            out[k] = v
        return out
