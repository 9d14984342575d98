"""Qwen3-Omni code2wav: codec tokens -> waveform (BigVGAN-style vocoder).

Role parity: reference mlx_vlm/models/qwen3_omni_moe/code2wav.py —
multi-codebook embedding mean, sliding-window pre-transformer with layer
scale, ConvNeXt upsampling stages, and a SnakeBeta/causal-conv decoder
with chunked decoding for long sequences.

TPU design: everything runs channels-last [B, L, C].
- Causal Conv1d is left-padded `lax.conv_general_dilated` ("NWC").
- CausalTransConv1d lowers to an input-dilated conv with the kernel
  spatially flipped — the exact fractionally-strided equivalence, no
  scatter.  ConvTranspose weights stay torch (in, out, k) at sanitize.
- The sliding-window causal mask is a trace-time constant.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import linear, rms_norm
from .config import Code2WavConfig


def causal_conv1d(p: dict, x: jax.Array, dilation: int = 1,
                  groups: int = 1) -> jax.Array:
    """x [B, L, Cin]; weight torch (out, in/groups, k) pre-sanitized to
    (k, in/groups, out).  Left pad (k-1)*dilation (stride 1)."""
    w = p["weight"].astype(x.dtype)
    k = w.shape[0]
    pad = (k - 1) * dilation
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad, 0)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def causal_trans_conv1d(p: dict, x: jax.Array, stride: int) -> jax.Array:
    """ConvTranspose1d(k, s) + right-trim (k-s) — causal upsampling.

    weight stays torch (in, out, k); the transposed conv is computed as
    an input-dilated conv with the kernel flipped along k."""
    w = p["weight"]                                  # [in, out, k]
    k = w.shape[-1]
    wf = jnp.flip(w, axis=-1).transpose(2, 0, 1).astype(x.dtype)  # [k,in,out]
    y = jax.lax.conv_general_dilated(
        x, wf, window_strides=(1,), padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    # torch output length (L-1)*s + k, then trim (k - s) on the right
    return y[:, : y.shape[1] - (k - stride)]


def snake_beta(p: dict, x: jax.Array) -> jax.Array:
    """x + (1/e^beta) * sin^2(x * e^alpha), per channel."""
    alpha = jnp.exp(p["alpha"].astype(jnp.float32))
    beta = jnp.exp(p["beta"].astype(jnp.float32))
    xf = x.astype(jnp.float32)
    return (xf + (1.0 / (beta + 1e-9)) * jnp.sin(xf * alpha) ** 2).astype(
        x.dtype)


def _layer_norm(p: dict, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * p["weight"]
            + p["bias"]).astype(x.dtype)


def convnext_block(p: dict, x: jax.Array) -> jax.Array:
    C = x.shape[-1]
    r = x
    h = causal_conv1d(p["dwconv"]["conv"], x, groups=C)
    h = _layer_norm(p["norm"], h)
    h = linear(p["pwconv2"], jax.nn.gelu(linear(p["pwconv1"], h)))
    return r + p["gamma"] * h


def _res_unit(p: dict, x: jax.Array, dilation: int) -> jax.Array:
    r = x
    h = snake_beta(p["act1"], x)
    h = causal_conv1d(p["conv1"]["conv"], h, dilation=dilation)
    h = snake_beta(p["act2"], h)
    h = causal_conv1d(p["conv2"]["conv"], h)
    return h + r


def _rope_cos_sin(L: int, head_dim: int, theta: float):
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float32)
                           / head_dim))
    t = np.arange(L, dtype=np.float32)
    f = np.outer(t, inv)
    emb = np.concatenate([f, f], axis=-1)
    return np.cos(emb), np.sin(emb)


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _pre_transformer(p: dict, cfg: Code2WavConfig, x: jax.Array
                     ) -> jax.Array:
    B, L, D = x.shape
    nH = cfg.num_attention_heads
    hd = D // nH
    cos, sin = _rope_cos_sin(L, hd, cfg.rope_theta)
    cos = jnp.asarray(cos, x.dtype)[None, None]
    sin = jnp.asarray(sin, x.dtype)[None, None]
    # sliding-window causal mask (trace-time constant)
    i = np.arange(L)[:, None]
    j = np.arange(L)[None, :]
    ok = (j <= i)
    if cfg.sliding_window:
        ok &= (i - j) < cfg.sliding_window
    mask = jnp.asarray(np.where(ok, 0.0, -1e9), jnp.float32)[None, None]

    for li in range(cfg.num_hidden_layers):
        lp = p["layers"][str(li)]
        h = rms_norm(lp["input_layernorm"], x, cfg.rms_norm_eps)
        ap = lp["self_attn"]
        q = linear(ap["q_proj"], h).reshape(B, L, nH, hd).transpose(
            0, 2, 1, 3)
        k = linear(ap["k_proj"], h).reshape(B, L, -1, hd).transpose(
            0, 2, 1, 3)
        v = linear(ap["v_proj"], h).reshape(B, L, -1, hd).transpose(
            0, 2, 1, 3)
        q = q * cos + _rotate_half(q) * sin
        k = k * cos + _rotate_half(k) * sin
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5) + mask
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v).transpose(0, 2, 1, 3)
        o = linear(ap["o_proj"], o.reshape(B, L, D))
        x = x + lp["self_attn_layer_scale"]["scale"] * o
        h = rms_norm(lp["post_attention_layernorm"], x, cfg.rms_norm_eps)
        m = linear(lp["mlp"]["down_proj"],
                   jax.nn.silu(linear(lp["mlp"]["gate_proj"], h))
                   * linear(lp["mlp"]["up_proj"], h))
        x = x + lp["mlp_layer_scale"]["scale"] * m
    return rms_norm(p["norm"], x, cfg.rms_norm_eps)


class Code2Wav:
    """Functional vocoder over params["code2wav"]."""

    def __init__(self, config: Code2WavConfig):
        self.config = config
        self._fns = {}

    def upsample_factor(self) -> int:
        f = 1
        for r in self.config.upsampling_ratios:
            f *= r
        for r in self.config.upsample_rates:
            f *= r
        return f

    def __call__(self, p: dict, codes: jax.Array) -> jax.Array:
        """codes [B, Q, L] -> waveform [B, samples] in [-1, 1]."""
        cfg = self.config
        offs = (jnp.arange(cfg.num_quantizers, dtype=jnp.int32)
                * cfg.codebook_size)[None, :, None]
        emb = p["code_embedding"]["weight"][codes + offs]   # [B,Q,L,D]
        hidden = emb.mean(axis=1)                           # [B,L,D]
        hidden = _pre_transformer(p["pre_transformer"], cfg, hidden)
        for i, factor in enumerate(cfg.upsampling_ratios):
            up = p["upsample"][str(i)]
            hidden = causal_trans_conv1d(up["0"]["conv"], hidden, factor)
            hidden = convnext_block(up["1"], hidden)
        wav = causal_conv1d(p["decoder"]["0"]["conv"], hidden)
        for bi, rate in enumerate(cfg.upsample_rates):
            bp = p["decoder"][str(bi + 1)]["block"]
            wav = snake_beta(bp["0"], wav)
            wav = causal_trans_conv1d(bp["1"]["conv"], wav, rate)
            for ri, dil in enumerate((1, 3, 9)):
                wav = _res_unit(bp[str(2 + ri)], wav, dil)
        nb = len(cfg.upsample_rates)
        wav = snake_beta(p["decoder"][str(nb + 1)], wav)
        wav = causal_conv1d(p["decoder"][str(nb + 2)]["conv"], wav)
        return jnp.clip(wav[..., 0], -1, 1)

    def chunked_decode(self, p: dict, codes: np.ndarray,
                       chunk_size: int = 300,
                       left_context_size: int = 25) -> np.ndarray:
        """Fixed-size chunks with left context, valid regions concatenated
        (reference code2wav.py chunked_decode)."""
        up = self.upsample_factor()
        B, Q, L = codes.shape
        if L == 0:
            return np.zeros((B, 0), np.float32)
        fn = self._fns.get("fwd")
        if fn is None:
            fn = self._fns["fwd"] = jax.jit(
                lambda pp, c: self(pp, c))
        out = []
        for start in range(0, L, chunk_size):
            end = min(start + chunk_size, L)
            ctx = max(0, start - left_context_size)
            wav = np.asarray(fn(p, jnp.asarray(codes[:, :, ctx:end])))
            s0 = (start - ctx) * up
            out.append(wav[:, s0: s0 + (end - start) * up])
        return np.concatenate(out, axis=-1).astype(np.float32)
