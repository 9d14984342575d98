"""Gemma3n audio tower: sub-sampling convs + chunked-conformer encoder.

Role parity: reference mlx_vlm/models/gemma3n/audio.py —
Gemma3nAudioRelativePositionEmbedding:41 (sinusoidal relative bias with the
pad-reshape-slice shift :83), Gemma3nAudioAttention:216 (chunked local
attention, per-dim softplus query scale, logit softcap 50),
Gemma3nCumulativeGroupNorm:465 (cumsum statistics over time),
SSCP conv stack:689 (reverse-causal time padding), conformer block:1037
(ffw(0.5 residual) -> attention -> gated causal light-conv -> ffw -> norm),
4x time reduction.

TPU design: the whole conformer stack is ONE lax.scan over stacked blocks;
chunking is a static reshape and the per-chunk context extraction is a
strided stack (U static slices traced once).  All convs run channels-last.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import linear, rms_norm


@dataclasses.dataclass
class AudioConfig(BaseModelConfig):
    model_type: str = "gemma3n_audio"
    input_feat_size: int = 80
    hidden_size: int = 1536
    conf_attention_chunk_size: int = 12
    conf_attention_context_left: int = 13
    conf_attention_context_right: int = 0
    conf_attention_invalid_logits_value: float = -1e9
    conf_attention_logit_cap: float = 50.0
    conf_num_attention_heads: int = 8
    conf_num_hidden_layers: int = 12
    conf_conv_kernel_size: int = 5
    conf_reduction_factor: int = 4
    conf_residual_weight: float = 0.5
    sscp_conv_channel_size: Tuple[int, int] = (128, 32)
    sscp_conv_kernel_size: Tuple[Tuple[int, int], ...] = ((3, 3), (3, 3))
    sscp_conv_stride_size: Tuple[Tuple[int, int], ...] = ((2, 2), (2, 2))
    sscp_conv_eps: float = 1e-3
    rms_norm_eps: float = 1e-6
    gradient_clipping: float = 10000000000.0
    vocab_size: int = 128
    vocab_offset: int = 262272

    def __post_init__(self):
        self.sscp_conv_kernel_size = tuple(
            tuple(k) for k in self.sscp_conv_kernel_size)
        self.sscp_conv_stride_size = tuple(
            tuple(s) for s in self.sscp_conv_stride_size)


def cumulative_group_norm(x: jax.Array, weight: Optional[jax.Array],
                          eps: float) -> jax.Array:
    """Group norm with CUMULATIVE time statistics (reference :465).

    x [B, T, *feat, C]: at step t, mean/var over all features of steps
    <= t — a pair of cumsums, fully parallel on TPU.
    """
    xf = x.astype(jnp.float32)
    red = tuple(range(2, xf.ndim))
    n_feat = np.prod(x.shape[2:])
    sum_t = jnp.sum(xf, axis=red, keepdims=True)
    cum_sum = jnp.cumsum(sum_t, axis=1)
    counts = jnp.cumsum(jnp.full((x.shape[0], x.shape[1]), n_feat,
                                 jnp.float32), axis=1)
    counts = counts.reshape(x.shape[0], x.shape[1],
                            *([1] * (xf.ndim - 2)))
    mean = cum_sum / counts
    sq = jnp.sum((xf - mean) ** 2, axis=red, keepdims=True)
    var = jnp.cumsum(sq, axis=1) / counts
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    return out.astype(x.dtype)


class AudioModel:
    """params = {"subsample_conv_projection": {conv_0, conv_1,
    input_proj_linear}, "conformer": <stacked block tree>}."""

    def __init__(self, config: AudioConfig):
        self.config = config
        c = config
        self.n_heads = c.conf_num_attention_heads
        self.head_dim = c.hidden_size // self.n_heads
        self.W = c.conf_attention_chunk_size
        self.L = max(0, c.conf_attention_context_left - 1)
        self.R = c.conf_attention_context_right
        self.C = self.W + self.L + self.R
        self.F = self.L + self.R + 1
        # sinusoidal table over relative positions [L .. -R]
        pos = np.arange(self.L, -self.R - 1, -1, dtype=np.float32)
        half = c.hidden_size // 2
        inc = math.log(1e4) / max(half - 1, 1)
        inv = np.exp(np.arange(half) * -inc)
        ang = pos[:, None] * inv[None, :]
        self._sin_table = jnp.asarray(
            np.concatenate([np.sin(ang), np.cos(ang)], -1), jnp.float32)
        # local causal validity [W, C]
        lower = np.tril(np.ones((self.C, self.W), bool), 0).T
        upper = np.tril(np.ones((self.W, self.C), bool), self.L + self.R)
        self._local_mask = jnp.asarray(lower & upper)

    # ----------------------------------------------------------------- sscp
    def _sscp_block(self, p, x, kernel, stride, eps):
        """x [B, T, F, Cin] -> relu(cum-group-norm(conv)) [B, T', F', Cout].
        Time pads reverse-causal (0, kh-1); freq pads (1, 1)."""
        kh, kw = kernel
        x = jnp.pad(x, ((0, 0), (0, kh - 1), (1, 1), (0, 0)))
        y = jax.lax.conv_general_dilated(
            x, p["conv"]["weight"].astype(x.dtype),
            window_strides=stride, padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        y = cumulative_group_norm(y, p["norm"]["weight"], eps)
        return jax.nn.relu(y)

    def subsample(self, params, audio_mel: jax.Array) -> jax.Array:
        """[B, T, F_in] mel -> [B, T//4, hidden] (reference :689)."""
        c = self.config
        sp = params["subsample_conv_projection"]
        x = audio_mel[..., None]  # NHWC with C=1
        x = self._sscp_block(sp["conv_0"], x, c.sscp_conv_kernel_size[0],
                             c.sscp_conv_stride_size[0], c.sscp_conv_eps)
        x = self._sscp_block(sp["conv_1"], x, c.sscp_conv_kernel_size[1],
                             c.sscp_conv_stride_size[1], c.sscp_conv_eps)
        B, T, F, Cc = x.shape
        x = x.reshape(B, T, F * Cc)
        return linear(sp["input_proj_linear"], x)

    # ------------------------------------------------------------ attention
    def _chunked_attention(self, p, x: jax.Array,
                           valid: jax.Array) -> jax.Array:
        """Local chunked attention with relative position bias.

        x [B, T, D], valid [B, T] bool -> [B, T, D]."""
        c = self.config
        B, T, D = x.shape
        N, H, W, C, F = self.n_heads, self.head_dim, self.W, self.C, self.F
        U = -(-T // W)
        Tp = U * W

        q = linear(p["q_proj"], x).reshape(B, T, N, H)
        k = linear(p["k_proj"], x).reshape(B, T, N, H)
        v = linear(p["v_proj"], x).reshape(B, T, N, H)
        scale = (H ** -0.5) / math.log(2.0)
        q = q * scale * jax.nn.softplus(p["per_dim_scale"]).astype(q.dtype)

        def to_blocks(a, fill=0.0):
            a = jnp.pad(a, ((0, 0), (0, Tp - T)) + ((0, 0),) * (a.ndim - 2),
                        constant_values=fill)
            return a.reshape(B, U, W, *a.shape[2:])

        def to_context(a, fill=0.0):
            a = jnp.pad(a, ((0, 0), (self.L, self.R + W - 1 + (Tp - T)))
                        + ((0, 0),) * (a.ndim - 2), constant_values=fill)
            return jnp.stack([a[:, i * W:i * W + C] for i in range(U)], 1)

        qb = to_blocks(q)                      # [B, U, W, N, H]
        kb = to_context(k)                     # [B, U, C, N, H]
        vb = to_context(v)
        vmask = to_context(valid, fill=False)  # [B, U, C]

        # content term [B, N, U, W, C]
        term_ac = jnp.einsum("buwnh,bucnh->bnuwc", qb.astype(jnp.float32),
                             kb.astype(jnp.float32))
        # relative-position term: project the sinusoid table, einsum, shift
        sin_emb = linear(p["relative_position_embedding"]["pos_proj"],
                         self._sin_table.astype(x.dtype))
        sin_emb = sin_emb.reshape(F, N, H)
        term_bd = jnp.einsum("buwnh,fnh->bnuwf", qb.astype(jnp.float32),
                             sin_emb.astype(jnp.float32))
        # pad-reshape-slice relative shift (reference :83)
        term_bd = jnp.pad(term_bd,
                          ((0, 0),) * 4 + ((0, (C + 1) - F),))
        term_bd = term_bd.reshape(B, N, U, W * (C + 1))[..., :W * C]
        term_bd = term_bd.reshape(B, N, U, W, C)

        logits = term_ac + term_bd
        cap = c.conf_attention_logit_cap
        logits = jnp.tanh(logits / cap) * cap
        ok = vmask[:, None, :, None, :] & self._local_mask[None, None, None]
        logits = jnp.where(ok, logits, c.conf_attention_invalid_logits_value)
        probs = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bnuwc,bucnh->buwnh", probs,
                         vb.astype(jnp.float32)).astype(x.dtype)
        return ctx.reshape(B, Tp, N * H)[:, :T]

    # ------------------------------------------------------------ conformer
    def _ffw(self, p, x, eps, clip):
        r = x
        x = jnp.clip(x, -clip, clip)
        x = rms_norm(p["pre_layer_norm"], x, eps)
        x = jax.nn.silu(linear(p["ffw_layer_1"], x))
        x = linear(p["ffw_layer_2"], x)
        x = jnp.clip(x, -clip, clip)
        x = rms_norm(p["post_layer_norm"], x, eps)
        return r + x * self.config.conf_residual_weight

    def _lconv(self, p, x, eps, clip):
        c = self.config
        r = x
        x = rms_norm(p["pre_layer_norm"], x, eps)
        x = linear(p["linear_start"], x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)  # GLU
        K = c.conf_conv_kernel_size
        x = jnp.pad(x, ((0, 0), (K - 1, 0), (0, 0)))  # causal
        w = p["depthwise_conv1d"]["weight"].astype(x.dtype)  # [C, K]
        x = jax.lax.conv_general_dilated(
            x, w.T[:, None, :],  # KIO with I=1 per group -> [K, 1, C]
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=c.hidden_size,
            preferred_element_type=jnp.float32).astype(x.dtype)
        x = jnp.clip(x, -clip, clip)
        x = rms_norm(p["conv_norm"], x, eps)
        x = jax.nn.silu(x)
        return r + linear(p["linear_end"], x)

    def _attn_block(self, p, x, valid, eps, clip):
        r = x
        x = jnp.clip(x, -clip, clip)
        x = rms_norm(p["pre_attn_norm"], x, eps)
        x = self._chunked_attention(p["attn"], x, valid)
        x = linear(p["post"], x)
        x = jnp.clip(x, -clip, clip)
        return r + rms_norm(p["post_norm"], x, eps)

    def __call__(self, params, audio_mel: jax.Array,
                 audio_mel_mask: Optional[jax.Array] = None):
        """mel [B, T, F_in] + padding mask [B, T] (True = padded) ->
        (features [B, T//(4*reduction), D], mask)."""
        c = self.config
        eps = c.rms_norm_eps
        clip = c.gradient_clipping
        h = self.subsample(params, audio_mel)
        B, T_sub, _ = h.shape
        stride = 1
        for s in c.sscp_conv_stride_size:
            stride *= s[0]
        if audio_mel_mask is None:
            audio_mel_mask = jnp.zeros(audio_mel.shape[:2], bool)
        idx = jnp.clip(jnp.arange(T_sub) * stride, 0,
                       audio_mel_mask.shape[1] - 1)
        mask = jnp.take(audio_mel_mask, idx, axis=1)  # [B, T_sub] padded
        valid = ~mask

        def block(h, lp):
            h = self._ffw(lp["ffw_layer_start"], h, eps, clip)
            h = self._attn_block(lp["attention"], h, valid, eps, clip)
            h = self._lconv(lp["lconv1d"],
                            h * valid[..., None].astype(h.dtype), eps, clip)
            h = self._ffw(lp["ffw_layer_end"], h, eps, clip)
            h = jnp.clip(h, -clip, clip)
            return rms_norm(lp["norm"], h, eps), None

        h, _ = jax.lax.scan(block, h, params["conformer"])
        if c.conf_reduction_factor > 1:
            h = h[:, ::c.conf_reduction_factor]
            mask = mask[:, ::c.conf_reduction_factor]
        h = jnp.where(mask[..., None], 0.0, h)
        return h, mask

    @staticmethod
    def sanitize(weights: dict) -> dict:
        """torch conv layouts -> channels-last (reference :1020)."""
        out = {}
        for k, v in weights.items():
            if "conv.weight" in k and getattr(v, "ndim", 0) == 4:
                # OIHW -> HWIO; HWIO is recognisable by its leading square
                # small kernel dims
                if not (v.shape[0] == v.shape[1] <= 7):
                    v = np.transpose(v, (2, 3, 1, 0))
            elif "depthwise_conv1d.weight" in k and getattr(v, "ndim",
                                                            0) == 3:
                v = np.asarray(v).reshape(v.shape[0], -1)  # [C,1,K] -> [C,K]
            out[k] = v
        return out
