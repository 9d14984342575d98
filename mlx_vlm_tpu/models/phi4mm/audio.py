"""Phi-4-multimodal Cascades Conformer audio encoder.

Role parity: reference mlx_vlm/models/phi4mm/audio.py — ConformerEncoder:593
(MeanVarianceNorm -> NeMo conv subsampling -> T5 relative bias -> 24 blocks),
AudioProjection:781.

TPU design vs the reference:
- The 24 conformer blocks run under `lax.scan` over STACKED weights (one
  compiled block body) instead of a Python loop of modules.
- The causal depthwise conv pads LEFT by (k-1) directly instead of the
  reference's symmetric-pad-then-trim-the-tail (audio.py:225-252) — the two
  are elementwise identical and the left-pad form avoids a wasted tail.
- Convolutions are channels-last `lax.conv_general_dilated`; k=1 pointwise
  convs are plain matmuls (MXU), mirroring the reference's Conv1d(k=1) ->
  Linear equivalence (audio.py:90).
- The >500-frame chunked attention (audio.py:648-672) reshapes with STATIC
  shapes at trace time (mel length is static per program).
- Note: the reference defines AbsolutePositionalEncoding but never applies
  it in ConformerEncoder.__call__ (audio.py:628-686); behavior matched.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ...core.layers import layer_norm, linear

CHUNK = 500  # max attention span before unfolding (reference audio.py:648)


@dataclasses.dataclass
class AudioConfig:
    """Reference config.py:27 (AudioConfig)."""

    attention_dim: int = 1024
    attention_heads: int = 16
    num_blocks: int = 24
    linear_units: int = 1536
    input_size: int = 80
    time_reduction: int = 8
    kernel_size: int = 3
    causal: bool = True
    ext_pw_out_channel: int = 1024
    depthwise_seperable_out_channel: int = 1024
    depthwise_multiplier: int = 1
    conv_channels: int = 1024
    t5_bias_max_distance: int = 500

    @classmethod
    def from_dict(cls, d: dict) -> "AudioConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in (d or {}).items() if k in fields})


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _conv2d(p, x, stride, groups=1):
    """x [B,H,W,C] -> NHWC conv with torch-sanitized HWIO kernel.

    Padding (k-1)//2 per side, matching torch Conv2d(padding=(k-1)//2)
    (reference NemoConvSubsampling:452) — 1 for the k=3 convs, 0 for k=1."""
    kh, kw = p["weight"].shape[:2]
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=(((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y + p["bias"].astype(y.dtype) if "bias" in p else y


def _dw_conv1d_causal(p, x, k):
    """Depthwise causal Conv1d: x [B,T,C], left-pad k-1."""
    C = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype),
        window_strides=(1,), padding=((k - 1, 0),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=C,
    )
    return y + p["bias"].astype(y.dtype) if "bias" in p else y


def _subsample(params, cfg: AudioConfig, x):
    """NeMo dw_striding subsampling (reference NemoConvSubsampling:434).

    x [B, T, 80] -> [B, ceil-ish T/8, attention_dim]."""
    h = x[..., None]  # [B, T, F, 1]
    h = jax.nn.relu(_conv2d(params["conv_0"], h, stride=2))
    n_pairs = int(math.log2(cfg.time_reduction)) - 1
    for i in range(n_pairs):
        lp = params["dw_pw_layers"][str(i)]
        h = _conv2d(lp["dw"], h, stride=2, groups=h.shape[-1])
        h = jax.nn.relu(_conv2d(lp["pw"], h, stride=1))
    B, T, F, C = h.shape
    # match torch channel-major flatten: (B,T,C,F) -> (B,T,C*F)
    h = h.transpose(0, 1, 3, 2).reshape(B, T, C * F)
    return linear(params["out"], h)


def _t5_bias(params, n_heads: int, max_distance: int, T: int):
    """Asymmetric unbucketed T5 relative bias [1, H, T, T]
    (reference T5RelativeAttentionLogitBias:322)."""
    rel = jnp.arange(T)[None, :] - jnp.arange(T)[:, None]
    rel = jnp.clip(rel, -max_distance, max_distance - 1) + max_distance
    table = params["bias_values"]["weight"]  # [2*max_distance, H]
    bias = jnp.take(table, rel, axis=0)  # [T, T, H]
    return bias.transpose(2, 0, 1)[None].astype(jnp.float32)


def _feed_forward(p, x):
    """LN -> GLULinear -> Linear (reference FeedForward:113, GLU act=swish)."""
    x = layer_norm(p["layer_norm"], x, 1e-5)
    y = linear(p["net"]["0"]["linear"], x)
    half = y.shape[-1] // 2
    y = y[..., :half] * _swish(y[..., half:])
    return linear(p["net"]["2"], y)


def _attention(p, x, bias, n_heads):
    """Softmax attention with additive T5 bias (reference MHA:270)."""
    B, T, D = x.shape
    hd = D // n_heads
    q = linear(p["linear_q"], x).reshape(B, T, n_heads, hd)
    k = linear(p["linear_k"], x).reshape(B, T, n_heads, hd)
    v = linear(p["linear_v"], x).reshape(B, T, n_heads, hd)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * (hd ** -0.5) + bias
    attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, D)
    return linear(p["linear_out"], out)


def _conv_module(p, x, cfg: AudioConfig):
    """LN -> GLU pointwise -> causal depthwise -> swish -> pointwise
    (reference ConvModule:185)."""
    y = layer_norm(p["layer_norm"], x, 1e-5)
    g = linear(p["glu"]["ext_pw_conv_1d"], y)
    C = g.shape[-1] // 2
    y = (g[..., :C] + p["glu"]["b1"]) * _swish(g[..., C:] + p["glu"]["b2"])
    y = _dw_conv1d_causal(
        p["dw_sep_conv_1d"]["dw_conv"], y, cfg.kernel_size)
    y = linear(p["dw_sep_conv_1d"]["pw_conv"], y)
    y = _swish(y)
    return linear(p["ext_pw_conv_1d"], y)


def conformer_encode(params: dict, cfg: AudioConfig, mel: jax.Array):
    """mel [B, T, input_size] -> features [B, T', attention_dim].

    Reference ConformerEncoder.__call__:628 (masks omitted: inference runs
    full-attention per <=500-frame chunk, matching the reference's
    mask=None simplification at audio.py:678)."""
    x = (mel - params["encoder_embedding"]["global_mean"]) * params[
        "encoder_embedding"]["global_invstd"]
    x = _subsample(params["embed"], cfg, x)
    B, T, D = x.shape
    n_chunks = 1
    if T > CHUNK:
        n_chunks = -(-T // CHUNK)
        pad = n_chunks * CHUNK - T
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        x = x.reshape(B * n_chunks, CHUNK, D)
    bias = _t5_bias(
        params["relative_attention_bias_layer"], cfg.attention_heads,
        cfg.t5_bias_max_distance, x.shape[1])

    def block(h, lp):
        h = h + 0.5 * _feed_forward(lp["feed_forward_in"], h)
        h = h + _attention(
            lp["self_attn"], layer_norm(lp["layer_norm_att"], h, 1e-5), bias,
            cfg.attention_heads)
        h = h + _conv_module(lp["conv"], h, cfg)
        h = h + 0.5 * _feed_forward(lp["feed_forward_out"], h)
        return layer_norm(lp["layer_norm"], h, 1e-5), None

    x, _ = jax.lax.scan(block, x, params["encoders"])
    if n_chunks > 1:
        x = x.reshape(B, n_chunks * CHUNK, D)[:, :T]
    return x


def audio_project(params: dict, x: jax.Array, mode: str = "speech"):
    """Linear -> GELU -> Linear projection branch (reference
    AudioProjection:781; 'speech' for audio-only prompts)."""
    p = params[mode]
    y = jax.nn.gelu(linear(p["0"], x), approximate=False)
    return linear(p["2"], y)


def sanitize_audio(weights: dict) -> dict:
    """Relayout torch conv weights for the channels-last kernels.

    Reference ConformerEncoder.sanitize:693 does the MLX analogue; here:
    Conv2d (O,I,kH,kW) -> HWIO; depthwise Conv1d (C,1,k) -> WIO (k,1,C);
    k=1 convs -> Linear [O,I]; glu b1/b2 (1,C,1) -> [C].  Sequential
    embed.conv.{0,2,3,5,6} indices map to conv_0 / dw_pw_layers.{0,1}.{dw,pw}
    (ReLU slots 1,4,7 are stateless)."""
    out = {}
    seq_map = {"0": "conv_0", "2": "dw_pw_layers.0.dw", "3": "dw_pw_layers.0.pw",
               "5": "dw_pw_layers.1.dw", "6": "dw_pw_layers.1.pw"}
    for k, v in weights.items():
        if k.startswith("embed.conv.") or ".embed.conv." in k:
            head, rest = k.rsplit("embed.conv.", 1)
            idx, param = rest.split(".", 1)
            if idx not in seq_map:
                continue  # ReLU slots
            k = f"{head}embed.{seq_map[idx]}.{param}"
        if (".glu.b1" in k or ".glu.b2" in k) and v.ndim == 3:
            out[k] = v.reshape(-1)
            continue
        if k.endswith("weight") and v.ndim == 4:  # Conv2d
            out[k] = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            continue
        if k.endswith("weight") and v.ndim == 3:  # Conv1d
            if v.shape[-1] == 1:  # k=1 pointwise -> Linear [O, I]
                out[k] = v[:, :, 0]
            else:  # depthwise (C, 1, k) -> WIO (k, 1, C)
                out[k] = v.transpose(2, 1, 0)
            continue
        out[k] = v
    return out
