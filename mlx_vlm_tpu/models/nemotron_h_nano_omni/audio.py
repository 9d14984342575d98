"""Parakeet conformer sound encoder for Nemotron-Nano Omni.

Role parity: reference mlx_vlm/models/nemotron_h_nano_omni/audio.py —
SoundProjection:16, ParakeetEncoderRelPositionalEncoding:39,
ParakeetEncoderFeedForward:69, ParakeetEncoderConvolutionModule:88,
ParakeetEncoderAttention:136 (Transformer-XL rel-shift, bias_u/bias_v),
ParakeetEncoderSubsamplingConv2D:240, ParakeetEncoderBlock:318 (macaron
halves), ParakeetEncoder:355, SoundFeatureExtractor:428,
sanitize_audio_weights:546.

TPU design: the conformer stack is one lax.scan over stacked blocks; the
rel-pos table [2S-1, D] is computed once per trace and shared by every
layer.  Mel extraction is host-side numpy (np.fft rfft over strided
frames + slaney filterbank) — the clip boundary logic is ragged and the
encoder consumes a statically padded [A, T, n_mels] batch with a mask.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import layer_norm, linear, rms_norm


@dataclasses.dataclass
class AudioConfig:
    model_type: str = "parakeet"
    hidden_size: int = 1024
    num_attention_heads: int = 8
    num_hidden_layers: int = 24
    intermediate_size: int = 4096
    attention_bias: bool = False
    convolution_bias: bool = False
    conv_kernel_size: int = 9
    subsampling_factor: int = 8
    subsampling_conv_channels: int = 256
    num_mel_bins: int = 128
    subsampling_conv_kernel_size: int = 3
    subsampling_conv_stride: int = 2
    max_position_embeddings: int = 5000
    scale_input: bool = False
    projection_hidden_size: int = 4096
    projection_bias: bool = False
    sampling_rate: int = 16000
    hop_length: int = 160
    n_fft: int = 512
    win_length: int = 400
    preemphasis: float = 0.97

    @classmethod
    def from_dict(cls, d: dict) -> "AudioConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in (d or {}).items() if k in fields})

    @property
    def num_subsampling_layers(self) -> int:
        return int(math.log2(self.subsampling_factor))


def subsampling_output_length(cfg: AudioConfig, length: int) -> int:
    """Frame count after the conv stack (reference
    _get_subsampling_output_length:372)."""
    add_pad = ((cfg.subsampling_conv_kernel_size - 1) // 2) * 2 \
        - cfg.subsampling_conv_kernel_size
    for _ in range(cfg.num_subsampling_layers):
        length = (length + add_pad) // cfg.subsampling_conv_stride + 1
    return length


# --------------------------------------------------------------- subsample
def _conv2d(p, x, stride: int, groups: int = 1):
    """NHWC conv with HWIO weights; torch-style symmetric (k-1)//2 pad
    (NOT XLA SAME — placement differs for even outputs)."""
    w = p["weight"].astype(x.dtype)
    pad = (w.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _subsample(params: dict, cfg: AudioConfig, mel: jax.Array,
               lengths: Optional[jax.Array]):
    """[A, T, n_mels] -> [A, T', hidden] (+ output lengths).

    Reference ParakeetEncoderSubsamplingConv2D:240 — Conv2d(1->C) + relu,
    then (depthwise + pointwise + relu) x (log2(factor)-1), masking the
    time rows past each clip's conv-output length after every strided
    conv."""
    C = cfg.subsampling_conv_channels
    s = cfg.subsampling_conv_stride
    x = mel[..., None]  # NHWC: [A, T, n_mels, 1]

    def step_len(ln):
        # stride-s conv, k=3, pad=(k-1)//2: floor((L + 2p - k)/s) + 1
        k = cfg.subsampling_conv_kernel_size
        p = (k - 1) // 2
        return (ln + 2 * p - k) // s + 1

    def mask_rows(x, ln):
        if ln is None:
            return x
        t = jnp.arange(x.shape[1])
        keep = t[None, :] < ln[:, None]
        return x * keep[:, :, None, None].astype(x.dtype)

    x = jax.nn.relu(_conv2d(params["layers"]["0"], x, s))
    if lengths is not None:
        lengths = step_len(lengths)
    x = mask_rows(x, lengths)
    idx = 2
    for _ in range(cfg.num_subsampling_layers - 1):
        x = _conv2d(params["layers"][str(idx)], x, s, groups=C)
        if lengths is not None:
            lengths = step_len(lengths)
        x = mask_rows(x, lengths)
        x = jax.nn.relu(_conv2d(params["layers"][str(idx + 1)], x, 1))
        x = mask_rows(x, lengths)
        idx += 3
    A, T, F, _ = x.shape
    x = x.transpose(0, 1, 3, 2).reshape(A, T, -1)
    return linear(params["linear"], x), lengths


# --------------------------------------------------------------- attention
def _rel_pos_table(S: int, D: int, dtype) -> jax.Array:
    """[2S-1, D] sinusoid table at positions S-1 .. -(S-1) (reference
    ParakeetEncoderRelPositionalEncoding:39)."""
    positions = jnp.arange(S - 1, -S, -1, dtype=jnp.float32)
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D))
    freqs = positions[:, None] * inv_freq[None, :]
    table = jnp.stack([jnp.sin(freqs), jnp.cos(freqs)], axis=-1)
    return table.reshape(2 * S - 1, D).astype(dtype)


def _rel_shift(scores: jax.Array) -> jax.Array:
    """Transformer-XL relative shift (reference _rel_shift:171)."""
    B, H, Q, P = scores.shape
    scores = jnp.pad(scores, ((0, 0), (0, 0), (0, 0), (1, 0)))
    scores = scores.reshape(B, H, P + 1, Q)[:, :, 1:, :]
    return scores.reshape(B, H, Q, P)


def _attention(p: dict, x: jax.Array, pos: jax.Array, n_heads: int,
               pad_mask: Optional[jax.Array]):
    B, S, D = x.shape
    hd = D // n_heads
    scale = hd ** -0.5

    def split(y):
        return y.reshape(B, S, n_heads, hd).transpose(0, 2, 1, 3)

    q = split(linear(p["q_proj"], x))
    k = split(linear(p["k_proj"], x))
    v = split(linear(p["v_proj"], x))
    rel_k = linear(p["relative_k_proj"], pos)  # [2S-1, D]
    rel_k = rel_k.reshape(-1, n_heads, hd).transpose(1, 0, 2)  # [H, 2S-1, hd]

    q_u = q + p["bias_u"].astype(q.dtype)[None, :, None, :]
    q_v = q + p["bias_v"].astype(q.dtype)[None, :, None, :]

    bd = jnp.einsum("bhqd,hpd->bhqp", q_v, rel_k,
                    preferred_element_type=jnp.float32)
    bd = _rel_shift(bd)[..., :S] * scale
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                    preferred_element_type=jnp.float32) * scale
    scores = ac + bd
    if pad_mask is not None:
        ok = pad_mask[:, None, None, :] & pad_mask[:, None, :, None]
        scores = jnp.where(ok, scores, jnp.finfo(scores.dtype).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    if pad_mask is not None:
        out = out * pad_mask[:, None, :, None].astype(out.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
    return linear(p["o_proj"], out)


# ------------------------------------------------------------ conv module
def _conv_module(p: dict, x: jax.Array, cfg: AudioConfig,
                 pad_mask: Optional[jax.Array]):
    """Pointwise glu -> depthwise -> batchnorm -> silu -> pointwise
    (reference ParakeetEncoderConvolutionModule:88)."""
    # pointwise_conv1: k=1 conv == linear; torch (2C, C, 1) folded to (2C, C)
    y = linear(p["pointwise_conv1"], x)
    a, b = jnp.split(y, 2, axis=-1)
    y = a * jax.nn.sigmoid(b)
    if pad_mask is not None:
        y = y * pad_mask[..., None].astype(y.dtype)
    # depthwise conv over time, SAME padding; weight [K, C]
    w = p["depthwise_conv"]["weight"].astype(y.dtype)
    k = w.shape[0]
    y = jax.lax.conv_general_dilated(
        y[:, :, None, :], w[:, None, None, :], (1, 1),
        ((k // 2, (k - 1) // 2), (0, 0)),
        feature_group_count=y.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[:, :, 0, :]
    if "bias" in p["depthwise_conv"]:
        y = y + p["depthwise_conv"]["bias"].astype(y.dtype)
    # BatchNorm in inference mode: (x - mean) / sqrt(var + eps) * w + b
    bn = p["norm"]
    yf = y.astype(jnp.float32)
    yf = (yf - bn["running_mean"]) * jax.lax.rsqrt(bn["running_var"] + 1e-5)
    y = (yf * bn["weight"] + bn["bias"]).astype(y.dtype)
    y = jax.nn.silu(y)
    return linear(p["pointwise_conv2"], y)


def _feed_forward(p: dict, x: jax.Array) -> jax.Array:
    return linear(p["linear2"], jax.nn.silu(linear(p["linear1"], x)))


# ----------------------------------------------------------------- encoder
def parakeet_encode(params: dict, cfg: AudioConfig, mel: jax.Array,
                    lengths: Optional[jax.Array] = None) -> jax.Array:
    """[A, T, n_mels] padded log-mel -> [A, T', hidden] conformer features.

    Reference ParakeetEncoder.__call__:395."""
    x, out_lengths = _subsample(params["subsampling"], cfg, mel, lengths)
    if cfg.scale_input:
        x = x * math.sqrt(cfg.hidden_size)
    S = x.shape[1]
    pos = _rel_pos_table(S, cfg.hidden_size, x.dtype)
    pad_mask = None
    if out_lengths is not None:
        pad_mask = jnp.arange(S)[None, :] < out_lengths[:, None]
    n_heads = cfg.num_attention_heads

    def block(h, lp):
        h = h + 0.5 * _feed_forward(
            lp["feed_forward1"], layer_norm(lp["norm_feed_forward1"], h, 1e-5))
        h = h + _attention(lp["self_attn"],
                           layer_norm(lp["norm_self_att"], h, 1e-5),
                           pos, n_heads, pad_mask)
        c = _conv_module(lp["conv"], layer_norm(lp["norm_conv"], h, 1e-5), cfg,
                         pad_mask)
        h = h + c
        h = h + 0.5 * _feed_forward(
            lp["feed_forward2"], layer_norm(lp["norm_feed_forward2"], h, 1e-5))
        return layer_norm(lp["norm_out"], h, 1e-5), None

    x, _ = jax.lax.scan(block, x, params["layers"])
    return x


def sound_project(params: dict, x: jax.Array) -> jax.Array:
    """RMSNorm -> linear -> relu^2 -> linear (reference SoundProjection:16)."""
    x = rms_norm(params["norm"], x, 1e-5)
    x = jnp.square(jax.nn.relu(linear(params["linear1"], x)))
    return linear(params["linear2"], x)


# --------------------------------------------------------- host-side mel
def _slaney_mel_filters(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """Slaney-norm slaney-scale triangular filterbank [n_mels, n_fft//2+1]
    (reference mlx_audio mel_filters with norm='slaney', mel_scale='slaney')."""
    f_min, f_max = 0.0, sr / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = 3.0 * f / 200.0
        log_region = f >= 1000.0
        mel = np.where(
            log_region,
            15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / np.log(6.4) * 27.0,
            mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = 200.0 * m / 3.0
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp(np.log(6.4) / 27.0
                                                 * (m - 15.0)), f)
        return f

    mels = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    freqs = mel_to_hz(mels)
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    fdiff = np.diff(freqs)
    ramps = freqs[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (freqs[2:n_mels + 2] - freqs[:n_mels])
    return (fb * enorm[:, None]).astype(np.float32)


class SoundFeatureExtractor:
    """Waveform -> per-clip normalized log-mel batches (reference
    SoundFeatureExtractor:428; pure numpy, host-side)."""

    def __init__(self, cfg: AudioConfig):
        self.cfg = cfg
        self._filters = _slaney_mel_filters(cfg.sampling_rate, cfg.n_fft,
                                            cfg.num_mel_bins)

    def _log_mel(self, waveform: np.ndarray) -> np.ndarray:
        cfg = self.cfg
        wav = np.asarray(waveform, np.float32).reshape(-1)
        if cfg.preemphasis is not None:
            wav = np.concatenate([wav[:1], wav[1:] - cfg.preemphasis
                                  * wav[:-1]])
        # symmetric hann, zero-centred into the n_fft window
        win = np.hanning(cfg.win_length).astype(np.float32)
        if win.shape[0] < cfg.n_fft:
            left = (cfg.n_fft - win.shape[0]) // 2
            right = cfg.n_fft - win.shape[0] - left
            win = np.concatenate([np.zeros(left, np.float32), win,
                                  np.zeros(right, np.float32)])
        pad = cfg.n_fft // 2
        wav = np.pad(wav, (pad, pad))
        n_frames = 1 + (wav.shape[0] - cfg.n_fft) // cfg.hop_length
        idx = (np.arange(cfg.n_fft)[None, :]
               + cfg.hop_length * np.arange(n_frames)[:, None])
        frames = wav[idx] * win[None, :]
        spec = np.abs(np.fft.rfft(frames, n=cfg.n_fft, axis=-1)) ** 2
        mel = spec @ self._filters.T  # [T, n_mels]
        return np.log(mel + 2.0 ** -24).astype(np.float32)

    def __call__(self, clips: Sequence[np.ndarray]) -> Tuple[
            np.ndarray, np.ndarray, np.ndarray]:
        """Returns (features [A, T, n_mels], mask [A, T], lengths [A])."""
        if not isinstance(clips, (list, tuple)):
            clips = [clips]
        feats, valid = [], []
        for clip in clips:
            wav = np.asarray(clip, np.float32)
            if wav.ndim > 1:
                wav = wav.mean(axis=-1)
            mel = self._log_mel(wav)
            vl = min(wav.shape[0] // self.cfg.hop_length, mel.shape[0])
            mask = (np.arange(mel.shape[0]) < vl)[:, None]
            denom = max(vl, 1)
            mean = (mel * mask).sum(0) / denom
            var = (((mel - mean) ** 2) * mask).sum(0) / max(vl - 1, 1)
            mel = ((mel - mean) / (np.sqrt(var) + 1e-5)) * mask
            feats.append(mel)
            valid.append(vl)
        T = max(f.shape[0] for f in feats)
        padded = np.stack([np.pad(f, ((0, T - f.shape[0]), (0, 0)))
                           for f in feats])
        mask = np.stack([np.arange(T) < v for v in valid]).astype(np.int32)
        lengths = np.asarray([f.shape[0] for f in feats], np.int32)
        return padded, mask, lengths


def sanitize_sound(weights: dict) -> dict:
    """sound_encoder.* torch conv layouts -> JAX layouts (reference
    sanitize_audio_weights:546).

    - subsampling Conv2d OIHW -> HWIO
    - pointwise Conv1d (O, I, 1) -> linear (O, I)
    - depthwise Conv1d (C, 1, K) -> [K, C]
    """
    out = {}
    for k, v in weights.items():
        if k.endswith(".num_batches_tracked"):
            continue
        if ".subsampling." in k and k.endswith(".weight") and v.ndim == 4:
            v = v.transpose(2, 3, 1, 0)
        elif ".pointwise_conv" in k and k.endswith(".weight") and v.ndim == 3:
            v = v[..., 0]
        elif ".depthwise_conv." in k and k.endswith(".weight") and v.ndim == 3:
            v = v[:, 0, :].T  # (C, 1, K) -> [K, C]
        out[k] = v
    return out


__all__ = [
    "AudioConfig", "SoundFeatureExtractor", "parakeet_encode",
    "sound_project", "sanitize_sound", "subsampling_output_length",
]
