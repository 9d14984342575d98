"""Qwen3-Omni audio encoder (whisper-style, windowed attention).

Role parity: reference mlx_vlm/models/qwen3_omni_moe/audio.py — 3x strided
Conv2d downsampling:163-183, per-chunk sinusoid positions:123, windowed
attention over cu_seqlens:33-80, ln_post + proj1/proj2 head:300-312.

TPU design: the mel stream is chunked HOST-side into equal [N_c, mel, 100]
blocks (variable-length Python chunking in the reference), the conv stack
runs batched over chunks, and the per-audio window structure becomes a
segment-ID mask over the gathered valid frames — one SDPA for all windows.
Note: the reference builds its post-conv validity mask from per-AUDIO
lengths (audio.py:245-252), which mis-indexes when an audio spans more than
one 100-frame chunk; this implementation uses per-CHUNK lengths (matching
the HF original).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import layer_norm, linear
from ...ops.attention import sdpa
from .config import AudioConfig

STACK_PREFIX = "layers"


def _out_len(n: int) -> int:
    """Post-conv frame count for an n-frame chunk: three stride-2 convs with
    k=3, p=1 each apply ceil-div-2, and ceil(ceil(ceil(n/2)/2)/2)==ceil(n/8)
    (reference audio.py:11 _get_feat_extract_output_lengths)."""
    return (n + 7) // 8


def audio_chunk_plan(
    feature_lens: List[int], cfg: AudioConfig
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Host-side plan: (gather_idx [N_valid], segment_ids [N_valid],
    total_chunks).

    Chunks are cfg.n_window*2 mel frames; each padded chunk yields
    w=ceil(step/8) post-conv frames of which the first out_len(chunk_len)
    are valid.  Attention windows group n_window_infer/step chunks worth of
    valid frames and never cross an audio boundary."""
    step = cfg.n_window * 2
    w = _out_len(step)
    win = w * (cfg.n_window_infer // step)
    gather, segs = [], []
    seg = -1
    chunk_base = 0
    for L in feature_lens:
        n_c = math.ceil(L / step)
        cnt = 0
        for c in range(n_c):
            clen = step if c < n_c - 1 else L - step * (n_c - 1)
            for j in range(_out_len(clen)):
                if cnt % win == 0:
                    seg += 1
                gather.append((chunk_base + c) * w + j)
                segs.append(seg)
                cnt += 1
        chunk_base += n_c
    return (
        np.asarray(gather, np.int32),
        np.asarray(segs, np.int32),
        chunk_base,
    )


def chunk_mel_features(
    input_features: np.ndarray,  # [mel, T] or [B, mel, T]
    feature_lens: List[int],
    cfg: AudioConfig,
) -> np.ndarray:
    """Host-side: split concatenated/batched mel features into padded
    [N_chunks, mel, step] blocks."""
    step = cfg.n_window * 2
    x = np.asarray(input_features)
    if x.ndim == 3:
        x = np.concatenate(
            [x[i, :, : feature_lens[i]] for i in range(x.shape[0])], axis=-1
        )
    chunks = []
    start = 0
    for L in feature_lens:
        seg = x[:, start:start + L]
        n_c = math.ceil(L / step)
        pad = n_c * step - L
        seg = np.pad(seg, ((0, 0), (0, pad)))
        chunks.append(seg.reshape(x.shape[0], n_c, step).transpose(1, 0, 2))
        start += L
    return np.concatenate(chunks, axis=0)


def sinusoid_positions(length: int, channels: int,
                       max_timescale: float = 10000.0) -> np.ndarray:
    inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-inc * np.arange(channels // 2, dtype=np.float32))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


class AudioModel:
    def __init__(self, config: AudioConfig):
        self.config = config
        self.num_heads = config.encoder_attention_heads
        self.head_dim = config.d_model // config.encoder_attention_heads
        self.scale = self.head_dim**-0.5
        step = config.n_window * 2
        self.chunk_w = _out_len(step)
        self.pos = jnp.asarray(
            sinusoid_positions(self.chunk_w, config.d_model)
        )

    def _conv(self, p, x, stride=2):
        # x [N, C, H, W]; weight [O, I, 3, 3]
        return jax.lax.conv_general_dilated(
            x, p["weight"].astype(x.dtype), (stride, stride),
            [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + p["bias"].reshape(1, -1, 1, 1).astype(x.dtype)

    def __call__(
        self,
        params: dict,
        audio_chunks: jax.Array,  # [N_c, mel, step]
        gather_idx: jax.Array,  # [N_valid]
        segment_ids: jax.Array,  # [N_valid]
    ) -> jax.Array:
        """Returns audio features [N_valid, output_dim]."""
        cfg = self.config
        x = audio_chunks[:, None]  # [N_c, 1, mel, step]
        x = jax.nn.gelu(self._conv(params["conv2d1"], x), approximate=False)
        x = jax.nn.gelu(self._conv(params["conv2d2"], x), approximate=False)
        x = jax.nn.gelu(self._conv(params["conv2d3"], x), approximate=False)
        b, c, h, w = x.shape
        x = x.transpose(0, 3, 1, 2).reshape(b, w, c * h)
        x = linear(params["conv_out"], x)  # [N_c, w, d]
        x = x + self.pos[None, :w].astype(x.dtype)
        flat = x.reshape(-1, x.shape[-1])
        hs = jnp.take(flat, gather_idx, axis=0)  # [N_valid, d]

        mask = (segment_ids[None, :] == segment_ids[:, None])[None, None]

        def layer(h, lp):
            y = layer_norm(lp["self_attn_layer_norm"], h, 1e-5)
            y = self._attention(lp["self_attn"], y, mask)
            h = h + y
            y = layer_norm(lp["final_layer_norm"], h, 1e-5)
            y = linear(lp["fc2"], jax.nn.gelu(linear(lp["fc1"], y),
                                              approximate=False))
            return h + y, None

        hs, _ = jax.lax.scan(layer, hs, params[STACK_PREFIX])
        hs = layer_norm(params["ln_post"], hs, 1e-5)
        hs = jax.nn.gelu(linear(params["proj1"], hs), approximate=False)
        return linear(params["proj2"], hs)

    def _attention(self, p, x, mask):
        N = x.shape[0]
        q = linear(p["q_proj"], x).reshape(N, self.num_heads, self.head_dim)
        k = linear(p["k_proj"], x).reshape(N, self.num_heads, self.head_dim)
        v = linear(p["v_proj"], x).reshape(N, self.num_heads, self.head_dim)
        out = sdpa(
            q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
            v.transpose(1, 0, 2)[None], self.scale, mask,
        )
        return linear(p["out_proj"], out[0].transpose(1, 0, 2).reshape(N, -1))

    @staticmethod
    def sanitize(weights: dict) -> dict:
        """Conv weights stay [O, I, 3, 3]; mlx-converted [O, 3, 3, I] are
        transposed back."""
        out = {}
        for k, v in weights.items():
            if "conv2d" in k and k.endswith("weight") and v.ndim == 4:
                if v.shape[1] == 3 and v.shape[2] == 3 and v.shape[3] != 3:
                    v = v.transpose(0, 3, 1, 2)
            out[k] = v
        return out
