"""Ideogram 4 text-to-image pipeline (ideogram-ai/ideogram-4-fp8).

Role parity: reference mlx_vlm/models/ideogram4/* — transformer.py
Ideogram4Transformer (single-stream DiT over [text; image] with 3-axis
M-RoPE, segment-mask attention, tanh-gated adaLN and indicator embeddings),
scheduler.py (logit-normal sigma schedule, resolution-shifted mean, sampler
presets with per-step guidance schedules), latent_norm.py (channel-wise
latent shift/scale statistics), prompting.py (JSON-caption normalization),
pipeline.py Ideogram4ImagePipeline.generate_array (conditional +
UNconditional transformers, velocity CFG, Flux2-VAE decode), weights.py
(fp8 weight-only dequant, Qwen3-VL text encoder with 13 activation-layer
feature concat).

TPU design:
- The 34 transformer blocks are weight-stacked and run under ONE
  `lax.scan`; position/segment/indicator tensors and M-RoPE tables are
  host-built once per (prompt_len, resolution).
- One jitted program per shape covers BOTH transformer forwards (the
  conditional pass over [text; image] and the unconditional pass over the
  image tokens alone — they have different sequence lengths, so they are
  two calls inside one program, not a batch), the guidance mix, and the
  Euler update.
- Text conditioning reuses imagegen.text_encoder.encode_text, whose
  lax.scan already yields every layer's hidden state — the reference's
  13-activation-layer concat is a layer-index tuple, not a new encoder.
- fp8 import: weight-only E4M3 with per-row scales is decoded at load via
  the same LUT machinery as core/quant.py; compute stays bf16 on the MXU.
"""

from __future__ import annotations

import base64
import dataclasses
import functools
import json
import math
from pathlib import Path
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import embedding, linear, rms_norm

__all__ = [
    "Ideogram4Config", "Ideogram4Pipeline", "SamplerPreset", "PRESETS",
    "logit_normal_schedule", "schedule_for_resolution", "get_preset",
    "ideogram_transformer_forward", "init_ideogram_params",
    "normalize_prompt", "latent_norm", "build_inputs",
    "LLM_TOKEN_INDICATOR", "OUTPUT_IMAGE_INDICATOR",
]

LLM_TOKEN_INDICATOR = 3
OUTPUT_IMAGE_INDICATOR = 2
IMAGE_POSITION_OFFSET = 65536
PATCH_SIZE = 2
AE_SCALE_FACTOR = 8
MAX_TEXT_TOKENS = 2048
# hidden states feeding the DiT: layer outputs 0,3,...,35 of Qwen3-VL-4B
# (reference pipeline.py QWEN3_VL_ACTIVATION_LAYERS; +1 maps to our
# encode_text indexing where 0 is the embedding output)
QWEN3_VL_ACTIVATION_LAYERS = (0, 3, 6, 9, 12, 15, 18, 21, 24, 27, 30, 33, 35)


@dataclasses.dataclass(frozen=True)
class Ideogram4Config:
    """reference config.py Ideogram4TransformerConfig."""

    emb_dim: int = 4608
    num_layers: int = 34
    num_heads: int = 18
    intermediate_size: int = 12288
    adanln_dim: int = 512
    in_channels: int = 128
    llm_features_dim: int = 4096 * 13
    rope_theta: float = 5_000_000.0
    mrope_section: Tuple[int, int, int] = (24, 20, 20)
    norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.emb_dim // self.num_heads

    @classmethod
    def from_dict(cls, d: dict) -> "Ideogram4Config":
        heads = d.get("num_heads", d.get("num_attention_heads",
                                         cls.num_heads))
        emb = d.get("emb_dim")
        if emb is None and "attention_head_dim" in d:
            emb = int(heads) * int(d["attention_head_dim"])
        out = {
            "emb_dim": int(emb or cls.emb_dim),
            "num_heads": int(heads),
        }
        for k in ("num_layers", "intermediate_size", "in_channels",
                  "llm_features_dim"):
            if k in d:
                out[k] = int(d[k])
        if "adaln_dim" in d:
            out["adanln_dim"] = int(d["adaln_dim"])
        if "adanln_dim" in d:
            out["adanln_dim"] = int(d["adanln_dim"])
        if "rope_theta" in d:
            out["rope_theta"] = float(d["rope_theta"])
        if "mrope_section" in d:
            out["mrope_section"] = tuple(d["mrope_section"])
        if "norm_eps" in d:
            out["norm_eps"] = float(d["norm_eps"])
        return cls(**out)


# ------------------------------------------------------------- scheduler
def logit_normal_schedule(t: float, mean: float, std: float = 1.0,
                          logsnr_min: float = -15.0,
                          logsnr_max: float = 18.0) -> float:
    """reference scheduler.py LogitNormalSchedule — host math, evaluated at
    the num_steps+1 interval points only."""
    t_min = 1.0 / (1.0 + math.exp(0.5 * logsnr_max))
    t_max = 1.0 / (1.0 + math.exp(0.5 * logsnr_min))
    if t <= 0.0:
        return t_max
    if t >= 1.0:
        return t_min
    from statistics import NormalDist

    z = NormalDist().inv_cdf(t)
    value = 1.0 - 1.0 / (1.0 + math.exp(-(mean + std * z)))
    return min(max(value, t_min), t_max)


def schedule_for_resolution(height: int, width: int, *, mean: float = 1.0,
                            std: float = 1.0,
                            known: Tuple[int, int] = (512, 512)):
    """Pixel-count-shifted mean (reference get_schedule_for_resolution)."""
    shifted = mean + 0.5 * math.log((height * width) / (known[0] * known[1]))
    return functools.partial(logit_normal_schedule, mean=shifted, std=std)


@dataclasses.dataclass(frozen=True)
class SamplerPreset:
    num_steps: int
    guidance_schedule: Tuple[float, ...]
    mu: float
    std: float = 1.0


PRESETS: Dict[str, SamplerPreset] = {
    "V4_QUALITY_48": SamplerPreset(48, (3.0,) * 3 + (7.0,) * 45, 0.0, 1.5),
    "V4_DEFAULT_20": SamplerPreset(20, (3.0,) * 2 + (7.0,) * 18, 0.0, 1.75),
    "V4_TURBO_12": SamplerPreset(12, (3.0,) * 1 + (7.0,) * 11, 0.5, 1.75),
}


def get_preset(name: Optional[str]) -> SamplerPreset:
    key = name or "V4_DEFAULT_20"
    if key not in PRESETS:
        raise ValueError(f"Unknown Ideogram 4 sampler preset {name!r}; "
                         f"expected one of {sorted(PRESETS)}")
    return PRESETS[key]


# ------------------------------------------------------------ latent norm
# channel statistics of the 128-dim packed latent space (reference
# latent_norm.py LATENT_SHIFT / LATENT_SCALE — checkpoint-derived
# constants, stored here as raw float32 bytes)
_SHIFT_B64 = (
    "IY+iPLLdzz2dApg+qzSLPnuaW75uoSO+CqpNPcN0Gr6tSR2+TiZOvqV6nTwRB3894q/PPQ"
    "MGir1HbMA+M1Jvvs0KtD5dP9S858TevNLg3b2vOhe+xks5vHFaa74b6XA+bhnfvW3k9D1A"
    "zCU9r32gPnliML6o7z6+eJ+xvjpHEr1pq9M8U7HQPXRrkT66/ok+AYpdvhyxN755ijI9lK"
    "0Zvg2RHr6vQ0K+4BLePM/DZT2GF9s9xmOMvSprwz4vhni+4M+2Piny+rxiWPG8cUjmvRDN"
    "Er4rLF+8XuJfvmPdbT4zbvC9OnnvPYf80Ty3i6A+CWMyvtafQr4tt7K+Pd0kvRSgnTytu5"
    "w9CGCZPniOhj5IZmG+jjQCvj3hRz2nIhC+/i4jvnt0Wb7VxqE8lz5iPawLzT1JqoO9c3HB"
    "Pg4TXL6vYa8+IysBvekE/rzPZNy939YWvlTEyrxRC2q+q8WAPo3q1b3i5P49xqWQPT8bnj"
    "4ofji+YjhBvr/PsL7DpFO8GjTTPMu1oz3hpZI+EFGFPgX8Zb4mwhe+dUcmPUXOD76D+iS+"
    "FeFOvlgp1TxtxEY9h6bVPUU6gb3ansQ+ZlhlvglAsj7KmRq984AKvc9P5r23rRC+HLzpvJ"
    "u9Xr6rsX4+p3fpvQNo+j26OmY9lEyePkD+OL7Qq0a+cJ2wvko6kLw="
)
_SCALE_B64 = (
    "y9XRP5rc2T8yQ94/xjTzP61x1T9yZdg/qMXIP1zDzz92DvI/11nKPzLazT9bCM4/ZQ3RP3"
    "LGxz8c+t0/2V3lP9b40T/ygdU/skzNP3Od4D9P4dA/KVnSP1sBzz+o/Mw/UTrRP+nFxj8L"
    "B9g/cZLXP5kT5T/bSdU/jQDUPyhz1D+eQ9E/GvrYP+9a3T+u4PQ/DM7VP/aG3D/Emcg/zk"
    "bPP+hx8T/G2Mg/QhrMP7vczT9f9s8/Zr/HP3tO3j8LSOM/4ZPRP0v01D/lK8w/cjLgP2+t"
    "0D8mldI/iOzOP7hxzD9QDdI/rTrFP0HS1z/Hv9Y/QB7lP5pG1T+XydM/aojUP3TU0j/RP9"
    "c/a7jeP7jD9j9NSdY/LETWP/l6yT98nc8/uybwP+F6xz+Lhck/ev3OP77C0D9vOcc/X5nd"
    "P9dA5z/+u9I/mmTUP0DYzT+z3+A/i8/SP7rL0D9Fkc4/pWnNP50l0T+KfMQ/R+LTP+jt1T"
    "9XzuY/Ip/WP+IY1D/rldc/haLTP7dz1j900t0//Wf4P2Hn1j+3ado/CFvJP8BEzz/sjO8/"
    "Uf7HP4aSyD/5084/CFXQP88Dxz9GD94/yjDlPzjN0j+xotQ/VPnMP2tT4D8e8dI/iqDQP4"
    "WRzj+d0M0/wNfRP93vwz/grNM/aoHVP+5v5j9ghNY/4wnUPwu51z8="
)


@functools.lru_cache(maxsize=1)
def latent_norm() -> Tuple[np.ndarray, np.ndarray]:
    """(shift, scale) [128] fp32 — reference latent_norm.get_latent_norm."""
    shift = np.frombuffer(base64.b64decode(_SHIFT_B64), np.float32)
    scale = np.frombuffer(base64.b64decode(_SCALE_B64), np.float32)
    return shift, scale


# -------------------------------------------------------------- prompting
def format_caption(caption: Dict[str, Any]) -> str:
    return json.dumps(caption, separators=(",", ":"), ensure_ascii=False)


def normalize_prompt(prompt: str, auto_json_caption: bool = True
                     ) -> Tuple[str, bool]:
    """Plain text is wrapped into the minimal Ideogram JSON caption;
    JSON objects pass through (reference prompting.normalize_prompt —
    prompt-expansion-LLM path omitted: it needs a live chat model and
    degrades to exactly this wrapper on failure).  Returns
    (text, was_wrapped)."""
    stripped = prompt.strip()
    if stripped.startswith("{"):
        try:
            value = json.loads(stripped)
        except json.JSONDecodeError as exc:
            raise ValueError("Invalid Ideogram 4 JSON caption") from exc
        if not isinstance(value, dict):
            raise ValueError("Ideogram 4 JSON caption must be an object")
        return prompt, False
    if not auto_json_caption:
        return prompt, False
    return format_caption({"caption": stripped}), True


# -------------------------------------------------------------- geometry
def build_inputs(num_text_tokens: int, height: int, width: int
                 ) -> Dict[str, np.ndarray]:
    """position/segment/indicator tensors for [text; image]
    (reference pipeline._build_inputs) — host numpy, once per shape."""
    patch = PATCH_SIZE * AE_SCALE_FACTOR
    if height % patch or width % patch:
        raise ValueError(f"height/width must be divisible by {patch}")
    gh, gw = height // patch, width // patch
    n_img = gh * gw
    tp = np.arange(num_text_tokens, dtype=np.int32)
    text_pos = np.stack([tp, tp, tp], axis=1)
    hh, ww = np.meshgrid(np.arange(gh, dtype=np.int32),
                         np.arange(gw, dtype=np.int32), indexing="ij")
    img_pos = np.stack([np.zeros_like(hh).reshape(-1), hh.reshape(-1),
                        ww.reshape(-1)], axis=1) + IMAGE_POSITION_OFFSET
    position_ids = np.concatenate([text_pos, img_pos], axis=0)[None]
    indicator = np.concatenate(
        [np.full((num_text_tokens,), LLM_TOKEN_INDICATOR, np.int32),
         np.full((n_img,), OUTPUT_IMAGE_INDICATOR, np.int32)])[None]
    segment_ids = np.ones((1, num_text_tokens + n_img), np.int32)
    return {"position_ids": position_ids, "segment_ids": segment_ids,
            "indicator": indicator, "grid_h": gh, "grid_w": gw,
            "num_image_tokens": n_img}


def _mrope_tables(cfg: Ideogram4Config, position_ids: np.ndarray
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """[B, S, head_dim] cos/sin with the reference's interleaved axis
    selector (Ideogram4MRoPE: index pattern 0,1,2,0,1,2,... over the first
    3*section slots, axis 0 elsewhere)."""
    hd = cfg.head_dim
    inv = 1.0 / cfg.rope_theta ** (np.arange(0, hd, 2, np.float32) / hd)
    sel = np.zeros((hd // 2,), np.int32)
    for axis, offset in ((1, 1), (2, 2)):
        for i in range(offset, cfg.mrope_section[axis] * 3, 3):
            sel[i] = axis
    pos = np.take_along_axis(
        position_ids.astype(np.float32),  # [B, S, 3]
        np.broadcast_to(sel[None, None], position_ids.shape[:2] + sel.shape),
        axis=2,
    )
    freqs = pos * inv[None, None]
    emb = np.concatenate([freqs, freqs], axis=-1)
    return np.cos(emb), np.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    d = x.shape[-1] // 2
    return jnp.concatenate([-x[..., d:], x[..., :d]], axis=-1)


# ------------------------------------------------------------ transformer
def _sinusoidal(t: jax.Array, dim: int, scale: float = 1e4) -> jax.Array:
    half = dim // 2
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                   * (-math.log(scale) / (half - 1)))
    emb = t.astype(jnp.float32)[..., None] * freq
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


def _ln(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def ideogram_transformer_forward(
    params: dict, cfg: Ideogram4Config,
    llm_features: Optional[jax.Array],  # [B, S, llm_dim] or None (uncond)
    x: jax.Array,                       # [B, S, in_ch] noised latents
    t: jax.Array,                       # [B] schedule value
    cos: jax.Array, sin: jax.Array,     # [B, S, head_dim]
    segment_ids: jax.Array,             # [B, S]
    indicator: jax.Array,               # [B, S]
) -> jax.Array:
    """reference transformer.Ideogram4Transformer.__call__ — returns fp32
    velocity [B, S, in_ch]."""
    nh, hd = cfg.num_heads, cfg.head_dim
    dtype = params["input_proj"]["weight"].dtype
    B, S = x.shape[:2]
    img_mask = (indicator == OUTPUT_IMAGE_INDICATOR)
    x = jnp.where(img_mask[..., None], x.astype(dtype), 0)
    x = linear(params["input_proj"], x)
    x = jnp.where(img_mask[..., None], x, 0)

    t_cond = _sinusoidal(
        1e4 * jnp.clip(t.astype(jnp.float32), 0.0, 1.0), cfg.emb_dim
    ).astype(dtype)
    te = params["t_embedding"]
    t_cond = linear(te["mlp_out"], _silu(linear(te["mlp_in"], t_cond)))
    if t_cond.ndim == 2:
        t_cond = t_cond[:, None]
    adaln = _silu(linear(params["adaln_proj"], t_cond))  # [B, 1, adanln]

    if llm_features is not None:
        txt_mask = (indicator == LLM_TOKEN_INDICATOR)[..., None]
        f = jnp.where(txt_mask, llm_features.astype(dtype), 0)
        f = rms_norm(params["llm_cond_norm"], f, 1e-6)
        f = jnp.where(txt_mask, linear(params["llm_cond_proj"], f), 0)
        h = x + f
    else:
        h = x
    h = h + embedding(params["embed_image_indicator"],
                      img_mask.astype(jnp.int32))

    same = (segment_ids[:, :, None] == segment_ids[:, None, :])[:, None]
    cosd = cos[:, None].astype(jnp.float32)  # [B, 1, S, hd]
    sind = sin[:, None].astype(jnp.float32)

    def block(h, lp):
        mod = linear(lp["adaln_modulation"], adaln)
        sc_a, g_a, sc_m, g_m = jnp.split(mod, 4, axis=-1)
        g_a, g_m = jnp.tanh(g_a), jnp.tanh(g_m)
        a = lp["attention"]
        xa = rms_norm(lp["attention_norm1"], h, cfg.norm_eps) * (1 + sc_a)
        qkv = linear(a["qkv"], xa).reshape(B, S, 3, nh, hd)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        q = rms_norm(a["norm_q"], q, 1e-5).astype(jnp.float32)
        k = rms_norm(a["norm_k"], k, 1e-5).astype(jnp.float32)
        q = q * cosd + _rotate_half(q) * sind
        k = k * cosd + _rotate_half(k) * sind
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5)
        s = jnp.where(same, s, -jnp.inf)
        o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1),
                       v.astype(jnp.float32)).astype(h.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, nh * hd)
        o = linear(a["o"], o)
        h = h + g_a * rms_norm(lp["attention_norm2"], o, cfg.norm_eps)
        xm = rms_norm(lp["ffn_norm1"], h, cfg.norm_eps) * (1 + sc_m)
        ff = lp["feed_forward"]
        m = linear(ff["w2"], _silu(linear(ff["w1"], xm)) * linear(ff["w3"], xm))
        h = h + g_m * rms_norm(lp["ffn_norm2"], m, cfg.norm_eps)
        return h, None

    h, _ = jax.lax.scan(block, h, params["layers"])
    fl = params["final_layer"]
    scale = 1.0 + linear(fl["adaln_modulation"], _silu(adaln))
    return linear(fl["linear"], _ln(h) * scale).astype(jnp.float32)


IDEOGRAM_STACK_PATTERNS = ("layers",)


# ----------------------------------------------------------------- load
def _dequantize_fp8(raw: dict) -> dict:
    """weight-only fp8: w[o,i] u8 E4M3 codes * scale[o] (reference
    weights.dequantize_fp8_weight_only)."""
    from ...core.quant import e4m3_decode_table

    lut = e4m3_decode_table()
    out = {}
    for k, v in raw.items():
        if k.endswith(".weight_scale"):
            continue
        v = np.asarray(v)
        sk = f"{k}_scale"
        if k.endswith(".weight") and sk in raw:
            scale = np.asarray(raw[sk], np.float32)
            out[k] = lut[v.view(np.uint8).astype(np.int32)] * scale[..., None]
        else:
            out[k] = v
    return out


def load_ideogram_transformer(model_path, subfolder: str,
                              dtype=jnp.bfloat16):
    from ...utils.loader import _nest, _read_safetensors, _stack_layers
    from ...imagegen.params import _to_device

    root = Path(model_path).expanduser() / subfolder
    flat = _stack_layers(_dequantize_fp8(dict(_read_safetensors(root))),
                         IDEOGRAM_STACK_PATTERNS)
    cfg: dict = {}
    cfgfile = root / "config.json"
    if cfgfile.exists():
        cfg = json.loads(cfgfile.read_text())
    params = _nest(_to_device(flat, dtype))
    cfg["num_layers"] = int(
        params["layers"]["adaln_modulation"]["weight"].shape[0])
    cfg.setdefault("emb_dim", int(params["input_proj"]["weight"].shape[0]))
    cfg.setdefault("in_channels", int(params["input_proj"]["weight"].shape[1]))
    cfg.setdefault("llm_features_dim",
                   int(params["llm_cond_proj"]["weight"].shape[1]))
    return params, Ideogram4Config.from_dict(cfg)


def init_ideogram_params(cfg: Ideogram4Config, key: jax.Array,
                         dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 64))

    def rn(*shape, scale=0.02):
        return jax.random.normal(next(ks), shape, dtype) * scale

    def lin(o, i, bias=True):
        p = {"weight": rn(o, i)}
        if bias:
            p["bias"] = jnp.zeros((o,), dtype)
        return p

    D, hd, ad = cfg.emb_dim, cfg.head_dim, cfg.adanln_dim
    mh = cfg.intermediate_size

    def block():
        return {
            "attention": {
                "qkv": lin(3 * D, D, bias=False),
                "norm_q": {"weight": jnp.ones((hd,), dtype)},
                "norm_k": {"weight": jnp.ones((hd,), dtype)},
                "o": lin(D, D, bias=False),
            },
            "feed_forward": {"w1": lin(mh, D, bias=False),
                             "w2": lin(D, mh, bias=False),
                             "w3": lin(mh, D, bias=False)},
            "attention_norm1": {"weight": jnp.ones((D,), dtype)},
            "attention_norm2": {"weight": jnp.ones((D,), dtype)},
            "ffn_norm1": {"weight": jnp.ones((D,), dtype)},
            "ffn_norm2": {"weight": jnp.ones((D,), dtype)},
            "adaln_modulation": lin(4 * D, ad),
        }

    layers = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                    *[block() for _ in range(cfg.num_layers)])
    return {
        "input_proj": lin(D, cfg.in_channels),
        "llm_cond_norm": {"weight": jnp.ones((cfg.llm_features_dim,), dtype)},
        "llm_cond_proj": lin(D, cfg.llm_features_dim),
        "t_embedding": {"mlp_in": lin(D, D), "mlp_out": lin(D, D)},
        "adaln_proj": lin(ad, D),
        "embed_image_indicator": {"weight": rn(2, D)},
        "layers": layers,
        "final_layer": {"linear": lin(cfg.in_channels, D),
                        "adaln_modulation": lin(D, ad)},
    }


# -------------------------------------------------------------- pipeline
def validate_dimensions(width: int, height: int) -> None:
    for name, value in (("width", width), ("height", height)):
        if value < 256 or value > 2048:
            raise ValueError(f"{name} must be in [256, 2048], got {value}")
        if value % 16:
            raise ValueError(f"{name} must be divisible by 16, got {value}")
    if max(width / height, height / width) > 6:
        raise ValueError(f"aspect ratio must be at most 6:1, "
                         f"got {width}x{height}")


class Ideogram4Pipeline:
    """reference pipeline.Ideogram4ImagePipeline.generate_array."""

    def __init__(self, cond_params, uncond_params, config: Ideogram4Config,
                 vae_params=None, vae_config=None,
                 text_params=None, text_config=None, tokenizer=None):
        self.cond_params = cond_params
        self.uncond_params = uncond_params
        self.config = config
        self.vae_params = vae_params
        self.vae_config = vae_config
        self.text_params = text_params
        self.text_config = text_config
        self.tokenizer = tokenizer
        cfg = config

        @functools.partial(jax.jit, static_argnames=("n_text",))
        def _step(cp, up, z, llm, t, dt, gw, cos, sin, seg, ind, n_text):
            # conditional pass sees [text_zero_pad; z]; unconditional pass
            # sees the image tokens alone (reference generate_array loop)
            tz = jnp.zeros(z.shape[:1] + (n_text, z.shape[-1]), z.dtype)
            pos_v = ideogram_transformer_forward(
                cp, cfg, llm, jnp.concatenate([tz, z], axis=1), t,
                cos, sin, seg, ind)[:, n_text:]
            neg_v = ideogram_transformer_forward(
                up, cfg, None, z, t, cos[:, n_text:], sin[:, n_text:],
                seg[:, n_text:], ind[:, n_text:])
            velocity = gw * pos_v + (1.0 - gw) * neg_v
            return z + velocity.astype(z.dtype) * dt

        self._step = _step

    @classmethod
    def from_pretrained(cls, model_path, dtype=jnp.bfloat16, **_):
        root = Path(model_path).expanduser()
        cond, cfg = load_ideogram_transformer(root, "transformer", dtype)
        uncond, _ = load_ideogram_transformer(
            root, "unconditional_transformer", dtype)
        vae_params = vae_cfg = text_params = text_cfg = tokenizer = None
        if (root / "vae").exists():
            from ...imagegen.params import load_vae_params

            vae_params, vae_cfg = load_vae_params(root, dtype=dtype)
        if (root / "text_encoder").exists():
            from ...imagegen.params import (get_variant,
                                            load_text_encoder_params)

            text_params, text_cfg = load_text_encoder_params(
                root, get_variant("flux2-klein-4b"), dtype)
            try:
                from transformers import AutoTokenizer

                tokenizer = AutoTokenizer.from_pretrained(
                    str(root / "tokenizer"), local_files_only=True)
            except Exception:
                tokenizer = None
        return cls(cond, uncond, cfg, vae_params, vae_cfg,
                   text_params, text_cfg, tokenizer)

    # ------------------------------------------------------------- text
    def encode_text(self, prompt: str) -> Tuple[jax.Array, int]:
        """13-activation-layer feature concat behind the chat template
        (reference pipeline._tokenize + _encode_text)."""
        if self.tokenizer is None or self.text_params is None:
            raise ValueError("no text encoder loaded; pass llm_features=")
        messages = [{"role": "user",
                     "content": [{"type": "text", "text": prompt}]}]
        text = self.tokenizer.apply_chat_template(
            messages, add_generation_prompt=True, tokenize=False)
        ids = self.tokenizer(text, add_special_tokens=False,
                             return_tensors="np")["input_ids"]
        if ids.shape[1] > MAX_TEXT_TOKENS:
            raise ValueError(f"prompt has {ids.shape[1]} tokens, exceeds "
                             f"max_text_tokens={MAX_TEXT_TOKENS}")
        from ...imagegen.text_encoder import encode_text as _enc

        ids = jnp.asarray(ids, jnp.int32)
        feats = _enc(self.text_params, self.text_config, ids,
                     jnp.ones_like(ids),
                     hidden_state_layers=tuple(
                         l + 1 for l in QWEN3_VL_ACTIVATION_LAYERS))
        return feats.astype(jnp.float32), int(ids.shape[1])

    # --------------------------------------------------------- generate
    def generate_array(self, prompt: Optional[str] = None, *, seed: int = 0,
                       steps: Optional[int] = None, width: int = 1024,
                       height: int = 1024, guidance_scale: float = 7.0,
                       sampler_preset: Optional[str] = None,
                       guidance_schedule: Optional[Sequence[float]] = None,
                       mu: Optional[float] = None, std: Optional[float] = None,
                       auto_json_caption: bool = True,
                       llm_features=None, num_text_tokens: Optional[int] = None
                       ) -> np.ndarray:
        validate_dimensions(width, height)
        preset = get_preset(sampler_preset)
        num_steps = int(steps or preset.num_steps)
        if num_steps < 1:
            raise ValueError(f"steps must be >= 1, got {num_steps}")
        if guidance_schedule is None and num_steps == preset.num_steps:
            guidance_schedule = preset.guidance_schedule
        if guidance_schedule is not None:
            guidance_schedule = tuple(float(g) for g in guidance_schedule)
            if len(guidance_schedule) != num_steps:
                raise ValueError(
                    f"guidance_schedule must have {num_steps} items")
        mu = preset.mu if mu is None else float(mu)
        std = preset.std if std is None else float(std)

        if llm_features is None:
            text, _ = normalize_prompt(prompt, auto_json_caption)
            llm_features, num_text_tokens = self.encode_text(text)
        llm_features = jnp.asarray(llm_features)
        if num_text_tokens is None:
            num_text_tokens = int(llm_features.shape[1])
        inputs = build_inputs(num_text_tokens, height, width)
        n_img = inputs["num_image_tokens"]
        # features padded with zeros over the image tail (reference
        # _encode_text image_padding concat)
        pad = jnp.zeros((llm_features.shape[0], n_img,
                         llm_features.shape[-1]), llm_features.dtype)
        llm = jnp.concatenate([llm_features, pad], axis=1)
        cos, sin = _mrope_tables(self.config, inputs["position_ids"])
        cos = jnp.asarray(cos)
        sin = jnp.asarray(sin)
        seg = jnp.asarray(inputs["segment_ids"])
        ind = jnp.asarray(inputs["indicator"])

        z = jax.random.normal(jax.random.PRNGKey(seed),
                              (1, n_img, self.config.in_channels),
                              jnp.float32)
        schedule = schedule_for_resolution(height, width, mean=mu, std=std)
        intervals = [i / num_steps for i in range(num_steps + 1)]
        for i in range(num_steps - 1, -1, -1):
            t_val = schedule(intervals[i + 1])
            s_val = schedule(intervals[i])
            gw_i = (guidance_schedule[i] if guidance_schedule is not None
                    else float(guidance_scale))
            z = self._step(
                self.cond_params, self.uncond_params, z, llm,
                jnp.full((1,), t_val, jnp.float32),
                jnp.float32(s_val - t_val), jnp.float32(gw_i),
                cos, sin, seg, ind, n_text=num_text_tokens)
        return self.decode_latents(z, inputs["grid_h"], inputs["grid_w"])

    def decode_latents(self, z: jax.Array, grid_h: int, grid_w: int
                       ) -> np.ndarray:
        """latent_norm denorm -> token-major 2x2 unpack -> Flux2-VAE decode
        (reference pipeline._decode; NHWC here)."""
        if z.shape[-1] == 128:
            # the statistics are for the production 128-dim latent space;
            # tiny test shells skip the denorm
            shift, scale = latent_norm()
            z = (z.astype(jnp.float32) * jnp.asarray(scale)
                 + jnp.asarray(shift))
        else:
            z = z.astype(jnp.float32)
        B = z.shape[0]
        p = PATCH_SIZE
        ae_ch = z.shape[-1] // (p * p)
        lat = z.reshape(B, grid_h, grid_w, p, p, ae_ch)
        lat = lat.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, grid_h * p, grid_w * p, ae_ch)
        if self.vae_params is None:
            # no VAE on disk: return the spatial latents (tests / shells)
            return np.asarray(lat)
        from ...imagegen.vae import vae_decode

        dtype = self.vae_params["decoder"]["conv_in"]["weight"].dtype
        img = vae_decode(self.vae_params, lat.astype(dtype), self.vae_config)
        img = np.clip(np.asarray(img, np.float32), -1.0, 1.0)
        return np.round((img + 1.0) * 127.5).astype(np.uint8)[0]
