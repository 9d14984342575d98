"""Rotary position embeddings (RoPE zoo), vectorized & jit-friendly.

Role parity: reference `mlx_vlm/models/rope_utils.py` (initialize_rope,
SuScaledRoPE:15, Llama3RoPE:79, YarnRoPE:133, MRoPERotaryEmbedding:998 with
"chunked"/"interleaved" section styles and fused Metal apply kernels :409/:586).

TPU design: cos/sin tables are computed on the fly from position-id arrays
(fp32), and the application is a pure element-wise expression that XLA fuses
into the surrounding projections — no table materialization in HBM, no
scatter.  M-RoPE section gathering is a static `take_along_axis` with a
precomputed section map.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "default_inv_freq",
    "llama3_inv_freq",
    "yarn_inv_freq",
    "rope_cos_sin",
    "apply_rope",
    "mrope_section_map",
    "mrope_cos_sin",
    "make_rope",
]


def default_inv_freq(dim: int, base: float = 10000.0) -> np.ndarray:
    return 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float64) / dim)).astype(
        np.float64
    )


def llama3_inv_freq(dim: int, base: float, scaling: dict) -> np.ndarray:
    """Llama-3 frequency remapping — reference rope_utils.py:79 (Llama3RoPE)."""
    factor = scaling["factor"]
    low_freq_factor = scaling.get("low_freq_factor", 1.0)
    high_freq_factor = scaling.get("high_freq_factor", 4.0)
    old_ctx = scaling.get("original_max_position_embeddings", 8192)

    inv = default_inv_freq(dim, base)
    wavelens = 2 * math.pi / inv
    low_wl = old_ctx / low_freq_factor
    high_wl = old_ctx / high_freq_factor

    inv_scaled = np.where(wavelens > low_wl, inv / factor, inv)
    smooth = (old_ctx / wavelens - low_freq_factor) / (
        high_freq_factor - low_freq_factor
    )
    smoothed = inv * ((1 - smooth) / factor + smooth)
    is_medium = (wavelens > high_wl) & (wavelens < low_wl)
    return np.where(is_medium, smoothed, inv_scaled)


def yarn_inv_freq(dim: int, base: float, scaling: dict) -> tuple[np.ndarray, float]:
    """YaRN — reference rope_utils.py:133. Returns (inv_freq, mscale)."""
    factor = scaling.get("factor", 1.0)
    orig_max = scaling.get("original_max_position_embeddings", 4096)
    beta_fast = scaling.get("beta_fast", 32.0)
    beta_slow = scaling.get("beta_slow", 1.0)
    mscale_all_dim = scaling.get("mscale_all_dim", 0.0)
    mscale = scaling.get("mscale", 1.0)

    def find_dim(num_rot):
        return (dim * math.log(orig_max / (num_rot * 2 * math.pi))) / (
            2 * math.log(base)
        )

    low = max(math.floor(find_dim(beta_fast)), 0)
    high = min(math.ceil(find_dim(beta_slow)), dim - 1)

    inv_extra = default_inv_freq(dim, base) / factor
    inv_inter = default_inv_freq(dim, base)
    ramp = np.clip(
        (np.arange(dim // 2, dtype=np.float64) - low) / max(high - low, 0.001), 0, 1
    )
    inv = inv_inter * (1 - ramp) + inv_extra * ramp

    def get_mscale(scale, m=1.0):
        if scale <= 1:
            return 1.0
        return 0.1 * m * math.log(scale) + 1.0

    att_scale = get_mscale(factor, mscale) / get_mscale(factor, mscale_all_dim)
    return inv, att_scale


def rope_cos_sin(
    positions: jax.Array, inv_freq: jax.Array, attention_scaling: float = 1.0
):
    """positions [...,] int -> cos/sin [..., dim/2] fp32."""
    angles = positions.astype(jnp.float32)[..., None] * inv_freq[None, :].astype(
        jnp.float32
    )
    return jnp.cos(angles) * attention_scaling, jnp.sin(angles) * attention_scaling


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def apply_rope(q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array):
    """Apply half-split ("NeoX") RoPE.

    q,k: [B, H, S, D]; cos/sin: [B, S, D/2] (or broadcastable). The cos/sin
    are duplicated to D (concat) per the HF convention.

    Partial rotary (glm4_moe / phi-style): when cos covers fewer than D/2
    angle slots, only the first 2*slots lanes rotate and the tail passes
    through — a static split XLA fuses away.
    """
    rot = 2 * cos.shape[-1]
    if rot < q.shape[-1]:
        q_r, q_p = q[..., :rot], q[..., rot:]
        k_r, k_p = k[..., :rot], k[..., rot:]
        q_r, k_r = apply_rope(q_r, k_r, cos, sin)
        return (jnp.concatenate([q_r, q_p], axis=-1),
                jnp.concatenate([k_r, k_p], axis=-1))
    cos = jnp.concatenate([cos, cos], axis=-1)[:, None, :, :]
    sin = jnp.concatenate([sin, sin], axis=-1)[:, None, :, :]
    dtype = q.dtype
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = qf * cos + _rotate_half(qf) * sin
    k_out = kf * cos + _rotate_half(kf) * sin
    return q_out.astype(dtype), k_out.astype(dtype)


def apply_rope_traditional(q: jax.Array, k: jax.Array, cos: jax.Array,
                           sin: jax.Array):
    """Apply traditional (interleaved-pair / "GPT-NeoX original") RoPE:
    pair (x[2i], x[2i+1]) rotates by angle_i.

    q,k: [B, H, S, D]; cos/sin: [B, S, D/2] (or broadcastable).
    Used by llama4 (initialize_rope traditional=True) and its vision rope
    (complex multiply, reference llama4/vision.py:100).
    """
    cos = cos[:, None, :, :]
    sin = sin[:, None, :, :]
    dtype = q.dtype

    def rot(x):
        x = x.astype(jnp.float32)
        x1, x2 = x[..., 0::2], x[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x1 * sin + x2 * cos
        return jnp.stack([o1, o2], axis=-1).reshape(x.shape)

    return rot(q).astype(dtype), rot(k).astype(dtype)


def mrope_section_map(sections: Sequence[int], style: str = "chunked") -> np.ndarray:
    """Static map from freq index -> section id (t/h/w).

    "chunked": freq dim split into contiguous [t_len, h_len, w_len] chunks
    (Qwen2-VL); "interleaved": round-robin across sections (Qwen-omni style).
    Reference: rope_utils.py MRoPERotaryEmbedding section styles.
    """
    n = int(sum(sections))
    if style == "chunked":
        out = np.concatenate(
            [np.full(s, i, dtype=np.int32) for i, s in enumerate(sections)]
        )
    elif style == "interleaved":
        # reference rope_utils.py:_interleaved_position_selector — freq index
        # i%3==1 -> h (up to 3*sections[1]), i%3==2 -> w (up to 3*sections[2]),
        # everything else -> t
        out = np.zeros(n, dtype=np.int32)
        for dim, offset in enumerate((1, 2), start=1):
            out[offset:min(sections[dim] * 3, n):3] = dim
    else:
        raise ValueError(f"unknown mrope style {style}")
    return out


def mrope_cos_sin(
    position_ids: jax.Array,  # [3, B, S]
    inv_freq: jax.Array,  # [dim/2]
    section_map: jax.Array,  # [dim/2] int32 in {0,1,2}
    attention_scaling: float = 1.0,
):
    """M-RoPE cos/sin: per-frequency selection of the t/h/w position stream.

    Vectorized equivalent of the reference's chunked split+concat
    (rope_utils.py apply_multimodal_rotary_pos_emb) — one gather instead of
    three slices + concat.
    Returns cos/sin [B, S, dim/2].
    """
    cos3, sin3 = rope_cos_sin(position_ids, inv_freq, attention_scaling)  # [3,B,S,F]
    sel = section_map[None, None, :]  # [1,1,F]
    cos = jnp.take_along_axis(
        jnp.moveaxis(cos3, 0, -1), sel[..., None], axis=-1
    )  # [B,S,F,1]
    sin = jnp.take_along_axis(jnp.moveaxis(sin3, 0, -1), sel[..., None], axis=-1)
    return cos[..., 0], sin[..., 0]


class Rope:
    """Lightweight host-side descriptor; produces cos/sin inside jit."""

    def __init__(
        self,
        dim: int,
        base: float = 10000.0,
        scaling: Optional[dict] = None,
        max_position_embeddings: int = 131072,
        mrope_style: str = "chunked",
    ):
        self.dim = dim
        self.attention_scaling = 1.0
        self.mrope_sections = None
        self.mrope_style = mrope_style
        inv = default_inv_freq(dim, base)
        if scaling:
            typ = scaling.get("type") or scaling.get("rope_type") or "default"
            if typ == "llama3":
                inv = llama3_inv_freq(dim, base, scaling)
            elif typ == "yarn":
                inv, self.attention_scaling = yarn_inv_freq(dim, base, scaling)
            elif typ == "linear":
                inv = inv / scaling.get("factor", 1.0)
            elif typ in ("longrope", "su"):
                # phi3-style per-dim factors + mscale (reference
                # SuScaledRoPE, rope_utils.py:15 — long_factor always
                # applies; explicit long_mscale wins over the derived one)
                lf = np.asarray(scaling.get("long_factor", 1.0), np.float64)
                inv = inv / lf
                orig = scaling.get("original_max_position_embeddings", 4096)
                mscale = scaling.get("long_mscale")
                if mscale:
                    self.attention_scaling = float(mscale)
                else:
                    s = max_position_embeddings / orig
                    if s > 1.0:
                        self.attention_scaling = float(
                            np.sqrt(1.0 + np.log(s) / np.log(orig))
                        )
            elif typ == "proportional":
                # gemma4 global layers (reference ProportionalRoPE,
                # rope_utils.py:204): rotate only the first
                # partial_rotary_factor share of angle slots at
                # frequency/factor; the rest are identity (zero inv-freq)
                factor = float(scaling.get("factor", 1.0))
                partial = float(scaling.get("partial_rotary_factor", 1.0))
                rope_angles = int(partial * dim // 2)
                expo = np.arange(0, 2 * rope_angles, 2, np.float64) / dim
                rot = 1.0 / (factor * np.power(base, expo))
                inv = np.concatenate(
                    [rot, np.zeros(dim // 2 - rope_angles)])
            elif typ in ("mrope", "default"):
                if "mrope_section" in scaling:
                    self.mrope_sections = tuple(scaling["mrope_section"])
            else:
                raise ValueError(f"unsupported rope scaling type: {typ}")
        # HOST-side constants (numpy): device copies made at rope init can
        # be evicted by the axon pool under later memory pressure and then
        # fail both D2H readback and jit constant-folding; numpy embeds
        # cleanly as a compile-time constant every trace
        self.inv_freq = np.asarray(inv, dtype=np.float32)
        if self.mrope_sections is not None:
            self.section_map = np.asarray(
                mrope_section_map(self.mrope_sections, self.mrope_style)
            )

    def cos_sin(self, position_ids: jax.Array):
        """position_ids: [B,S] (1-D rope) or [3,B,S] (M-RoPE)."""
        if self.mrope_sections is not None and position_ids.ndim == 3:
            return mrope_cos_sin(
                position_ids, self.inv_freq, self.section_map, self.attention_scaling
            )
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        return rope_cos_sin(position_ids, self.inv_freq, self.attention_scaling)


def make_rope(
    dim: int,
    base: float,
    scaling: Optional[dict] = None,
    max_position_embeddings: int = 131072,
    mrope_style: str = "chunked",
) -> Rope:
    """Dispatcher — reference rope_utils.py:269 (initialize_rope)."""
    return Rope(dim, base, scaling, max_position_embeddings, mrope_style)
