"""Rectified-flow MMDiT (Flux2-class) — double-stream + single-stream blocks.

Role parity: reference mlx_vlm/models/flux2/transformer/* —
transformer.py (shared per-stream modulation, x/context embedders, 4-axis
rope), transformer_block.py (joint txt+img attention with per-stream
qkv/out + SwiGLU FFs), single_transformer_block.py (fused parallel
attention+MLP), timestep_guidance_embeddings.py, ada_layer_norm_continuous.

TPU design: the per-layer weights are stacked [L, ...] and both block
stacks run under `lax.scan` — one compiled body each regardless of depth.
Modulation tensors are computed once per step (they are shared across
layers in this architecture) and enter the scan as closures.  Rope uses
the interleaved (real, imag) pair convention of the reference
(`apply_rope_bshd`, attention_utils.py:148).  Classifier-free guidance
batches cond/uncond rows through one forward (MXU-friendly) instead of
two launches.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class DiTConfig:
    patch_size: int = 1
    in_channels: int = 128
    num_layers: int = 5
    num_single_layers: int = 20
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 7680
    timestep_guidance_channels: int = 256
    mlp_ratio: float = 3.0
    axes_dims_rope: Tuple[int, ...] = (32, 32, 32, 32)
    rope_theta: float = 2000.0
    guidance_embeds: bool = False

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def mlp_hidden(self) -> int:
        return int(self.inner_dim * self.mlp_ratio)

    @classmethod
    def from_dict(cls, d: dict) -> "DiTConfig":
        import inspect

        allowed = inspect.signature(cls).parameters
        d = {k: (tuple(v) if isinstance(v, list) else v)
             for k, v in d.items() if k in allowed}
        return cls(**d)


# ------------------------------------------------------------------ rope
def pos_rope(ids: np.ndarray, axes_dim, theta: float):
    """cos/sin [N, sum(axes_dim)//2] from multi-axis integer coords [N, A]
    (reference pos_embed.py — per-axis 1-D rope, concatenated)."""
    ids = np.asarray(ids, np.float32)
    cos_out, sin_out = [], []
    for i, dim in enumerate(axes_dim):
        omega = 1.0 / (theta ** (np.arange(0, dim, 2, np.float32) / dim))
        out = ids[..., i : i + 1] * omega[None]
        cos_out.append(np.cos(out))
        sin_out.append(np.sin(out))
    return (
        np.concatenate(cos_out, axis=-1),
        np.concatenate(sin_out, axis=-1),
    )


def apply_rope_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array):
    """x [B, H, N, D] with (real, imag) interleaved along D; cos/sin
    [N, D/2] (reference apply_rope_bshd)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    x2 = xf.reshape(*xf.shape[:-1], -1, 2)
    real, imag = x2[..., 0], x2[..., 1]
    c = cos[None, None]
    s = sin[None, None]
    out = jnp.stack([real * c - imag * s, imag * c + real * s], axis=-1)
    return out.reshape(xf.shape).astype(dtype)


# ----------------------------------------------------------------- layers
def _linear(p, x):
    y = jnp.einsum("...d,od->...o", x, p["weight"],
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _ln(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _rms(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    xn = xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + eps)
    return (xn * p["weight"].astype(jnp.float32)).astype(x.dtype)


def _swiglu(x):
    a, b = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(a) * b


def _ff(p, x):
    return _linear(p["linear_out"], _swiglu(_linear(p["linear_in"], x)))


def timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal embedding, cos-first (reference
    timestep_guidance_embeddings.py:_timestep_embedding w/ flip)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _heads(x, n_heads, head_dim):
    B, N, _ = x.shape
    return x.reshape(B, N, n_heads, head_dim).transpose(0, 2, 1, 3)


def _attention(q, k, v):
    B, H, N, D = q.shape
    scores = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores * (D**-0.5), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", probs, v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(B, N, H * D)


class DiT:
    """Functional MMDiT: `params` is a pytree with stacked block leaves."""

    def __init__(self, config: DiTConfig):
        self.config = config

    # --------------------------------------------------------- embeddings
    def time_embed(self, params, timestep, guidance=None):
        cfg = self.config
        p = params["time_guidance_embed"]
        emb = timestep_embedding(timestep, cfg.timestep_guidance_channels)
        temb = _linear(p["linear_2"], jax.nn.silu(_linear(p["linear_1"], emb)))
        if guidance is not None and "guidance_linear_1" in p:
            g = timestep_embedding(guidance, cfg.timestep_guidance_channels)
            temb = temb + _linear(
                p["guidance_linear_2"],
                jax.nn.silu(_linear(p["guidance_linear_1"], g)),
            )
        return temb

    @staticmethod
    def _mod_params(p, temb, sets: int):
        mod = _linear(p["linear"], jax.nn.silu(temb))[:, None, :]  # [B,1,3S*D]
        parts = jnp.split(mod, 3 * sets, axis=-1)
        return tuple(tuple(parts[3 * i : 3 * (i + 1)]) for i in range(sets))

    # ------------------------------------------------------------ forward
    def __call__(
        self,
        params,
        hidden_states: jax.Array,  # [B, N_img, in_channels]
        encoder_hidden_states: jax.Array,  # [B, N_txt, joint_dim]
        timestep: jax.Array,  # [B] (0..1 or train units)
        rope_img: Tuple[jax.Array, jax.Array],  # cos/sin [N_img, D/2]
        rope_txt: Tuple[jax.Array, jax.Array],
        guidance: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
        timestep = jnp.where(jnp.max(timestep) <= 1.0, timestep * 1000.0,
                             timestep)
        if guidance is not None:
            guidance = jnp.where(jnp.max(guidance) <= 1.0, guidance * 1000.0,
                                 guidance)
        temb = self.time_embed(params, timestep, guidance)
        temb = temb.astype(hidden_states.dtype)

        img = _linear(params["x_embedder"], hidden_states)
        txt = _linear(params["context_embedder"], encoder_hidden_states)
        n_txt = txt.shape[1]

        cos = jnp.concatenate([rope_txt[0], rope_img[0]], axis=0)
        sin = jnp.concatenate([rope_txt[1], rope_img[1]], axis=0)

        # shared (per-step, all layers) modulation params
        mod_img = self._mod_params(
            params["double_stream_modulation_img"], temb, 2)
        mod_txt = self._mod_params(
            params["double_stream_modulation_txt"], temb, 2)
        (mod_single,) = self._mod_params(
            params["single_stream_modulation"], temb, 1)

        (i_shift_a, i_scale_a, i_gate_a), (i_shift_m, i_scale_m, i_gate_m) = mod_img
        (t_shift_a, t_scale_a, t_gate_a), (t_shift_m, t_scale_m, t_gate_m) = mod_txt

        def double_block(carry, lp):
            img, txt = carry
            a = lp["attn"]
            ni = _ln(img) * (1 + i_scale_a) + i_shift_a
            nt = _ln(txt) * (1 + t_scale_a) + t_shift_a
            q = _rms(a["norm_q"], _heads(_linear(a["to_q"], ni), nh, hd))
            k = _rms(a["norm_k"], _heads(_linear(a["to_k"], ni), nh, hd))
            v = _heads(_linear(a["to_v"], ni), nh, hd)
            eq = _rms(a["norm_added_q"],
                      _heads(_linear(a["add_q_proj"], nt), nh, hd))
            ek = _rms(a["norm_added_k"],
                      _heads(_linear(a["add_k_proj"], nt), nh, hd))
            ev = _heads(_linear(a["add_v_proj"], nt), nh, hd)
            q = jnp.concatenate([eq, q], axis=2)
            k = jnp.concatenate([ek, k], axis=2)
            v = jnp.concatenate([ev, v], axis=2)
            q = apply_rope_interleaved(q, cos, sin)
            k = apply_rope_interleaved(k, cos, sin)
            o = _attention(q, k, v)
            txt_o, img_o = o[:, :n_txt], o[:, n_txt:]
            img = img + i_gate_a * _linear(a["to_out"], img_o)
            txt = txt + t_gate_a * _linear(a["to_add_out"], txt_o)
            ni = _ln(img) * (1 + i_scale_m) + i_shift_m
            img = img + i_gate_m * _ff(lp["ff"], ni)
            nt = _ln(txt) * (1 + t_scale_m) + t_shift_m
            txt = txt + t_gate_m * _ff(lp["ff_context"], nt)
            return (img, txt), None

        (img, txt), _ = jax.lax.scan(
            double_block, (img, txt), params["transformer_blocks"]
        )

        h = jnp.concatenate([txt, img], axis=1)
        s_shift, s_scale, s_gate = mod_single

        def single_block(h, lp):
            a = lp["attn"]
            n = _ln(h) * (1 + s_scale) + s_shift
            proj = _linear(a["to_qkv_mlp_proj"], n)
            qkv, mlp = jnp.split(proj, [3 * cfg.inner_dim], axis=-1)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = _rms(a["norm_q"], _heads(q, nh, hd))
            k = _rms(a["norm_k"], _heads(k, nh, hd))
            v = _heads(v, nh, hd)
            q = apply_rope_interleaved(q, cos, sin)
            k = apply_rope_interleaved(k, cos, sin)
            o = _attention(q, k, v)
            o = jnp.concatenate([o, _swiglu(mlp)], axis=-1)
            return h + s_gate * _linear(a["to_out"], o), None

        h, _ = jax.lax.scan(single_block, h, params["single_transformer_blocks"])
        img = h[:, n_txt:]

        # AdaLayerNormContinuous out
        po = params["norm_out"]
        mod = _linear(po["linear"], jax.nn.silu(temb))
        scale, shift = jnp.split(mod, 2, axis=-1)
        img = _ln(img) * (1 + scale[:, None, :]) + shift[:, None, :]
        return _linear(params["proj_out"], img)
