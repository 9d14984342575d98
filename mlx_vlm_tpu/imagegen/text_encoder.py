"""Qwen3 text encoder for Flux2 prompt embedding.

Role parity: reference mlx_vlm/models/flux2/qwen/* — Qwen3TextEncoder
(text_encoder.py) returning multi-layer hidden states, concatenated along
features for layers (9, 18, 27) (get_prompt_embeds).

TPU design: the 36 decoder layers are weight-stacked [L, ...] and run under
one `lax.scan`; the per-layer hidden states the reference accumulates in a
Python list fall out of the scan's `ys` for free.  The static layer
selection then indexes the stacked [L+1, B, S, D] tensor.  Full prefill
only (no KV cache — the encoder is single-shot), GQA without materializing
repeated KV heads via ops.attention.sdpa.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.layers import embedding, linear, rms_norm, swiglu_mlp
from ..ops.attention import sdpa

__all__ = ["TextEncoderConfig", "encode_text", "TEXT_ENCODER_STACK_PATTERNS"]

TEXT_ENCODER_STACK_PATTERNS = ("layers",)


@dataclasses.dataclass
class TextEncoderConfig:
    vocab_size: int = 151936
    hidden_size: int = 2560
    num_hidden_layers: int = 36
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    intermediate_size: int = 9728
    head_dim: int = 128
    rope_theta: float = 1000000.0
    rms_norm_eps: float = 1e-6
    # which hidden states feed the DiT (0 = embeddings, i = layer i output)
    hidden_state_layers: Tuple[int, ...] = (9, 18, 27)

    @classmethod
    def from_dict(cls, d: dict) -> "TextEncoderConfig":
        import inspect

        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in d.items() if k in allowed})


def _rope_tables(seq_len: int, head_dim: int, theta: float):
    """HF-style cos/sin [S, D] (duplicated halves, rotate_half convention —
    reference qwen/rotary.py)."""
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, jnp.float32) / head_dim))
    pos = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = pos[:, None] * inv[None]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x [B, H, S, D]; rotate_half application in fp32."""
    xf = x.astype(jnp.float32)
    d = xf.shape[-1] // 2
    x1, x2 = xf[..., :d], xf[..., d:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (xf * cos[None, None] + rotated * sin[None, None]).astype(x.dtype)


def encode_text(
    params: dict,
    config: TextEncoderConfig,
    input_ids: jax.Array,  # [B, S] int32
    attention_mask: jax.Array,  # [B, S] 1=real 0=pad
    hidden_state_layers: Optional[Tuple[int, ...]] = None,
) -> jax.Array:
    """[B, S, len(layers) * hidden] prompt embeddings.

    Indexing matches HF / the reference: index 0 is the embedding output,
    index i is the output of decoder layer i.
    """
    cfg = config
    if hidden_state_layers is None:
        hidden_state_layers = tuple(cfg.hidden_state_layers)
    nh, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)
    B, S = input_ids.shape

    h = embedding(params["embed_tokens"], input_ids)
    dtype = h.dtype

    idx = jnp.arange(S)
    causal = idx[None, :] <= idx[:, None]  # [S, S]
    pad_ok = attention_mask.astype(jnp.bool_)  # [B, S] keys
    mask = causal[None, None] & pad_ok[:, None, None, :]  # [B,1,S,S]

    cos, sin = _rope_tables(S, hd, cfg.rope_theta)

    def layer(h, lp):
        a = lp["self_attn"]
        x = rms_norm(lp["input_layernorm"], h, cfg.rms_norm_eps)
        q = linear(a["q_proj"], x).reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        k = linear(a["k_proj"], x).reshape(B, S, nkv, hd).transpose(0, 2, 1, 3)
        v = linear(a["v_proj"], x).reshape(B, S, nkv, hd).transpose(0, 2, 1, 3)
        q = rms_norm(a["q_norm"], q, cfg.rms_norm_eps)
        k = rms_norm(a["k_norm"], k, cfg.rms_norm_eps)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        o = sdpa(q, k, v, scale=hd ** -0.5, mask=mask)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, nh * hd)
        h = h + linear(a["o_proj"], o)
        x = rms_norm(lp["post_attention_layernorm"], h, cfg.rms_norm_eps)
        h = h + swiglu_mlp(lp["mlp"], x)
        return h, h

    _, per_layer = jax.lax.scan(layer, h, params["layers"])
    all_states = jnp.concatenate([h[None], per_layer], axis=0)  # [L+1,B,S,D]
    picked = [all_states[i] for i in hidden_state_layers]
    return jnp.concatenate(picked, axis=-1).astype(dtype)
