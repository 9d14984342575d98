"""Scaled-dot-product attention for TPU.

Role parity: reference routes through `mx.fast.scaled_dot_product_attention`
(mlx_vlm/models/base.py:292).  Here the default path is a pure-XLA einsum
formulation with fp32 softmax that XLA maps onto the MXU; grouped-query
attention is computed without materializing repeated KV heads.  A Pallas
flash-attention kernel (ops/flash_attention.py) takes over for long-context
prefill where the S×C score matrix would not fit in VMEM.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["sdpa"]

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def sdpa(
    q: jax.Array,  # [B, n_heads, S, D]
    k: jax.Array,  # [B, n_kv_heads, C, D]
    v: jax.Array,  # [B, n_kv_heads, C, D]
    scale: float,
    mask: Optional[jax.Array] = None,  # bool, broadcastable to [B, n_heads, S, C]
    logit_softcap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,  # [n_heads] learned sink logits
) -> jax.Array:
    """Masked SDPA with GQA-aware grouping and fp32 softmax accumulation.

    `sinks` adds one per-head virtual logit to the softmax denominator and
    drops its probability mass (gpt_oss attention sinks — reference
    base.py sdpa `sinks=` / gpt_oss/language.py:101)."""
    B, nh, S, D = q.shape
    nkv = k.shape[1]
    groups = nh // nkv
    dtype = q.dtype

    qg = q.reshape(B, nkv, groups, S, D)
    scores = jnp.einsum(
        "bkgsd,bktd->bkgst", qg, k, preferred_element_type=jnp.float32
    )
    scores = scores * jnp.float32(scale)
    if logit_softcap is not None:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap
    if mask is not None:
        if mask.dtype == jnp.bool_:
            m = mask
            if m.ndim == 4:  # [B, 1 or nh, S, C] -> group layout
                mh = m.shape[1]
                if mh == 1:
                    m = m[:, :, None, :, :]
                else:
                    m = m.reshape(B, nkv, groups, S, -1)
            scores = jnp.where(m, scores, _NEG_INF)
        else:
            add = mask.astype(jnp.float32)
            if add.ndim == 4:
                add = add[:, :, None, :, :] if add.shape[1] == 1 else add.reshape(
                    B, nkv, groups, S, -1
                )
            scores = scores + add
    if sinks is not None:
        col = jnp.broadcast_to(
            sinks.astype(jnp.float32).reshape(1, nkv, groups, 1, 1),
            (B, nkv, groups, S, 1),
        )
        probs = jax.nn.softmax(
            jnp.concatenate([scores, col], axis=-1), axis=-1
        )[..., :-1]
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bkgst,bktd->bkgsd", probs.astype(dtype), v, preferred_element_type=jnp.float32
    )
    # v's head dim may differ from q/k's (e.g. mimo_v2_flash swa layers)
    return out.reshape(B, nh, S, v.shape[-1]).astype(dtype)
