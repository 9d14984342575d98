"""Mixture-of-Experts layers (SwitchGLU).

Role parity: reference mlx_vlm/models/switch_layers.py — SwitchGLU /
QuantizedSwitchLinear (gather-sort token routing over mx.gather_qmm,
switch_layers.py:24-196).

TPU design: experts are stacked on an axis of the weight arrays
([..., E, I, D]) and a `lax.scan` over experts computes masked
contributions — static shapes, no sort/scatter, fully fused by XLA.  This
over-computes by E/k (every expert sees every token); a Pallas
gather-matmul kernel (mx.gather_qmm equivalent) is the planned hot-path
replacement for decode.  Capacity-based dispatch einsums (GShard-style)
become attractive only with expert parallelism over the mesh.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .layers import linear
from .quant import (
    ChannelQuantizedTensor,
    QuantizedTensor,
    channel_quantized_matmul,
    quantized_matmul,
)


def topk_router(
    x: jax.Array,  # [N, D]
    gate_w: jax.Array,  # [E, D] router weight (HF layout)
    top_k: int,
    norm_topk_prob: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (indices [N,k], weights [N,k]) — softmax-then-topk routing."""
    logits = linear({"weight": gate_w}, x).astype(jnp.float32)  # [N, E]
    probs = jax.nn.softmax(logits, axis=-1)
    weights, indices = jax.lax.top_k(probs, top_k)
    if norm_topk_prob:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return indices, weights


def switch_mlp(
    x: jax.Array,  # [N, D]
    up_proj,  # [E, I, D]
    down_proj,  # [E, D, I]
    indices: jax.Array,  # [N, k]
    weights: jax.Array,  # [N, k]
    act=None,
    biases=None,  # optional (bu [E, I], bd [E, D]) expert biases
) -> jax.Array:
    """Top-k expert 2-layer MLP (no gate branch) via masked scan over
    experts — reference SwitchMLP with configurable activation (nemotron_h
    relu^2 experts; phixtral biased gelu experts)."""
    if act is None:
        act = lambda v: jnp.square(jax.nn.relu(v))  # noqa: E731
    N, D = x.shape
    dtype = x.dtype
    E, d_out = up_proj.shape[0], down_proj.shape[1]
    if biases is None:
        bu = jnp.zeros((E, up_proj.shape[1]), dtype)
        bd = jnp.zeros((E, d_out), dtype)
    else:
        bu, bd = biases

    def body(acc, xs):
        e_idx, wu, wd, bue, bde = xs
        sel = (indices == e_idx).astype(jnp.float32) * weights.astype(jnp.float32)
        w_tok = jnp.sum(sel, axis=-1)
        out = _expert_matmul(
            act(_expert_matmul(x, wu) + bue.astype(dtype)), wd
        ) + bde.astype(dtype)
        return acc + w_tok[:, None].astype(dtype) * out, None

    e_ids = jnp.arange(E, dtype=indices.dtype)
    acc0 = jnp.zeros((N, d_out), dtype)
    acc, _ = jax.lax.scan(body, acc0, (e_ids, up_proj, down_proj, bu, bd))
    return acc


def group_expert_select(
    logits: jax.Array,  # [N, E] router logits
    bias: jax.Array,  # [E] e_score_correction_bias
    top_k: int,
    n_group: int,
    topk_group: int,
    routed_scaling_factor: float,
    norm_topk_prob: bool,
) -> Tuple[jax.Array, jax.Array]:
    """DeepSeek-V3 "noaux_tc" routing (reference deepseek_v3/language.py:141):
    sigmoid scores + correction bias for SELECTION, original sigmoid scores
    as WEIGHTS; only the topk_group groups (ranked by their top-2 score sum)
    stay eligible."""
    N, E = logits.shape
    scores = jax.nn.sigmoid(logits.astype(jnp.float32))
    sel = scores + bias.astype(jnp.float32)[None]
    if n_group > 1:
        g = sel.reshape(N, n_group, E // n_group)
        top2, _ = jax.lax.top_k(g, 2)
        group_scores = top2.sum(-1)  # [N, n_group]
        _, keep_idx = jax.lax.top_k(group_scores, topk_group)
        keep = jnp.zeros((N, n_group), bool)
        keep = jnp.put_along_axis(keep, keep_idx, True, axis=-1,
                                  inplace=False)
        sel = jnp.where(keep[..., None], g, 0.0).reshape(N, E)
    _, indices = jax.lax.top_k(sel, top_k)
    weights = jnp.take_along_axis(scores, indices, axis=-1)
    if top_k > 1 and norm_topk_prob:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return indices, weights * routed_scaling_factor


def _expert_matmul(x, w):
    if isinstance(w, ChannelQuantizedTensor):
        return channel_quantized_matmul(x, w)
    if isinstance(w, QuantizedTensor):
        return quantized_matmul(x, w, transpose=True)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (w.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def switch_glu(
    x: jax.Array,  # [N, D]
    gate_proj,  # [E, I, D] (stacked expert weights, possibly quantized)
    up_proj,  # [E, I, D]
    down_proj,  # [E, D, I]
    indices: jax.Array,  # [N, k]
    weights: jax.Array,  # [N, k]
    act2=None,  # optional (gate, up) -> hidden (default silu(g) * u)
    biases=None,  # optional (bg [E,I], bu [E,I], bd [E,D]) expert biases
) -> jax.Array:
    """Top-k expert SwiGLU via masked scan over experts (or the dense
    expert-axis einsum under expert parallelism)."""
    if (
        _EXPERT_PARALLEL[0]
        and not isinstance(gate_proj, (QuantizedTensor, ChannelQuantizedTensor))
    ):
        return switch_glu_dense(
            x, gate_proj, up_proj, down_proj, indices, weights, act2, biases
        )
    N, D = x.shape
    dtype = x.dtype
    if act2 is None:
        act2 = lambda g, u: jax.nn.silu(g) * u  # noqa: E731

    if biases is None:
        zero = jnp.zeros((gate_proj.shape[0], 1), dtype)
        bg = bu = bd = zero
    else:
        bg, bu, bd = (b.astype(dtype) for b in biases)

    def body(acc, xs):
        e_idx, wg, wu, wd, ebg, ebu, ebd = xs
        # per-token routing weight for this expert (0 if not routed)
        sel = (indices == e_idx).astype(jnp.float32) * weights.astype(jnp.float32)
        w_tok = jnp.sum(sel, axis=-1)  # [N]
        h = act2(_expert_matmul(x, wg) + ebg, _expert_matmul(x, wu) + ebu)
        out = _expert_matmul(h, wd) + ebd
        return acc + w_tok[:, None].astype(dtype) * out, None

    E = gate_proj.shape[0]
    e_ids = jnp.arange(E, dtype=indices.dtype)
    acc0 = jnp.zeros((N, D), dtype)
    acc, _ = jax.lax.scan(
        body, acc0, (e_ids, gate_proj, up_proj, down_proj, bg, bu, bd)
    )
    return acc


# --------------------------------------------------------------- expert par.
_EXPERT_PARALLEL = [False]


def set_expert_parallel(enabled: bool):
    """Trace-time switch to the dense (shardable) expert formulation.

    The masked `lax.scan` over experts cannot shard its scanned axis (GSPMD
    would all-gather the expert stack per step); the dense einsum keeps the
    expert dimension as a real array axis so a P(..., "expert", ...) weight
    sharding turns into per-device expert subsets + one all-reduce.  Set by
    `parallel.shard.shard_model` when the mesh has expert_parallel > 1.
    """
    _EXPERT_PARALLEL[0] = bool(enabled)


def expert_parallel_enabled() -> bool:
    return _EXPERT_PARALLEL[0]


def switch_glu_dense(
    x: jax.Array,  # [N, D]
    gate_proj: jax.Array,  # [E, I, D] (dense arrays only)
    up_proj: jax.Array,
    down_proj: jax.Array,  # [E, D, I]
    indices: jax.Array,  # [N, k]
    weights: jax.Array,  # [N, k]
    act2=None,
    biases=None,  # optional (bg [E,I], bu [E,I], bd [E,D]) expert biases
) -> jax.Array:
    """Expert-axis-preserving SwiGLU: identical math (and FLOPs) to the
    masked scan, but experts stay an array axis for EP sharding."""
    if act2 is None:
        act2 = lambda g, u: jax.nn.silu(g) * u  # noqa: E731
    E = gate_proj.shape[0]
    f32 = jnp.float32
    sel = jax.nn.one_hot(indices, E, dtype=f32) * weights.astype(f32)[..., None]
    w_tok = sel.sum(axis=1).T  # [E, N]
    g = jnp.einsum("nd,eid->eni", x, gate_proj,
                   preferred_element_type=f32).astype(x.dtype)
    u = jnp.einsum("nd,eid->eni", x, up_proj,
                   preferred_element_type=f32).astype(x.dtype)
    if biases is not None:
        bg, bu, _ = biases
        g = g + bg.astype(g.dtype)[:, None, :]
        u = u + bu.astype(u.dtype)[:, None, :]
    h = act2(g, u)
    y = jnp.einsum("eni,edi->end", h, down_proj,
                   preferred_element_type=f32)
    if biases is not None:
        y = y + biases[2].astype(y.dtype)[:, None, :]
    y = (y * w_tok[..., None]).sum(axis=0)
    return y.astype(x.dtype)
