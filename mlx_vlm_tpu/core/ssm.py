"""Selective state-space (Mamba-style) scan ops.

Role parity: reference mlx_vlm/models/ssm.py — make_ssm_kernel:14 (prefill
scan) and ssm_update_kernel:67 (single decode step), used by the SSM/hybrid
families (nemotron_h, lfm2, baichuan_m1, qwen3_next ...).

TPU design: the recurrence h_t = exp(Δ_t A) h_{t-1} + Δ_t B_t x_t is a
first-order linear scan, so prefill runs as `jax.lax.associative_scan`
(log-depth, MXU/VPU friendly, no sequential loop) and decode is one fused
elementwise step.  Recurrent state lives in an ArraysCache-style slot
(core/cache.py conventions: functional, fixed shapes).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _assoc_op(a, b):
    """Compose two (decay, increment) pairs of the linear recurrence."""
    (da, xa), (db, xb) = a, b
    return da * db, xb + db * xa


def selective_scan(
    x: jax.Array,  # [B, S, D]   inputs
    delta: jax.Array,  # [B, S, D]   softplus-ed step sizes
    A: jax.Array,  # [D, N]      state matrix (negative; log-space per mamba)
    B: jax.Array,  # [B, S, N]   input projection
    C: jax.Array,  # [B, S, N]   output projection
    D: Optional[jax.Array] = None,  # [D] skip connection
    h0: Optional[jax.Array] = None,  # [B, D, N] initial state
) -> Tuple[jax.Array, jax.Array]:
    """Parallel selective scan -> (y [B,S,D], h_last [B,D,N]).

    Discretization (mamba): dA = exp(Δ ⊗ A), dB = Δ ⊗ B; state
    h_t = dA_t * h_{t-1} + dB_t * x_t; output y_t = (C_t · h_t) + D * x_t.
    """
    Bsz, S, Dm = x.shape
    N = A.shape[1]
    dA = jnp.exp(
        delta[..., None] * A[None, None]
    )  # [B, S, D, N]
    dBx = delta[..., None] * B[:, :, None, :] * x[..., None]  # [B, S, D, N]
    if h0 is not None:
        # fold the carried state into the first step's increment
        dBx = dBx.at[:, 0].add(dA[:, 0] * h0)
    decays, states = jax.lax.associative_scan(_assoc_op, (dA, dBx), axis=1)
    y = jnp.einsum("bsn,bsdn->bsd", C, states)
    if D is not None:
        y = y + D[None, None, :] * x
    return y.astype(x.dtype), states[:, -1]


def ssm_update(
    x: jax.Array,  # [B, D]
    delta: jax.Array,  # [B, D]
    A: jax.Array,  # [D, N]
    B: jax.Array,  # [B, N]
    C: jax.Array,  # [B, N]
    h: jax.Array,  # [B, D, N] previous state
    D: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """One decode step (reference ssm_update_kernel:67) -> (y [B,D], h')."""
    dA = jnp.exp(delta[..., None] * A[None])  # [B, D, N]
    h = dA * h + delta[..., None] * B[:, None, :] * x[..., None]
    y = jnp.einsum("bn,bdn->bd", C, h)
    if D is not None:
        y = y + D[None, :] * x
    return y.astype(x.dtype), h


def mamba2_scan(
    x: jax.Array,  # [B, S, H, P] per-head inputs
    A_log: jax.Array,  # [H] log of per-head decay magnitude
    B: jax.Array,  # [B, S, G, N] input projection (grouped)
    C: jax.Array,  # [B, S, G, N] output projection (grouped)
    D: jax.Array,  # [H] skip
    dt: jax.Array,  # [B, S, H] raw step sizes
    dt_bias: jax.Array,  # [H]
    state: Optional[jax.Array] = None,  # [B, H, P, N]
    time_step_limit=(0.001, 100.0),
    valid: Optional[jax.Array] = None,  # [B, S] bool; pads freeze the state
) -> Tuple[jax.Array, jax.Array]:
    """Mamba-2 (SSD) multi-head scan -> (y [B,S,H,P], state [B,H,P,N]).

    Reference models/ssm.py:198 (ssm_update / make_ssm_kernel).  The
    recurrence is linear, so prefill runs as one log-depth
    `associative_scan`; masked steps use dt=0 (decay 1, increment 0), which
    freezes the state exactly.  Memory note: materializes [B,S,H,P,N]
    increments — a chunked SSD formulation is the follow-up optimization for
    long prefills."""
    Bsz, S, H, P = x.shape
    G, N = B.shape[-2], B.shape[-1]
    rep = H // G
    dt = jax.nn.softplus(dt.astype(jnp.float32) + dt_bias.astype(jnp.float32))
    dt = jnp.clip(dt, time_step_limit[0], time_step_limit[1])
    if valid is not None:
        dt = jnp.where(valid[..., None], dt, 0.0)
    a = -jnp.exp(A_log.astype(jnp.float32))  # [H]
    dA = jnp.exp(dt * a[None, None])  # [B,S,H]
    Bh = jnp.repeat(B.astype(jnp.float32), rep, axis=2)  # [B,S,H,N]
    Ch = jnp.repeat(C.astype(jnp.float32), rep, axis=2)
    xf = x.astype(jnp.float32)
    dBx = (dt[..., None, None] * Bh[:, :, :, None, :] * xf[..., None])
    if state is not None:
        dBx = dBx.at[:, 0].add(dA[:, 0][..., None, None] * state.astype(jnp.float32))
    decays = dA[..., None, None]  # [B,S,H,1,1] broadcasts inside the op
    _, states = jax.lax.associative_scan(_assoc_op, (decays, dBx), axis=1)
    y = jnp.einsum("bshn,bshpn->bshp", Ch, states)
    y = y + D.astype(jnp.float32)[None, None, :, None] * xf
    return y.astype(x.dtype), states[:, -1]


def gated_delta_update(
    k: jax.Array,  # [B, H, Dk]
    v: jax.Array,  # [B, H, Dv]
    q: jax.Array,  # [B, H, Dk]
    g: jax.Array,  # [B, H] decay gate in (0, 1)
    beta: jax.Array,  # [B, H] write strength
    state: jax.Array,  # [B, H, Dk, Dv] associative memory
    valid: Optional[jax.Array] = None,  # [B] bool: update state this step?
) -> Tuple[jax.Array, jax.Array]:
    """Gated delta-rule recurrent step (reference models/gated_delta.py:13,
    Qwen3-Next/3.5 linear-attention layers).

    Matches the reference kernel ordering exactly: the decay applies BEFORE
    the prediction read —
        s1     = g * state
        state' = s1 + beta * k^T (v - k·s1)
        y      = q · state'
    Masked steps (valid=False, left-pad rows) leave the state untouched and
    emit y=0 (reference gated_delta.py kernel `mask` branch).
    """
    s1 = g[..., None, None] * state
    pred = jnp.einsum("bhk,bhkv->bhv", k, s1)
    delta = (v - pred) * beta[..., None]
    new_state = s1 + jnp.einsum("bhk,bhv->bhkv", k, delta)
    y = jnp.einsum("bhk,bhkv->bhv", q, new_state)
    if valid is not None:
        keep = valid[:, None, None, None]
        new_state = jnp.where(keep, new_state, state)
        y = jnp.where(valid[:, None, None], y, 0.0)
    return y, new_state


def gated_delta_scan(
    q: jax.Array,  # [B, S, H, Dk]
    k: jax.Array,  # [B, S, H, Dk]
    v: jax.Array,  # [B, S, H, Dv]
    g: jax.Array,  # [B, S, H]
    beta: jax.Array,  # [B, S, H]
    state: jax.Array,  # [B, H, Dk, Dv]
    valid: Optional[jax.Array] = None,  # [B, S] bool
) -> Tuple[jax.Array, jax.Array]:
    """Sequential delta-rule over S steps -> (y [B,S,H,Dv], final state).

    The delta rule reads the state nonlinearly (k·state) so it is not an
    associative scan; prefill runs as lax.scan over time with fused
    elementwise/MXU step bodies (reference loops over T inside its kernel,
    gated_delta.py:62-96)."""

    def step(s, xs):
        if valid is None:
            qt, kt, vt, gt, bt = xs
            va = None
        else:
            qt, kt, vt, gt, bt, va = xs
        y, s = gated_delta_update(kt, vt, qt, gt, bt, s, va)
        return s, y

    xs = tuple(jnp.moveaxis(t, 1, 0) for t in (q, k, v, g, beta))
    if valid is not None:
        xs = xs + (jnp.moveaxis(valid, 1, 0),)
    state = state.astype(jnp.float32)
    final, ys = jax.lax.scan(step, state, xs)
    return jnp.moveaxis(ys, 0, 1).astype(v.dtype), final


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["slots", "offset"],
    meta_fields=[],
)
@dataclasses.dataclass
class ArraysCache:
    """Opaque recurrent-state slots (reference cache.py:557 ArraysCache):
    carries SSM / delta-rule states through the decode loop."""

    slots: tuple
    offset: jax.Array

    def scan_arrays(self):
        return self.slots

    def with_arrays(self, ys, new_tokens: int):
        return ArraysCache(slots=tuple(ys), offset=self.offset + new_tokens)
