import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.core.ssm import gated_delta_update, selective_scan, ssm_update


def _ref_sequential(x, delta, A, B, C, D=None, h0=None):
    """Plain-python sequential reference."""
    Bsz, S, Dm = x.shape
    N = A.shape[1]
    h = np.zeros((Bsz, Dm, N)) if h0 is None else np.asarray(h0).copy()
    ys = []
    for t in range(S):
        dA = np.exp(delta[:, t, :, None] * A[None])
        h = dA * h + delta[:, t, :, None] * B[:, t, None, :] * x[:, t, :, None]
        y = np.einsum("bn,bdn->bd", C[:, t], h)
        if D is not None:
            y = y + D[None] * x[:, t]
        ys.append(y)
    return np.stack(ys, 1), h


class TestSelectiveScan:
    def test_matches_sequential(self):
        rng = np.random.default_rng(0)
        Bsz, S, Dm, N = 2, 9, 4, 3
        x = rng.standard_normal((Bsz, S, Dm)).astype(np.float32)
        delta = np.abs(rng.standard_normal((Bsz, S, Dm))).astype(np.float32) * 0.1
        A = -np.abs(rng.standard_normal((Dm, N))).astype(np.float32)
        B = rng.standard_normal((Bsz, S, N)).astype(np.float32)
        C = rng.standard_normal((Bsz, S, N)).astype(np.float32)
        D = rng.standard_normal(Dm).astype(np.float32)
        y, h = selective_scan(*map(jnp.asarray, (x, delta, A, B, C, D)))
        y_ref, h_ref = _ref_sequential(x, delta, A, B, C, D)
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(h), h_ref, atol=1e-4, rtol=1e-3)

    def test_carried_state(self):
        """scan(x[0:5]) then scan(x[5:]) with h0 == scan(x) end-to-end."""
        rng = np.random.default_rng(1)
        Bsz, S, Dm, N = 1, 8, 3, 2
        x = rng.standard_normal((Bsz, S, Dm)).astype(np.float32)
        delta = np.abs(rng.standard_normal((Bsz, S, Dm))).astype(np.float32) * 0.1
        A = -np.abs(rng.standard_normal((Dm, N))).astype(np.float32)
        B = rng.standard_normal((Bsz, S, N)).astype(np.float32)
        C = rng.standard_normal((Bsz, S, N)).astype(np.float32)
        y_full, h_full = selective_scan(*map(jnp.asarray, (x, delta, A, B, C)))
        y1, h1 = selective_scan(
            *map(jnp.asarray, (x[:, :5], delta[:, :5], A, B[:, :5], C[:, :5]))
        )
        y2, h2 = selective_scan(
            jnp.asarray(x[:, 5:]), jnp.asarray(delta[:, 5:]), jnp.asarray(A),
            jnp.asarray(B[:, 5:]), jnp.asarray(C[:, 5:]), h0=h1,
        )
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate([y1, y2], 1)), np.asarray(y_full),
            atol=1e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(np.asarray(h2), np.asarray(h_full),
                                   atol=1e-4, rtol=1e-3)

    def test_decode_step_matches_scan(self):
        """prefill scan then ssm_update == scan over S+1."""
        rng = np.random.default_rng(2)
        Bsz, S, Dm, N = 1, 6, 3, 2
        x = rng.standard_normal((Bsz, S + 1, Dm)).astype(np.float32)
        delta = np.abs(rng.standard_normal((Bsz, S + 1, Dm))).astype(np.float32) * 0.1
        A = -np.abs(rng.standard_normal((Dm, N))).astype(np.float32)
        B = rng.standard_normal((Bsz, S + 1, N)).astype(np.float32)
        C = rng.standard_normal((Bsz, S + 1, N)).astype(np.float32)
        y_full, h_full = selective_scan(*map(jnp.asarray, (x, delta, A, B, C)))
        _, h_prefill = selective_scan(
            *map(jnp.asarray, (x[:, :S], delta[:, :S], A, B[:, :S], C[:, :S]))
        )
        y_step, h_step = ssm_update(
            jnp.asarray(x[:, S]), jnp.asarray(delta[:, S]), jnp.asarray(A),
            jnp.asarray(B[:, S]), jnp.asarray(C[:, S]), h_prefill,
        )
        np.testing.assert_allclose(
            np.asarray(y_step), np.asarray(y_full[:, S]), atol=1e-4, rtol=1e-3
        )
        np.testing.assert_allclose(np.asarray(h_step), np.asarray(h_full),
                                   atol=1e-4, rtol=1e-3)


class TestGatedDelta:
    def test_memory_readout(self):
        """After writing (k, v) with beta=1, g=1, querying with k reads ~v."""
        Bsz, H, Dk, Dv = 1, 2, 4, 3
        k = jnp.zeros((Bsz, H, Dk)).at[:, :, 0].set(1.0)
        v = jnp.ones((Bsz, H, Dv)) * 2.0
        state = jnp.zeros((Bsz, H, Dk, Dv))
        y, state = gated_delta_update(
            k, v, k, jnp.ones((Bsz, H)), jnp.ones((Bsz, H)), state
        )
        np.testing.assert_allclose(np.asarray(y), 2.0, atol=1e-6)
        # decay gate shrinks the memory
        y2, _ = gated_delta_update(
            k, jnp.zeros_like(v), k, jnp.full((Bsz, H), 0.5),
            jnp.zeros((Bsz, H)), state,
        )
        np.testing.assert_allclose(np.asarray(y2), 1.0, atol=1e-6)
