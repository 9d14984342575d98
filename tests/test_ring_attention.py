import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.core.mask import causal_cache_mask
from mlx_vlm_tpu.ops.attention import sdpa

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_8
class TestRingAttention:
    def _setup(self, B=1, H=2, S=64, D=16, seed=0):
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))
        return q, k, v

    def test_matches_full_attention_causal(self):
        from jax.sharding import Mesh
        from mlx_vlm_tpu.ops.ring_attention import make_ring_attention

        q, k, v = self._setup()
        B, H, S, D = q.shape
        scale = D**-0.5
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
        ring = make_ring_attention(mesh, "sp", causal=True)
        out = ring(q, k, v, scale)

        offset = jnp.asarray(0, jnp.int32)
        mask = causal_cache_mask(offset, jnp.zeros((B,), jnp.int32), S, S)
        ref = sdpa(q, k, v, scale, mask)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_non_causal(self):
        from jax.sharding import Mesh
        from mlx_vlm_tpu.ops.ring_attention import make_ring_attention

        q, k, v = self._setup(seed=1)
        D = q.shape[-1]
        scale = D**-0.5
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
        ring = make_ring_attention(mesh, "sp", causal=False)
        out = ring(q, k, v, scale)
        ref = sdpa(q, k, v, scale, None)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_output_sharding(self):
        from jax.sharding import Mesh
        from mlx_vlm_tpu.ops.ring_attention import make_ring_attention

        q, k, v = self._setup(seed=2)
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
        ring = make_ring_attention(mesh, "sp")
        out = ring(q, k, v, q.shape[-1] ** -0.5)
        assert "sp" in str(out.sharding.spec)
