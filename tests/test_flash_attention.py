import numpy as np
import pytest

import jax.numpy as jnp

from mlx_vlm_tpu.core.mask import causal_cache_mask
from mlx_vlm_tpu.ops.attention import sdpa
from mlx_vlm_tpu.ops.flash_attention import flash_attention


def _setup(B=2, H=4, KVH=2, S=16, C=32, D=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, KVH, C, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, KVH, C, D)).astype(np.float32))
    return q, k, v


class TestFlashAttention:
    def test_matches_xla_sdpa(self):
        q, k, v = _setup()
        B, H, S, D = q.shape
        offset = jnp.asarray([10, 5], jnp.int32)
        left_pad = jnp.asarray([0, 2], jnp.int32)
        scale = D**-0.5
        mask = causal_cache_mask(offset, left_pad, S, k.shape[2])
        ref = sdpa(q, k, v, scale, mask)
        out = flash_attention(q, k, v, offset, left_pad, scale, q_tile=16,
                              interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_window(self):
        q, k, v = _setup(seed=1)
        B, H, S, D = q.shape
        offset = jnp.asarray([12, 12], jnp.int32)
        left_pad = jnp.zeros((B,), jnp.int32)
        scale = D**-0.5
        mask = causal_cache_mask(offset, left_pad, S, k.shape[2], window=6)
        ref = sdpa(q, k, v, scale, mask)
        out = flash_attention(q, k, v, offset, left_pad, scale, q_tile=16,
                              window=6, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_multi_tile(self):
        q, k, v = _setup(B=1, H=2, KVH=1, S=32, C=64, D=16, seed=2)
        offset = jnp.asarray([20], jnp.int32)
        left_pad = jnp.zeros((1,), jnp.int32)
        scale = 16**-0.5
        mask = causal_cache_mask(offset, left_pad, 32, 64)
        ref = sdpa(q, k, v, scale, mask)
        out = flash_attention(q, k, v, offset, left_pad, scale, q_tile=8,
                              interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )


class TestFlashV2Tiling:
    def test_multi_kv_tile_online_softmax(self):
        """Accumulation across KV tiles (v2) matches single-pass XLA."""
        rng = np.random.default_rng(7)
        B, H, KVH, S, C, D = 2, 4, 2, 32, 512, 32
        q = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, KVH, C, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, KVH, C, D)).astype(np.float32))
        offset = jnp.asarray([300, 41], jnp.int32)
        left_pad = jnp.asarray([0, 3], jnp.int32)
        scale = D**-0.5
        mask = causal_cache_mask(offset, left_pad, S, C)
        ref = sdpa(q, k, v, scale, mask)
        out = flash_attention(q, k, v, offset, left_pad, scale, q_tile=16,
                              kv_tile=128, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_multi_kv_tile_window(self):
        rng = np.random.default_rng(8)
        B, H, KVH, S, C, D = 1, 2, 1, 16, 384, 32
        q = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, KVH, C, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, KVH, C, D)).astype(np.float32))
        offset = jnp.asarray([200], jnp.int32)
        left_pad = jnp.asarray([0], jnp.int32)
        scale = D**-0.5
        mask = causal_cache_mask(offset, left_pad, S, C, window=64)
        ref = sdpa(q, k, v, scale, mask)
        out = flash_attention(q, k, v, offset, left_pad, scale, q_tile=16,
                              kv_tile=128, window=64, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )
