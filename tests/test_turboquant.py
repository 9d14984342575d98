"""TurboQuant KV codec: rotation, codebook round-trip, cache generation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.core.turboquant import (
    TurboQuantKVCache, _signs, hadamard_transform, init_turboquant_cache,
    tq_decode, tq_encode,
)


class TestHadamard:
    def test_self_inverse_and_orthogonal(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((3, 5, 16)), jnp.float32)
        y = hadamard_transform(hadamard_transform(x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)
        # norm preserving
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(hadamard_transform(x)), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5,
        )


class TestCodec:
    @pytest.mark.parametrize("bits", [2, 3, 4])
    def test_roundtrip_error_bounded(self, bits):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((4, 8, 64)), jnp.float32)
        signs = _signs(64)
        codes, scale = tq_encode(x, bits, signs)
        y = tq_decode(codes, scale, bits, signs)
        err = np.sqrt(np.mean((np.asarray(y) - np.asarray(x)) ** 2))
        # Lloyd–Max Gaussian distortion: ~0.36 (2b), ~0.19 (3b), ~0.10 (4b)
        assert err < {2: 0.45, 3: 0.25, 4: 0.14}[bits]

    def test_rotation_tames_outliers(self):
        """With a huge single-channel outlier, the rotated codebook beats
        plain affine per-vector quantization at 4 bits."""
        from mlx_vlm_tpu.core.quant import dequantize, quantize

        rng = np.random.default_rng(2)
        x = rng.standard_normal((64, 64)).astype(np.float32)
        x[:, 7] *= 50.0  # outlier channel (rotation spreads it out)
        signs = _signs(64)
        codes, scale = tq_encode(jnp.asarray(x), 4, signs)
        tq = np.asarray(tq_decode(codes, scale, 4, signs))
        affine = np.asarray(dequantize(quantize(jnp.asarray(x), 4, 64)))
        err_tq = np.mean((tq - x) ** 2)
        err_affine = np.mean((affine - x) ** 2)
        assert err_tq < err_affine

    def test_packing_width(self):
        x = jnp.ones((2, 16))
        c4, _ = tq_encode(x, 4, _signs(16))
        assert c4.shape[-1] == 8  # 4 bits/code
        c3, _ = tq_encode(x, 3, _signs(16))
        assert c3.shape[-1] == 6  # 3 bits/code, bit-plane packed
        c5, _ = tq_encode(x, 5, _signs(16))
        assert c5.shape[-1] == 10
        c6, _ = tq_encode(x, 6, _signs(16))
        assert c6.shape[-1] == 12

    @pytest.mark.parametrize("bits", [1, 2, 3, 4, 5, 6, 7, 8])
    def test_pack_unpack_exact(self, bits):
        from mlx_vlm_tpu.core.turboquant import pack_codes, unpack_codes

        rng = np.random.default_rng(bits)
        codes = jnp.asarray(
            rng.integers(0, 1 << bits, size=(3, 5, 64)), jnp.uint8)
        packed = pack_codes(codes, bits)
        assert packed.shape[-1] == 64 * bits // 8
        np.testing.assert_array_equal(np.asarray(unpack_codes(packed, bits)),
                                      np.asarray(codes))

    @pytest.mark.parametrize("bits", [5, 6])
    def test_roundtrip_high_bits(self, bits):
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((4, 8, 64)), jnp.float32)
        signs = _signs(64)
        codes, scale = tq_encode(x, bits, signs)
        y = tq_decode(codes, scale, bits, signs)
        err = np.sqrt(np.mean((np.asarray(y) - np.asarray(x)) ** 2))
        # Lloyd–Max Gaussian distortion ~0.050 (5b), ~0.026 (6b)
        assert err < {5: 0.07, 6: 0.04}[bits]

    def test_kv_hbm_bytes_match_bits(self):
        """-76% KV memory headline: packed cache bytes ≈ bits/8 of bf16."""
        from mlx_vlm_tpu.core.turboquant import init_turboquant_cache

        L, B, H, C, D = 2, 1, 4, 128, 64
        cache = init_turboquant_cache(L, B, H, D, C, kv_bits=3.5)
        packed_bytes = (cache.kq.size + cache.vq.size
                        + 4 * (cache.kscale.size + cache.vscale.size))
        bf16_bytes = 2 * (L * B * H * C * D) * 2  # K and V at 2 bytes
        # 3-bit K + 4-bit V + f32 scale/vector = (3+4)/2/16 + 4/64 of bf16
        assert packed_bytes / bf16_bytes < 0.29


class TestCacheGeneration:
    def test_prefill_logits_close_to_fp(self):
        from mlx_vlm_tpu.generate.ar import generate_step, make_cache
        from mlx_vlm_tpu.utils.testing import make_tiny_qwen2_vl

        model = make_tiny_qwen2_vl(seed=4, dtype=jnp.float32)
        S = 10
        ids = (np.arange(S, dtype=np.int32) * 7 % 200)[None]
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids))
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S)).copy()
        fp_cache = make_cache(model, 1, 32, jnp.float32)
        lf, _ = model(model.params, embeds, fp_cache, jnp.asarray(pos))
        tq_cache = make_cache(model, 1, 32, jnp.float32, kv_bits=3.5)
        lq, _ = model(model.params, embeds, tq_cache, jnp.asarray(pos))
        pf = jax.nn.softmax(lf[0, -1])
        pq = jax.nn.softmax(lq[0, -1])
        # 3-bit K / 4-bit V keeps the next-token distribution close
        assert float(jnp.abs(pf - pq).max()) < 0.05
        # greedy generation still runs end to end with the quantized cache
        toks = [int(t[0]) for t, _ in generate_step(embeds, model,
                                                    max_tokens=4,
                                                    kv_bits=3.5)]
        assert len(toks) == 4

    def test_fractional_bits_layout(self):
        from mlx_vlm_tpu.utils.testing import make_tiny_qwen2_vl
        from mlx_vlm_tpu.generate.ar import make_cache

        model = make_tiny_qwen2_vl(seed=4, dtype=jnp.float32)
        cache = make_cache(model, 1, 32, jnp.float32, kv_bits=3.5)
        assert isinstance(cache, TurboQuantKVCache)
        assert cache.k_bits == 3 and cache.v_bits == 4
        assert cache.vq.shape[-1] == cache.head_dim // 2  # packed 4-bit
