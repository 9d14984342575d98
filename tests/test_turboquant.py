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


class TestRotatedInt4Fused:
    """TurboQuant rotation + fused packed-domain int4 attend
    (RotatedInt4KVCache): the orthogonal-rotation identity must keep
    decode exact vs attending in the unrotated domain with the same
    quantizer, and close to bf16 attention."""

    def _setup(self, B=1, H=2, D=64, C=32, S=5):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((B, 2 * H, 1, D)) * 0.5,
                        jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.5, jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.5, jnp.float32)
        return q, k, v

    def test_matches_bf16_attention(self):
        from mlx_vlm_tpu.core.turboquant import make_rotated_int4_cache
        from mlx_vlm_tpu.core import cache as cache_lib

        B, H, D, C, S = 1, 2, 64, 32, 5
        q, k, v = self._setup(B, H, D, C, S)
        cache = make_rotated_int4_cache(1, B, H, D, C)
        # prefill S tokens (XLA path), then attend is queried at S==...
        import dataclasses

        mask = jnp.ones((B, 1, 1, C), bool) & (
            jnp.arange(C)[None, None, None, :] < S)
        # write S-1 history tokens, then decode token S-1
        chist = cache
        arrs = chist.scan_arrays()
        layer0 = tuple(a[0] for a in arrs)
        out_q = None
        for t in range(S):
            chist = dataclasses.replace(chist, offset=jnp.asarray(t))
            m = jnp.arange(C)[None, None, None, :] <= t
            out_q, layer0 = chist.attend(
                layer0, q, k[:, :, t:t + 1], v[:, :, t:t + 1], D**-0.5, m)
        ref_cache = cache_lib.init_cache(1, B, H, D, C, jnp.float32)
        rarr = tuple(a[0] for a in ref_cache.scan_arrays())
        out_ref = None
        for t in range(S):
            rc = dataclasses.replace(ref_cache, offset=jnp.asarray(t))
            m = jnp.arange(C)[None, None, None, :] <= t
            out_ref, rarr = rc.attend(rarr, q, k[:, :, t:t + 1],
                                      v[:, :, t:t + 1], D**-0.5, m,
                                      flash_ok=False)
        err = np.abs(np.asarray(out_q) - np.asarray(out_ref)).max()
        assert err < 0.06, err

    def test_rotation_beats_plain_int4_on_outliers(self):
        """A spiky (outlier-heavy) KV distribution: the rotated codec's
        reconstruction must beat plain per-token affine int4."""
        from mlx_vlm_tpu.core.turboquant import (_rotate, _signs,
                                                 hadamard_transform)
        from mlx_vlm_tpu.core.cache import Int4KVCache

        rng = np.random.default_rng(1)
        D = 64
        x = rng.standard_normal((1, 2, 16, D)).astype(np.float32) * 0.1
        x[..., 0] += 8.0  # a huge outlier channel
        xj = jnp.asarray(x)
        signs = _signs(D)

        def roundtrip(y):
            p, s, b = Int4KVCache._quantize_tokens(y)
            lo = (p & 0xF).astype(jnp.float32)
            hi = (p >> 4).astype(jnp.float32)
            q = jnp.concatenate([lo, hi], axis=-1)
            return q * s[..., None] + b[..., None]

        plain_err = float(jnp.mean((roundtrip(xj) - xj) ** 2))
        xr = _rotate(xj, signs)
        rec = hadamard_transform(roundtrip(xr).astype(jnp.float32)) * signs
        rot_err = float(jnp.mean((rec - xj) ** 2))
        assert rot_err < plain_err * 0.25, (rot_err, plain_err)

    def test_make_cache_routes_turboquant4(self):
        from mlx_vlm_tpu.generate.ar import make_cache
        from mlx_vlm_tpu.utils.loader import load_model_from_weights
        from mlx_vlm_tpu.utils.testing import (qwen2_vl_hf_weights,
                                               tiny_qwen2_vl_config)
        import os

        cfg = tiny_qwen2_vl_config()
        model = load_model_from_weights(
            cfg, qwen2_vl_hf_weights(cfg, seed=0), jnp.float32)
        os.environ["MLX_VLM_TPU_KV_SCHEME"] = "turboquant"
        try:
            c = make_cache(model, 1, 64, jnp.float32, kv_bits=4)
        finally:
            del os.environ["MLX_VLM_TPU_KV_SCHEME"]
        assert type(c).__name__ == "_RotatedInt4"


class TestFractionalFusedDecode:
    """Fused packed-domain decode for fractional codes
    (ops/tq_kv_attention.py): --kv-bits 3.5 etc. must no longer
    whole-cache-dequantize (reference turboquant.py fused decode :2021)."""

    def _run(self, fused: bool, kv_bits=3.5, B=1, H=2, G=2, D=128, C=128,
             S=6, seed=0):
        import dataclasses
        import os

        from mlx_vlm_tpu.core.turboquant import init_turboquant_cache

        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.standard_normal((B, G * H, 1, D)) * 0.5,
                        jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.5,
                        jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.5,
                        jnp.float32)
        cache = init_turboquant_cache(1, B, H, D, C, kv_bits=kv_bits)
        arrs = tuple(a[0] for a in cache.scan_arrays())
        os.environ["MLX_VLM_TPU_TQ_FUSED"] = "1" if fused else "0"
        try:
            out = None
            for t in range(S):
                c = dataclasses.replace(cache, offset=jnp.asarray(t))
                m = jnp.arange(C)[None, None, None, :] <= t
                out, arrs = c.attend(arrs, q, k[:, :, t:t + 1],
                                     v[:, :, t:t + 1], D**-0.5, m)
        finally:
            del os.environ["MLX_VLM_TPU_TQ_FUSED"]
        return np.asarray(out)

    @pytest.mark.parametrize("kv_bits", [3.5, 3.0, 5.0, 6.0])
    def test_fused_matches_dequant_path(self, kv_bits):
        fused = self._run(True, kv_bits=kv_bits)
        ref = self._run(False, kv_bits=kv_bits)
        err = np.abs(fused - ref).max()
        assert err < 0.06, (kv_bits, err)

    def test_fused_is_default_decode_route(self, monkeypatch):
        """S==1 decode with pow-2 dims must take the kernel (guarded by
        a probe on the kernel entry)."""
        import mlx_vlm_tpu.ops.tq_kv_attention as tqk

        calls = []
        orig = tqk.tq_kv_decode_attention

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(tqk, "tq_kv_decode_attention", spy)
        self._run(True)
        assert calls, "fused kernel was not used for S==1 decode"

    def test_nonpow2_head_dim_pads(self):
        """head_dim 96 rotates in a 128 slot; fused path must stay exact
        vs the dequant path."""
        fused = self._run(True, D=96, seed=3)
        ref = self._run(False, D=96, seed=3)
        assert np.abs(fused - ref).max() < 0.06


class TestOutlierSplitCodec:
    """Per-channel mixed-precision split codec (reference
    turboquant._SplitCodec:4832 / _select_outlier_indices:4810)."""

    def _cache(self, kv_bits=3.5, B=1, H=2, D=128, C=128):
        from mlx_vlm_tpu.core.turboquant import init_turboquant_split_cache

        return init_turboquant_split_cache(1, B, H, D, C, kv_bits=kv_bits)

    def test_split_geometry(self):
        c = self._cache(3.5, D=128)
        assert c.lo_bits == 3 and c.hi_bits == 4
        assert c.d_hi == 64  # half the rotated dims at the high width
        # packed widths: 64 dims * 3 bits / 8 and 64 * 4 / 8
        assert c.kqa.shape[-1] == 24 and c.kqb.shape[-1] == 32

    def test_roundtrip_beats_uniform_low(self):
        """split(3.5) reconstruction must beat uniform 3-bit."""
        from mlx_vlm_tpu.core.turboquant import (_pow2, _signs, tq_decode,
                                                 tq_encode, tq_encode_split,
                                                 tq_decode_split)

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, 2, 16, 128)), jnp.float32)
        signs = _signs(_pow2(128))
        pa, sa, pb, sb = tq_encode_split(x, 3, 4, 64, signs)
        rec = tq_decode_split(pa, sa, pb, sb, 3, 4, signs, 128)
        err_split = float(jnp.mean((rec - x) ** 2))
        p3, s3 = tq_encode(x, 3, signs)
        rec3 = tq_decode(p3, s3, 3, signs)[..., :128]
        err_u3 = float(jnp.mean((rec3 - x) ** 2))
        assert err_split < err_u3, (err_split, err_u3)
        assert err_split < 0.025

    def _run(self, fused: bool, kv_bits=3.5, B=1, H=2, G=2, D=128, C=128,
             S=6, seed=0):
        import dataclasses
        import os

        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.standard_normal((B, G * H, 1, D)) * 0.5,
                        jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.5,
                        jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.5,
                        jnp.float32)
        cache = self._cache(kv_bits, B=B, H=H, D=D, C=C)
        arrs = tuple(a[0] for a in cache.scan_arrays())
        os.environ["MLX_VLM_TPU_TQ_FUSED"] = "1" if fused else "0"
        try:
            out = None
            for t in range(S):
                c = dataclasses.replace(cache, offset=jnp.asarray(t))
                m = jnp.arange(C)[None, None, None, :] <= t
                out, arrs = c.attend(arrs, q, k[:, :, t:t + 1],
                                     v[:, :, t:t + 1], D**-0.5, m)
        finally:
            del os.environ["MLX_VLM_TPU_TQ_FUSED"]
        return np.asarray(out)

    @pytest.mark.parametrize("kv_bits", [3.5, 4.5])
    def test_fused_matches_dequant(self, kv_bits):
        fused = self._run(True, kv_bits=kv_bits)
        ref = self._run(False, kv_bits=kv_bits)
        assert np.abs(fused - ref).max() < 0.06

    def test_make_cache_env_routing(self, monkeypatch):
        from mlx_vlm_tpu.core.turboquant import SplitTurboQuantKVCache
        from mlx_vlm_tpu.generate.ar import make_cache
        from mlx_vlm_tpu.utils.testing import make_tiny_qwen2_vl

        model = make_tiny_qwen2_vl(seed=1)
        monkeypatch.setenv("MLX_VLM_TPU_TQ_SCHEME", "split")
        c = make_cache(model, 1, 128, jnp.float32, kv_bits=3.5)
        assert isinstance(c, SplitTurboQuantKVCache)
