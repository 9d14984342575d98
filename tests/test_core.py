import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.core import cache as cache_lib
from mlx_vlm_tpu.core.mask import causal_cache_mask, segment_mask
from mlx_vlm_tpu.core.quant import dequantize, quantize, quantized_matmul
from mlx_vlm_tpu.core.rope import (
    Rope,
    apply_rope,
    mrope_cos_sin,
    mrope_section_map,
    rope_cos_sin,
)
from mlx_vlm_tpu.core.sampling import make_logits_processors, make_sampler


class TestQuant:
    @pytest.mark.parametrize("bits", [1, 2, 4, 8])
    def test_roundtrip(self, bits):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((32, 128)).astype(np.float32))
        t = quantize(w, bits=bits, group_size=32)
        wd = dequantize(t)
        err = jnp.abs(wd - w).max()
        # max group range ~8 sigma / (2^bits - 1)
        bound = 8.0 / (2**bits - 1)
        assert err < bound, f"{err} vs {bound}"
        assert t.shape == w.shape
        assert t.q.shape[-1] == w.shape[-1] * bits // 8

    def test_one_bit_linear(self):
        """1-bit weights flow through linear() (OneBitLinear parity,
        reference quantization/one_bit.py:362)."""
        from mlx_vlm_tpu.core.layers import linear

        rng = np.random.default_rng(3)
        w = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
        t = quantize(w, bits=1, group_size=32)
        y = linear({"weight": t}, x)
        y_ref = x @ dequantize(t).T
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    def test_quantized_matmul(self):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.standard_normal((16, 64)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
        t = quantize(w, bits=8, group_size=32)
        y = quantized_matmul(x, t)
        y_ref = x @ dequantize(t).T
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    def test_stacked_quantize(self):
        w = jnp.asarray(np.random.default_rng(2).standard_normal((3, 8, 64)), jnp.float32)
        t = quantize(w, bits=4, group_size=32)
        assert t.shape == (3, 8, 64)
        assert dequantize(t).shape == (3, 8, 64)


class TestRope:
    def test_mrope_matches_chunked_reference(self):
        """Gathered M-RoPE == manual per-section split/concat (reference
        rope_utils.py chunked style)."""
        sections = [2, 3, 3]
        dim = 16  # head dim; freqs = 8
        inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2) / dim))
        pos = np.random.default_rng(0).integers(0, 100, size=(3, 2, 5))
        cos, sin = mrope_cos_sin(
            jnp.asarray(pos), jnp.asarray(inv, jnp.float32),
            jnp.asarray(mrope_section_map(sections)),
        )
        # manual reference: compute cos for each stream then concat chunks
        angles = pos[..., None] * inv[None, None, None, :]  # [3,B,S,8]
        cos_ref = np.cos(angles)
        chunks = []
        start = 0
        for i, s in enumerate(sections):
            chunks.append(cos_ref[i, :, :, start : start + s])
            start += s
        cos_manual = np.concatenate(chunks, axis=-1)
        np.testing.assert_allclose(np.asarray(cos), cos_manual, rtol=1e-5)

    def test_apply_rope_rotates(self):
        B, H, S, D = 1, 2, 4, 8
        q = jnp.ones((B, H, S, D), jnp.float32)
        k = jnp.ones((B, H, S, D), jnp.float32)
        pos = jnp.arange(S)[None].astype(jnp.int32)
        rope = Rope(D, 10000.0)
        cos, sin = rope.cos_sin(pos)
        q2, k2 = apply_rope(q, k, cos, sin)
        assert q2.shape == q.shape
        # position 0 is identity
        np.testing.assert_allclose(np.asarray(q2[:, :, 0]), np.asarray(q[:, :, 0]), atol=1e-6)
        assert not np.allclose(np.asarray(q2[:, :, 1]), np.asarray(q[:, :, 1]))


class TestMask:
    def test_causal_cache_mask(self):
        m = causal_cache_mask(jnp.asarray(2, jnp.int32), jnp.zeros(1, jnp.int32), 3, 8)
        m = np.asarray(m)[0, 0]
        # query i attends to j <= 2 + i
        for i in range(3):
            for j in range(8):
                assert m[i, j] == (j <= 2 + i)

    def test_left_pad(self):
        m = causal_cache_mask(
            jnp.asarray(4, jnp.int32), jnp.asarray([2, 0], jnp.int32), 1, 8
        )
        m = np.asarray(m)
        assert not m[0, 0, 0, 0] and not m[0, 0, 0, 1]
        assert m[0, 0, 0, 2] and m[1, 0, 0, 0]

    def test_segment_mask(self):
        m = np.asarray(segment_mask(jnp.asarray([0, 0, 1, 1, 1])))[0, 0]
        assert m[0, 1] and not m[0, 2] and m[2, 4]

    def test_window(self):
        m = causal_cache_mask(
            jnp.asarray(5, jnp.int32), jnp.zeros(1, jnp.int32), 1, 8, window=3
        )
        m = np.asarray(m)[0, 0, 0]
        assert list(np.nonzero(m)[0]) == [3, 4, 5]


class TestCache:
    def test_update_and_mask_consistency(self):
        c = cache_lib.init_cache(2, 1, 1, 4, 8, jnp.float32)
        k = jnp.ones((1, 1, 3, 4))
        k2, v2 = cache_lib.update_layer(c.k[0], c.v[0], k, k, c.offset)
        assert np.asarray(k2)[0, 0, 2, 0] == 1.0
        assert np.asarray(k2)[0, 0, 3, 0] == 0.0
        # write more at offset 3
        k3, _ = cache_lib.update_layer(k2, v2, 2 * k[:, :, :1], k[:, :, :1], jnp.asarray(3))
        assert np.asarray(k3)[0, 0, 3, 0] == 2.0


class TestSampling:
    def test_greedy(self):
        s = make_sampler(temp=0.0)
        logits = jnp.asarray([[0.1, 2.0, -1.0]])
        assert int(s(logits, jax.random.PRNGKey(0))[0]) == 1

    def test_top_k(self):
        s = make_sampler(temp=1.0, top_k=2)
        logits = jnp.asarray([[10.0, 5.0, -100.0, 4.9]])
        toks = [int(s(logits, jax.random.PRNGKey(i))[0]) for i in range(50)]
        assert set(toks) <= {0, 1}

    def test_top_p(self):
        s = make_sampler(temp=1.0, top_p=0.5)
        logits = jnp.asarray([[10.0, 1.0, 1.0, 1.0]])
        toks = [int(s(logits, jax.random.PRNGKey(i))[0]) for i in range(30)]
        assert set(toks) == {0}

    def test_min_p(self):
        s = make_sampler(temp=1.0, min_p=0.5)
        logits = jnp.asarray([[5.0, 4.9, -10.0, -10.0]])
        toks = [int(s(logits, jax.random.PRNGKey(i))[0]) for i in range(50)]
        assert set(toks) <= {0, 1}

    def test_repetition_penalty(self):
        procs = make_logits_processors(repetition_penalty=2.0)
        history = jnp.asarray([[1, 2, -1, -1]], jnp.int32)
        logits = jnp.asarray([[1.0, 1.0, -1.0, 1.0]])
        out = np.asarray(procs[0](history, logits))
        assert out[0, 1] == pytest.approx(0.5)  # positive: divided
        assert out[0, 2] == pytest.approx(-2.0)  # negative: multiplied
        assert out[0, 0] == pytest.approx(1.0)  # untouched
        assert out[0, 3] == pytest.approx(1.0)

    def test_logit_bias(self):
        procs = make_logits_processors(logit_bias={2: 5.0})
        logits = jnp.zeros((1, 4))
        out = np.asarray(procs[0](jnp.zeros((1, 1), jnp.int32), logits))
        assert out[0, 2] == 5.0


class TestRotatingKVCache:
    def test_ring_matches_full_cache_sliding_attention(self):
        """Ring cache attention == full cache with a window mask, even after
        the ring wraps."""
        import jax
        import jax.numpy as jnp

        from mlx_vlm_tpu.core.cache import init_cache, init_rotating_cache
        from mlx_vlm_tpu.core.mask import causal_cache_mask
        from mlx_vlm_tpu.ops.attention import sdpa

        rng = np.random.default_rng(0)
        B, H, D, W = 1, 2, 8, 4
        total = 20  # >> ring capacity (4 + margin 8 = 12) -> wraps
        ring = init_rotating_cache(1, B, H, D, W, jnp.float32, chunk_margin=8)
        full = init_cache(1, B, H, D, 32, jnp.float32)
        ring_cx = tuple(a[0] for a in ring.scan_arrays())
        full_cx = (full.k[0], full.v[0])
        outs_r, outs_f = [], []
        import dataclasses as dc

        for chunk in ([6, 5, 1, 1, 3, 4]):
            q = jnp.asarray(rng.standard_normal((B, H, chunk, D)), jnp.float32)
            k = jnp.asarray(rng.standard_normal((B, H, chunk, D)), jnp.float32)
            v = jnp.asarray(rng.standard_normal((B, H, chunk, D)), jnp.float32)
            o_r, ring_cx = ring.attend(ring_cx, q, k, v, D**-0.5)
            mask = causal_cache_mask(full.offset, full.left_pad, chunk, 32,
                                     window=W)
            o_f, full_cx = full.attend(full_cx, q, k, v, D**-0.5, mask,
                                       flash_ok=False)
            outs_r.append(np.asarray(o_r))
            outs_f.append(np.asarray(o_f))
            ring = dc.replace(ring, offset=ring.offset + chunk)
            full = dc.replace(full, offset=full.offset + chunk)
        for a, b in zip(outs_r, outs_f):
            np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)

    def test_memory_is_window_bound(self):
        import jax.numpy as jnp

        from mlx_vlm_tpu.core.cache import init_rotating_cache

        c = init_rotating_cache(2, 1, 4, 16, 1024, jnp.bfloat16,
                                chunk_margin=256)
        assert c.capacity == 1280  # window + margin, independent of context


class TestInt8KVCache:
    def _setup(self, C=32, seed=0):
        rng = np.random.default_rng(seed)
        B, H, KVH, S, D = 1, 4, 2, 6, 16
        q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, KVH, S, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, KVH, S, D)), jnp.float32)
        return q, k, v

    def test_matches_bf16_attend_within_quant_noise(self):
        from mlx_vlm_tpu.core import cache as cache_lib
        from mlx_vlm_tpu.core.mask import causal_cache_mask

        q, k, v = self._setup()
        B, H, S, D = q.shape
        C = 32
        mask = causal_cache_mask(
            jnp.zeros((), jnp.int32), jnp.zeros((B,), jnp.int32), S, C
        )
        full = cache_lib.init_cache(1, B, 2, D, C, jnp.float32)
        ref, _ = full.attend((full.k[0], full.v[0]), q, k, v, D**-0.5, mask)
        q8c = cache_lib.init_int8_cache(1, B, 2, D, C)
        out, _ = q8c.attend(
            tuple(a[0] for a in q8c.scan_arrays()), q, k, v, D**-0.5, mask
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=0.02, rtol=0.05
        )

    def test_decode_continuation(self):
        """Prefill then decode steps through the int8 cache track the bf16
        cache closely."""
        from mlx_vlm_tpu.core import cache as cache_lib
        from mlx_vlm_tpu.core.mask import causal_cache_mask

        rng = np.random.default_rng(1)
        B, KVH, H, D, C = 1, 2, 4, 16, 32
        full = cache_lib.init_cache(1, B, KVH, D, C, jnp.float32)
        q8c = cache_lib.init_int8_cache(1, B, KVH, D, C)
        fx = (full.k[0], full.v[0])
        qx = tuple(a[0] for a in q8c.scan_arrays())
        import dataclasses as dc

        for step, S in enumerate((4, 1, 1, 1)):
            q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
            k = jnp.asarray(rng.standard_normal((B, KVH, S, D)), jnp.float32)
            v = jnp.asarray(rng.standard_normal((B, KVH, S, D)), jnp.float32)
            mask = causal_cache_mask(full.offset, full.left_pad, S, C)
            ref, fx = full.attend(fx, q, k, v, D**-0.5, mask)
            out, qx = q8c.attend(qx, q, k, v, D**-0.5, mask)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=0.03, rtol=0.08,
                err_msg=f"step {step}",
            )
            full = dc.replace(full, offset=full.offset + S)
            q8c = dc.replace(q8c, offset=q8c.offset + S)

    def test_generate_step_kv8_greedy_matches(self):
        from mlx_vlm_tpu.core import cache as cache_lib
        from mlx_vlm_tpu.generate.ar import generate_step, make_cache
        from mlx_vlm_tpu.utils.testing import make_tiny_qwen2_vl

        model = make_tiny_qwen2_vl(seed=2, dtype=jnp.float32)
        c = make_cache(model, 1, 256, jnp.float32, kv_bits=8)
        assert isinstance(c, cache_lib.Int8KVCache)
        ids = (np.arange(10, dtype=np.int32) % 200)[None]
        embeds = model.language_model.embed(
            model.params["language_model"], jnp.asarray(ids)
        )
        ref = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=5)]
        out = [
            int(t[0])
            for t, _ in generate_step(embeds, model, max_tokens=5, kv_bits=8)
        ]
        assert out == ref
