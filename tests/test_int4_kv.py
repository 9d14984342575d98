"""Fused packed-domain 4-bit KV cache (Int4KVCache + Pallas decode attend).

Reference parity: turboquant.py fully-fused 4-bit decode (:2021) — the
4-bit cache must halve stored/read KV bytes while matching the
integer-domain math of the XLA fallback.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.core import cache as cache_lib


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


class TestInt4KVCache:
    def test_storage_is_half_of_int8(self):
        c4 = cache_lib.init_int4_cache(2, 1, 2, 64, 128)
        c8 = cache_lib.init_int8_cache(2, 1, 2, 64, 128)
        assert c4.k4.nbytes * 2 == c8.k8.nbytes

    def test_quantize_roundtrip(self):
        rng = np.random.default_rng(0)
        x = _rand(rng, 1, 2, 4, 32)
        packed, s, b = cache_lib.Int4KVCache._quantize_tokens(x)
        codes = cache_lib.Int4KVCache._unpack(packed).astype(jnp.float32)
        deq = codes * s[..., None] + b[..., None]
        err = np.abs(np.asarray(deq) - np.asarray(x)).max()
        rng_span = float(np.asarray(x).max() - np.asarray(x).min())
        assert err <= rng_span / 15.0 + 1e-6

    def _attend_setup(self, rng, B=1, nkv=1, g=4, D=256, C=256, off=37):
        L = 1
        cache = cache_lib.init_int4_cache(L, B, nkv, D, C)
        # pre-populate `off` history tokens through the quantizer
        hist_k = _rand(rng, B, nkv, off, D)
        hist_v = _rand(rng, B, nkv, off, D)
        k4, ks, kb = cache_lib.Int4KVCache._quantize_tokens(hist_k)
        v4, vs, vb = cache_lib.Int4KVCache._quantize_tokens(hist_v)
        arrs = list(cache.scan_arrays())
        for i, new in enumerate((k4, ks, kb, v4, vs, vb)):
            a = arrs[i][0]
            z = (jnp.zeros((), jnp.int32),) * a.ndim
            arrs[i] = jax.lax.dynamic_update_slice(
                a, new.astype(a.dtype), z)[None]
        import dataclasses

        cache = dataclasses.replace(
            cache, k4=arrs[0], ks=arrs[1], kb=arrs[2], v4=arrs[3],
            vs=arrs[4], vb=arrs[5], offset=jnp.asarray(off, jnp.int32))
        q = _rand(rng, B, nkv * g, 1, D) * 0.3
        knew = _rand(rng, B, nkv, 1, D)
        vnew = _rand(rng, B, nkv, 1, D)
        return cache, q, knew, vnew

    def test_fused_matches_xla_fallback(self):
        """S=1 decode: the Pallas kernel (interpret mode on CPU) must match
        the XLA integer-domain path on the same cache."""
        rng = np.random.default_rng(1)
        cache, q, k, v = self._attend_setup(rng)
        cxs = tuple(a[0] for a in cache.scan_arrays())  # layer 0
        scale = 1.0 / np.sqrt(q.shape[-1])

        out_fused, _ = cache.attend(cxs, q, k, v, scale, None)

        B, nh, S, D = q.shape
        off = int(cache.offset)
        ids = np.arange(cache.capacity)
        mask = jnp.asarray(
            (ids < off + 1)[None, None, None, :]
            * np.ones((B, nh, S, 1), bool))
        out_ref, _ = _xla_reference(cache, cxs, q, k, v, scale, mask)

        np.testing.assert_allclose(
            np.asarray(out_fused), np.asarray(out_ref), rtol=2e-2,
            atol=2e-2)

    def test_matches_float_attention(self):
        """4-bit attend approximates exact attention within quant noise."""
        rng = np.random.default_rng(2)
        cache, q, k, v = self._attend_setup(rng, off=60)
        cxs = tuple(a[0] for a in cache.scan_arrays())
        scale = 1.0 / np.sqrt(q.shape[-1])
        out, _ = cache.attend(cxs, q, k, v, scale, None)
        # float reference from the dequantized cache + the new token
        k8 = cache_lib.Int4KVCache._unpack(cxs[0]).astype(jnp.float32)
        kf = k8 * cxs[1][..., None] + cxs[2][..., None]
        v8 = cache_lib.Int4KVCache._unpack(cxs[3]).astype(jnp.float32)
        vf = v8 * cxs[4][..., None] + cxs[5][..., None]
        off = int(cache.offset)
        kf = jnp.concatenate([kf[:, :, :off], k.astype(jnp.float32)], 2)
        vf = jnp.concatenate([vf[:, :, :off], v.astype(jnp.float32)], 2)
        B, nh, S, D = q.shape
        nkv = kf.shape[1]
        g = nh // nkv
        qg = q.astype(jnp.float32).reshape(B, nkv, g, D)
        s = jnp.einsum("bkgd,bktd->bkgt", qg, kf) * scale
        p = jax.nn.softmax(s, -1)
        ref = jnp.einsum("bkgt,bktd->bkgd", p, vf).reshape(B, nh, 1, D)
        err = np.abs(np.asarray(out) - np.asarray(ref)).max()
        assert err < 0.06, f"4-bit attend error {err}"

    def test_generate_step_kv4(self):
        from mlx_vlm_tpu.generate.ar import generate_step, make_cache
        from mlx_vlm_tpu.utils.loader import load_model_from_weights
        from mlx_vlm_tpu.utils.testing import (
            llama_hf_weights,
            tiny_llama_config,
        )

        cfg = tiny_llama_config()
        m = load_model_from_weights(cfg, llama_hf_weights(cfg, 1),
                                    jnp.float32)
        c = make_cache(m, 1, 256, jnp.float32, kv_bits=4)
        assert type(c).__name__ == "Int4KVCache"
        ids = (np.arange(10, dtype=np.int32) * 3 % 200)[None]
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
        q4 = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=6,
                                                  kv_bits=4)]
        assert len(q4) == 6
        # prefill logits stay close to the fp cache (quant noise bound,
        # mirroring test_quantized_kv's 4-bit tolerance)
        pos = np.broadcast_to(np.arange(10, dtype=np.int32), (3, 1, 10))
        cache_fp = make_cache(m, 1, 256, jnp.float32)
        ref_out, _ = m(m.params, e, cache_fp, jnp.asarray(pos))
        out, _ = m(m.params, e, c, jnp.asarray(pos))
        err = np.abs(np.asarray(ref_out) - np.asarray(out)).max()
        assert err < 0.5, f"4-bit KV logits error {err}"


def _xla_reference(cache, cxs, q, k, v, scale, mask):
    """Run Int4KVCache.attend's XLA branch by spoofing an odd capacity
    check (copy of the fallback math on freshly-updated arrays)."""
    import dataclasses

    import mlx_vlm_tpu.core.cache as cm

    k4, ks, kb, v4, vs, vb = cxs
    kn4, kns, knb = cm.Int4KVCache._quantize_tokens(k)
    vn4, vns, vnb = cm.Int4KVCache._quantize_tokens(v)
    off = cache.offset
    k4, v4 = cm.update_layer_auto(k4, v4, kn4, vn4, off)
    ks, vs = cm._update_scalar_auto(ks, vs, kns, vns, off)
    kb, vb = cm._update_scalar_auto(kb, vb, knb, vnb, off)

    B, nh, S, D = q.shape
    nkv = k4.shape[1]
    g = nh // nkv
    qf = q.astype(jnp.float32)
    qs = jnp.max(jnp.abs(qf), axis=-1) / 127.0
    qs = jnp.where(qs == 0.0, 1.0, qs)
    q8 = jnp.round(qf / qs[..., None]).astype(jnp.int8)
    qsum = q8.astype(jnp.int32).sum(axis=-1).astype(jnp.float32)
    k8 = cm.Int4KVCache._unpack(k4)
    v8 = cm.Int4KVCache._unpack(v4)
    q8g = q8.reshape(B, nkv, g, S, D)
    iscores = jnp.einsum("bkgsd,bktd->bkgst", q8g, k8,
                         preferred_element_type=jnp.int32)
    scores = ((iscores.astype(jnp.float32) * ks[:, :, None, None, :]
               + qsum.reshape(B, nkv, g, S, 1) * kb[:, :, None, None, :])
              * qs.reshape(B, nkv, g, S, 1) * jnp.float32(scale))
    m = mask.reshape(B, nkv, g, S, -1)
    scores = jnp.where(m, scores, jnp.float32(jnp.finfo(jnp.float32).min))
    p = jax.nn.softmax(scores, -1)
    pv = p * vs[:, :, None, None, :]
    out = jnp.einsum("bkgst,bktd->bkgsd", pv.astype(q.dtype),
                     v8.astype(q.dtype), preferred_element_type=jnp.float32)
    bias = jnp.einsum("bkgst,bkt->bkgs", p, vb,
                      preferred_element_type=jnp.float32)
    return (out + bias[..., None].astype(out.dtype)).reshape(
        B, nh, S, D).astype(q.dtype), None


class TestInt4PerRowFused:
    """Batched continuous-decode rows: per-row offsets through the fused
    Pallas kernel must match the XLA integer-domain fallback (reference
    BatchTurboQuantKVCache, turboquant.py:6110)."""

    def test_per_row_offsets_match_fallback(self):
        rng = np.random.default_rng(5)
        B, nkv, g, D, C = 3, 2, 4, 256, 256
        L = 1
        offs = np.asarray([17, 64, 3], np.int32)
        cache = cache_lib.init_int4_cache(L, B, nkv, D, C, per_row=True)
        import dataclasses

        arrs = list(cache.scan_arrays())
        for b, off in enumerate(offs):
            hist_k = _rand(rng, 1, nkv, int(off), D)
            hist_v = _rand(rng, 1, nkv, int(off), D)
            k4, ks, kb = cache_lib.Int4KVCache._quantize_tokens(hist_k)
            v4, vs, vb = cache_lib.Int4KVCache._quantize_tokens(hist_v)
            for i, new in enumerate((k4, ks, kb, v4, vs, vb)):
                a = arrs[i]
                z = (jnp.zeros((), jnp.int32),) * (a.ndim - 2)
                arrs[i] = jax.lax.dynamic_update_slice(
                    a, new[None].astype(a.dtype),
                    (jnp.zeros((), jnp.int32), jnp.asarray(b)) + z)
        cache = dataclasses.replace(
            cache, k4=arrs[0], ks=arrs[1], kb=arrs[2], v4=arrs[3],
            vs=arrs[4], vb=arrs[5], offset=jnp.asarray(offs))

        q = _rand(rng, B, nkv * g, 1, D) * 0.3
        knew = _rand(rng, B, nkv, 1, D)
        vnew = _rand(rng, B, nkv, 1, D)
        cxs = tuple(a[0] for a in cache.scan_arrays())
        scale = 1.0 / np.sqrt(D)

        out_fused, _ = cache.attend(cxs, q, knew, vnew, scale, None)

        ids = np.arange(C)
        mask = jnp.asarray(
            ids[None, None, None, :] < (offs + 1)[:, None, None, None])
        mask = jnp.broadcast_to(mask, (B, nkv * g, 1, C))
        out_ref, _ = _xla_reference(cache, cxs, q, knew, vnew, scale, mask)
        np.testing.assert_allclose(
            np.asarray(out_fused), np.asarray(out_ref), rtol=2e-2, atol=2e-2)
