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


@needs_8
class TestRingPrefillWiring:
    """ring_prefill: end-to-end sequence-parallel prefill through a real
    model matches the single-device forward (VERDICT r02 item 8)."""

    def test_model_prefill_matches_single_device(self):
        from mlx_vlm_tpu.parallel.mesh import make_mesh
        from mlx_vlm_tpu.parallel.ring import ring_prefill
        from mlx_vlm_tpu.utils.testing import make_tiny_qwen2_vl

        model = make_tiny_qwen2_vl(seed=0, dtype=jnp.float32)
        B, S = 1, 64
        ids = (np.arange(S, dtype=np.int32) * 7 % 200)[None]
        embeds = model.language_model.embed(
            model.params["language_model"], jnp.asarray(ids)
        )
        pos = jnp.asarray(
            np.broadcast_to(np.arange(S, dtype=np.int32), (3, B, S))
        )

        cache0 = model.language_model.init_cache(B, S, jnp.float32)
        ref_logits, ref_cache = jax.jit(model.__call__)(
            model.params, embeds, cache0, pos
        )

        mesh = make_mesh(data_parallel=8, devices=jax.devices()[:8])
        cache1 = model.language_model.init_cache(B, S, jnp.float32)
        logits, cache1 = ring_prefill(
            model, embeds, cache1, pos, mesh, min_tokens=32
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref_logits), atol=3e-4, rtol=1e-3
        )
        # the KV cache written under ring routing must match too — decode
        # continues on the normal path afterwards
        np.testing.assert_allclose(
            np.asarray(cache1.k), np.asarray(ref_cache.k), atol=1e-5,
            rtol=1e-4,
        )

    def test_context_inactive_outside(self):
        from mlx_vlm_tpu.parallel import ring as ring_mod

        assert ring_mod._STATE is None
        assert ring_mod.maybe_ring_attend(
            jnp.zeros((1, 2, 64, 16)), jnp.zeros((1, 2, 64, 16)),
            jnp.zeros((1, 2, 64, 16)), 0.25,
        ) is None


@needs_8
class TestRingRoutingGuards:
    """ADVICE r3 (high): a chunked-prefill continuation chunk
    (q_len == kv_len, cache offset > 0) must NOT route through ring
    attention — it would silently drop all previously cached context."""

    def test_chunked_prefill_under_context_matches_plain(self):
        from mlx_vlm_tpu.generate.ar import generate_step
        from mlx_vlm_tpu.parallel.mesh import make_mesh
        from mlx_vlm_tpu.parallel.ring import sequence_parallel
        from mlx_vlm_tpu.utils.testing import make_tiny_qwen2_vl

        model = make_tiny_qwen2_vl(seed=0, dtype=jnp.float32)
        D = model.config.text_config.hidden_size
        rng = np.random.default_rng(4)
        # 2 chunks of 64: the second is a continuation with offset=64
        embeds = jnp.asarray(
            rng.standard_normal((1, 128, D)).astype(np.float32) * 0.3)

        def run(ring):
            import jax as _jax

            _jax.clear_caches()  # engine jits must re-trace under the ctx
            gen = lambda: [  # noqa: E731
                (int(t[0]), float(lp[0])) for t, lp in generate_step(
                    embeds, model, max_tokens=3, prefill_step_size=64,
                    block_size=1, seed=0)
            ]
            if not ring:
                return gen()
            mesh = make_mesh(data_parallel=8, devices=jax.devices()[:8])
            with sequence_parallel(mesh, min_tokens=32):
                return gen()

        plain = run(ring=False)
        ringed = run(ring=True)
        assert [t for t, _ in plain] == [t for t, _ in ringed]
        np.testing.assert_allclose(
            [lp for _, lp in plain], [lp for _, lp in ringed], atol=1e-4)

    def test_left_padded_rows_not_routed(self):
        from jax.sharding import Mesh
        from mlx_vlm_tpu.parallel import ring as ring_mod
        from mlx_vlm_tpu.parallel.ring import sequence_parallel

        q = jnp.zeros((2, 2, 64, 16))
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
        with sequence_parallel(mesh, min_tokens=32):
            # concrete zero offset + nonzero left_pad: refuse
            out = ring_mod.maybe_ring_attend(
                q, q, q, 0.25, offset=0,
                left_pad=np.asarray([0, 3], np.int32))
            assert out is None
            # traced offset (unknown): refuse
            traced = jax.jit(lambda o: ring_mod.maybe_ring_attend(
                q, q, q, 0.25, offset=o) is None)(jnp.asarray(0))
            assert bool(traced)
            # provable whole-prompt: routes
            out = ring_mod.maybe_ring_attend(
                q, q, q, 0.25, offset=0, left_pad=np.zeros(2, np.int32))
            assert out is not None
