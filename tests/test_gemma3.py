import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.testing import make_tiny_gemma3


@pytest.fixture(scope="module")
def model():
    return make_tiny_gemma3(seed=0)


class TestGemma3Language:
    def test_incremental_matches_full(self, model):
        S = 8
        ids = (np.arange(S, dtype=np.int32) * 7 % 200)[None]
        embeds = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S))
        cache = model.language_model.init_cache(1, 16, jnp.float32)
        full, _ = model(model.params, embeds, cache, jnp.asarray(pos))
        cache = model.language_model.init_cache(1, 16, jnp.float32)
        outs = []
        for t in range(S):
            lt, cache = model(
                model.params, embeds[:, t : t + 1], cache,
                jnp.asarray(pos[:, :, t : t + 1]),
            )
            outs.append(np.asarray(lt)[:, 0])
        np.testing.assert_allclose(
            np.asarray(full), np.stack(outs, 1), atol=3e-4, rtol=1e-3
        )

    def test_sliding_window_restricts_context(self, model):
        """With window=4, token 7's local-layer attention must not see token 0.
        Changing token 0 must still change global-layer output (sanity), but
        an all-local model must be unaffected beyond the window."""
        from mlx_vlm_tpu.utils.loader import load_model_from_weights
        from mlx_vlm_tpu.utils.testing import gemma3_hf_weights, tiny_gemma3_config

        cfg = tiny_gemma3_config()
        cfg["text_config"]["sliding_window_pattern"] = 99  # all layers local
        # single layer: receptive field == window (it grows layer-by-layer)
        cfg["text_config"]["num_hidden_layers"] = 1
        m = load_model_from_weights(cfg, gemma3_hf_weights(cfg, 1), jnp.float32)
        S = 8
        ids1 = (np.arange(S, dtype=np.int32) + 1)[None]
        ids2 = ids1.copy()
        ids2[0, 0] = 99  # outside the window of the last token
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S))
        outs = []
        for ids in (ids1, ids2):
            e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
            cache = m.language_model.init_cache(1, 16, jnp.float32)
            lg, _ = m(m.params, e, cache, jnp.asarray(pos))
            outs.append(np.asarray(lg))
        # last position: token 0 is 4+ steps back -> invisible to all-local model
        np.testing.assert_allclose(outs[0][0, -1], outs[1][0, -1], atol=1e-5)
        assert not np.allclose(outs[0][0, 1], outs[1][0, 1])

    def test_tied_lm_head(self, model):
        assert "lm_head" not in model.params["language_model"]
        ids = np.asarray([[1, 2, 3]])
        e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=3)]
        assert len(toks) == 3


class TestGemma3Vision:
    def test_projector_shapes(self, model):
        vc = model.config.vision_config
        pv = np.random.default_rng(0).standard_normal(
            (1, 3, vc.image_size, vc.image_size)
        ).astype(np.float32)
        out = model.vision_tower(model.params["vision_tower"], jnp.asarray(pv))
        feats = model._project(model.params, out.post_norm)
        assert feats.shape == (1, model.config.text_config.mm_tokens_per_image,
                               model.config.text_config.hidden_size)

    def test_full_pipeline(self, model):
        cfg = model.config
        vc = cfg.vision_config
        n_tok = cfg.text_config.mm_tokens_per_image
        ids = np.asarray([[2] + [cfg.image_token_index] * n_tok + [3, 4]])
        pv = np.random.default_rng(1).standard_normal(
            (1, 3, vc.image_size, vc.image_size)
        ).astype(np.float32)
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), jnp.asarray(pv)
        )
        toks = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=4)]
        assert len(toks) == 4


class TestRingCache:
    def test_ring_matches_masked_full_cache_with_wrap(self, model):
        """MixedWindowCache (O(window) local layers) reproduces the
        full-capacity masked run, including after the ring wraps."""
        import dataclasses

        from mlx_vlm_tpu.core import cache as cache_lib

        lm = model.language_model
        lmp = model.params["language_model"]
        args = lm.args
        rng = np.random.default_rng(3)
        S_total, step = 30, 5
        ids = (rng.integers(0, 200, (1, S_total))).astype(np.int32)
        emb_all = lm.embed(lmp, jnp.asarray(ids))

        full = lm.init_cache(1, 64, jnp.float32, ring_margin=10**9)
        assert isinstance(full, cache_lib.KVCache)
        ring = cache_lib.init_mixed_window_cache(
            lm.is_global, 1, lm.n_kv_heads, lm.head_dim, 64,
            args.sliding_window, jnp.float32, chunk_margin=step + 3,
        )
        assert ring.ring_capacity < S_total  # the ring really wraps
        for s0 in range(0, S_total, step):
            chunk = emb_all[:, s0 : s0 + step]
            pos = jnp.arange(s0, s0 + step, dtype=jnp.int32)[None]
            h_full, full = lm(lmp, chunk, full, pos)
            h_ring, ring = lm(lmp, chunk, ring, pos)
            np.testing.assert_allclose(
                np.asarray(h_full), np.asarray(h_ring), atol=2e-5,
                err_msg=f"divergence at chunk {s0}",
            )

    def test_generate_uses_ring_for_long_context(self, model):
        from mlx_vlm_tpu.core import cache as cache_lib
        from mlx_vlm_tpu.generate.ar import make_cache

        c = make_cache(model, 1, 2048, jnp.float32)
        assert isinstance(c, cache_lib.MixedWindowCache)
        w = model.language_model.args.sliding_window
        assert c.ring_capacity <= w + 256
        # and kv-quant falls back to the full quantized cache
        cq = make_cache(model, 1, 2048, jnp.float32, kv_bits=8, kv_group_size=8)
        assert isinstance(cq, cache_lib.QuantizedKVCache)

    def test_generate_step_end_to_end_ring(self, model):
        ids = (np.arange(12, dtype=np.int32) * 5 % 200)[None]
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids)
        )
        ref = [
            int(t[0])
            for t, _ in generate_step(
                embeds, model, max_tokens=6, kv_capacity=256
            )
        ]
        out = [
            int(t[0])
            for t, _ in generate_step(
                embeds, model, max_tokens=6, kv_capacity=2048
            )
        ]
        assert out == ref
