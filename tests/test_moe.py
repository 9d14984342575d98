import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.core.moe import switch_glu, topk_router
from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from mlx_vlm_tpu.utils.testing import qwen2_moe_hf_weights, tiny_qwen2_moe_config


@pytest.fixture(scope="module")
def model():
    cfg = tiny_qwen2_moe_config()
    return load_model_from_weights(cfg, qwen2_moe_hf_weights(cfg, 0), jnp.float32)


class TestSwitchGLU:
    def test_matches_per_token_loop(self):
        rng = np.random.default_rng(0)
        N, D, I, E, k = 6, 8, 16, 4, 2
        x = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
        wg = jnp.asarray(rng.standard_normal((E, I, D)).astype(np.float32) * 0.1)
        wu = jnp.asarray(rng.standard_normal((E, I, D)).astype(np.float32) * 0.1)
        wd = jnp.asarray(rng.standard_normal((E, D, I)).astype(np.float32) * 0.1)
        gate_w = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32))
        idx, wts = topk_router(x, gate_w, k, norm_topk_prob=True)
        out = np.asarray(switch_glu(x, wg, wu, wd, idx, wts))

        # naive reference
        idx_h, wts_h = np.asarray(idx), np.asarray(wts)
        xh = np.asarray(x)
        ref = np.zeros((N, D), np.float32)
        for n in range(N):
            for j in range(k):
                e = idx_h[n, j]
                g = np.asarray(wg)[e] @ xh[n]
                u = np.asarray(wu)[e] @ xh[n]
                h = (g / (1 + np.exp(-g))) * u
                ref[n] += wts_h[n, j] * (np.asarray(wd)[e] @ h)
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)

    def test_router_normalization(self):
        x = jnp.asarray(np.random.default_rng(1).standard_normal((3, 8)), jnp.float32)
        gate_w = jnp.asarray(np.random.default_rng(2).standard_normal((4, 8)), jnp.float32)
        _, w_norm = topk_router(x, gate_w, 2, norm_topk_prob=True)
        np.testing.assert_allclose(np.asarray(w_norm).sum(-1), 1.0, atol=1e-6)


class TestQwen2MoE:
    def test_expert_stacking_shapes(self, model):
        exp = model.params["language_model"]["model"]["layers"]["mlp"]["experts"]
        L = model.config.num_hidden_layers
        assert exp["gate_proj"]["weight"].shape == (L, 4, 32, 64)

    def test_generate(self, model):
        ids = (np.arange(8, dtype=np.int32) % 200)[None]
        embeds = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=5)]
        assert len(toks) == 5

    def test_incremental_matches_full(self, model):
        S = 7
        ids = (np.arange(S, dtype=np.int32) * 5 % 200)[None]
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
