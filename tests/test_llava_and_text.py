import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from mlx_vlm_tpu.utils.testing import (
    llama_hf_weights,
    make_tiny_llava,
    tiny_llama_config,
    tiny_llava_config,
)


class TestTextOnlyFallback:
    @pytest.mark.parametrize("model_type", ["llama", "mistral", "qwen2"])
    def test_load_and_generate(self, model_type):
        cfg = tiny_llama_config(model_type=model_type)
        model = load_model_from_weights(cfg, llama_hf_weights(cfg, 1), jnp.float32)
        ids = (np.arange(10, dtype=np.int32) % 200)[None]
        embeds = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=5)]
        assert len(toks) == 5

    def test_gqa_cache_consistency(self):
        cfg = tiny_llama_config()
        model = load_model_from_weights(cfg, llama_hf_weights(cfg, 2), jnp.float32)
        S = 6
        ids = (np.arange(S, dtype=np.int32) * 3 % 200)[None]
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
            np.asarray(full), np.stack(outs, 1), atol=2e-4, rtol=1e-3
        )

    def test_qwen3_qk_norms(self):
        """qwen3 checkpoints carry q_norm/k_norm over head_dim."""
        cfg = tiny_llama_config(model_type="qwen3", head_dim=16)
        w = llama_hf_weights(cfg, 5)
        for i in range(cfg["num_hidden_layers"]):
            w[f"model.layers.{i}.self_attn.q_norm.weight"] = (
                np.full(16, 2.0, np.float32)
            )
            w[f"model.layers.{i}.self_attn.k_norm.weight"] = np.ones(16, np.float32)
        model = load_model_from_weights(cfg, w, jnp.float32)
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        embeds = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=3)]
        assert len(toks) == 3
        # norms actually applied: removing them changes logits
        w2 = {k: v for k, v in w.items() if "q_norm" not in k and "k_norm" not in k}
        model2 = load_model_from_weights(cfg, w2, jnp.float32)
        e2 = jax.jit(model2.get_input_embeddings)(model2.params, jnp.asarray(ids))
        pos = np.broadcast_to(np.arange(6, dtype=np.int32), (3, 1, 6))
        c1 = model.language_model.init_cache(1, 16, jnp.float32)
        c2 = model2.language_model.init_cache(1, 16, jnp.float32)
        l1, _ = model(model.params, embeds, c1, jnp.asarray(pos))
        l2, _ = model2(model2.params, e2, c2, jnp.asarray(pos))
        assert not np.allclose(np.asarray(l1), np.asarray(l2))

    def test_llama3_rope_scaling(self):
        cfg = tiny_llama_config(
            rope_scaling={
                "rope_type": "llama3",
                "factor": 8.0,
                "low_freq_factor": 1.0,
                "high_freq_factor": 4.0,
                "original_max_position_embeddings": 128,
            }
        )
        model = load_model_from_weights(cfg, llama_hf_weights(cfg, 3), jnp.float32)
        ids = (np.arange(4, dtype=np.int32))[None]
        embeds = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=3)]
        assert len(toks) == 3


class TestLlava:
    @pytest.fixture(scope="class")
    def model(self):
        return make_tiny_llava(seed=0)

    def test_vision_tower_shapes(self, model):
        vc = model.config.vision_config
        pv = np.random.default_rng(0).standard_normal(
            (1, 3, vc.image_size, vc.image_size)
        ).astype(np.float32)
        out = model.vision_tower(model.params["vision_tower"], jnp.asarray(pv))
        pooled, last, hidden = out.pooled, out.last_hidden, out.hidden_states
        n_patches = (vc.image_size // vc.patch_size) ** 2
        assert last.shape == (1, n_patches + 1, vc.hidden_size)
        assert hidden.shape[0] == vc.num_hidden_layers + 1
        assert pooled.shape == (1, vc.hidden_size)

    def test_full_pipeline(self, model):
        cfg = model.config
        vc = cfg.vision_config
        n_img = (vc.image_size // vc.patch_size) ** 2  # 4
        ids = np.asarray([[1] + [cfg.image_token_index] * n_img + [2, 3]])
        pv = np.random.default_rng(1).standard_normal(
            (1, 3, vc.image_size, vc.image_size)
        ).astype(np.float32)
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), jnp.asarray(pv)
        )
        assert embeds.shape == (1, ids.shape[1], cfg.text_config.hidden_size)
        toks = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=4)]
        assert len(toks) == 4

    def test_feature_layer_selection(self, model):
        """vision_feature_layer=-2 must differ from -1 (post-last-layer)."""
        import dataclasses

        vc = model.config.vision_config
        pv = np.random.default_rng(2).standard_normal(
            (1, 3, vc.image_size, vc.image_size)
        ).astype(np.float32)
        out = model.vision_tower(model.params["vision_tower"], jnp.asarray(pv))
        last, hidden = out.last_hidden, out.hidden_states
        assert not np.allclose(np.asarray(hidden[-2]), np.asarray(hidden[-1]))
        np.testing.assert_allclose(np.asarray(hidden[-1]), np.asarray(last), atol=1e-6)
