"""PaliGemma / PaliGemma-2: image merge, bidirectional prefix, gemma2 path.

Parity: reference mlx_vlm paligemma language/model behavior (bidirectional
prefix attention, sqrt(D) embed normalizer, gemma2 softcapping + sandwich
norms)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step, make_cache
from mlx_vlm_tpu.utils.testing import make_tiny_paligemma, tiny_paligemma_config


@pytest.fixture(scope="module")
def model():
    return make_tiny_paligemma(seed=3, dtype=jnp.float32)


@pytest.fixture(scope="module")
def model2():
    return make_tiny_paligemma(seed=4, dtype=jnp.float32, gemma2=True)


def _run_prompt(model, ids):
    embeds = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
    cache = make_cache(model, 1, 16, jnp.float32)
    pos = np.broadcast_to(np.arange(ids.shape[1], dtype=np.int32),
                          (3, 1, ids.shape[1]))
    logits, cache = model(model.params, embeds, cache, jnp.asarray(pos))
    return logits, cache


class TestPaliGemma1:
    def test_shapes_and_decode(self, model):
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        logits, cache = _run_prompt(model, ids)
        assert logits.shape == (1, 6, 256)
        toks = [
            int(t[0]) for t, _ in generate_step(
                jax.jit(model.get_input_embeddings)(
                    model.params, jnp.asarray(ids)
                ), model, max_tokens=4)
        ]
        assert len(toks) == 4

    def test_bidirectional_prefix(self, model):
        """Changing the LAST prompt token must change logits at position 0
        (prefix attention is bidirectional, reference paligemma config)."""
        a = np.asarray([[5, 7, 9, 11]], np.int32)
        b = np.asarray([[5, 7, 9, 99]], np.int32)
        la, _ = _run_prompt(model, a)
        lb, _ = _run_prompt(model, b)
        assert not np.allclose(np.asarray(la[0, 0]), np.asarray(lb[0, 0]))

    def test_causal_when_configured(self):
        cfg = tiny_paligemma_config()
        cfg["text_config"]["use_bidirectional_attention"] = False
        m = make_tiny_paligemma(seed=3, config=cfg)
        a = np.asarray([[5, 7, 9, 11]], np.int32)
        b = np.asarray([[5, 7, 9, 99]], np.int32)
        la, _ = _run_prompt(m, a)
        lb, _ = _run_prompt(m, b)
        np.testing.assert_allclose(
            np.asarray(la[0, 0]), np.asarray(lb[0, 0]), atol=1e-5
        )

    def test_image_merge(self, model):
        ids = np.asarray([[64, 64, 64, 64, 1, 2]], np.int32)
        pixels = np.random.default_rng(0).standard_normal(
            (1, 3, 28, 28)).astype(np.float32)
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), pixel_values=jnp.asarray(pixels)
        )
        plain = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids)
        )
        assert embeds.shape == plain.shape
        # image positions replaced, text positions untouched
        assert not np.allclose(np.asarray(embeds[0, 0]), np.asarray(plain[0, 0]))
        np.testing.assert_allclose(
            np.asarray(embeds[0, 4]), np.asarray(plain[0, 4]), atol=1e-6
        )


class TestGemmaTextOnly:
    def test_gemma2_text_checkpoint_causal(self):
        """gemma2 text-only configs load via text_only and stay causal."""
        from mlx_vlm_tpu.utils.loader import load_model_from_weights
        from mlx_vlm_tpu.utils.testing import (
            paligemma_hf_weights, tiny_paligemma_config,
        )

        cfg2 = tiny_paligemma_config(gemma2=True)
        tw = {
            k[len("language_model."):]: v
            for k, v in paligemma_hf_weights(cfg2).items()
            if k.startswith("language_model.")
        }
        tcfg = dict(cfg2["text_config"])
        tcfg["model_type"] = "gemma2"
        m = load_model_from_weights(tcfg, tw, jnp.float32)
        la, _ = _run_prompt(m, np.asarray([[5, 7, 9, 11]], np.int32))
        lb, _ = _run_prompt(m, np.asarray([[5, 7, 9, 99]], np.int32))
        np.testing.assert_allclose(
            np.asarray(la[0, 0]), np.asarray(lb[0, 0]), atol=1e-5
        )
        toks = [
            int(t[0]) for t, _ in generate_step(
                jax.jit(m.get_input_embeddings)(
                    m.params, jnp.asarray((np.arange(5, dtype=np.int32))[None])
                ), m, max_tokens=3)
        ]
        assert len(toks) == 3


class TestPaliGemma2:
    def test_gemma2_decode(self, model2):
        ids = (np.arange(5, dtype=np.int32) % 200)[None]
        logits, _ = _run_prompt(model2, ids)
        assert logits.shape == (1, 5, 256)
        # final logit softcapping bounds the logits
        assert np.abs(np.asarray(logits)).max() <= 30.0 + 1e-4
        toks = [
            int(t[0]) for t, _ in generate_step(
                jax.jit(model2.get_input_embeddings)(
                    model2.params, jnp.asarray(ids)
                ), model2, max_tokens=3)
        ]
        assert len(toks) == 3

    def test_layer_types_alternate(self, model2):
        lt = model2.config.text_config.layer_types
        assert lt == ["sliding_attention", "full_attention"] * 2
