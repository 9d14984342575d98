"""Text-only family registrations: granite, cohere2/cohere, phi3 remap."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from mlx_vlm_tpu.utils.testing import llama_hf_weights, tiny_llama_config


class TestGranite:
    def test_multipliers_and_generate(self):
        cfg = tiny_llama_config()
        cfg.update(model_type="granite", embedding_multiplier=12.0,
                   residual_multiplier=0.22, logits_scaling=8.0,
                   attention_multiplier=0.015, tie_word_embeddings=False)
        m = load_model_from_weights(cfg, llama_hf_weights(cfg, 0), jnp.float32)
        lcfg = dict(cfg)
        lcfg.update(model_type="llama")
        plain = load_model_from_weights(lcfg, llama_hf_weights(cfg, 0),
                                        jnp.float32)
        ids = (np.arange(5, dtype=np.int32) % 200)[None]
        e_g = np.asarray(jax.jit(m.get_input_embeddings)(m.params,
                                                         jnp.asarray(ids)))
        e_p = np.asarray(jax.jit(plain.get_input_embeddings)(
            plain.params, jnp.asarray(ids)))
        np.testing.assert_allclose(e_g, e_p * 12.0, atol=1e-5)
        toks = [int(t[0]) for t, _ in generate_step(
            jnp.asarray(e_g), m, max_tokens=3)]
        assert len(toks) == 3


class TestCohereText:
    def test_cohere_v1_remap_full_attention(self):
        from tests.test_aya_vision import tiny_aya_config, tiny_aya_weights

        acfg = tiny_aya_config()
        tcfg = dict(acfg["text_config"])
        tcfg["model_type"] = "cohere"  # v1 -> remapped, full attention
        del tcfg["sliding_window"], tcfg["sliding_window_pattern"]
        tw = {k[len("language_model."):]: v
              for k, v in tiny_aya_weights(acfg).items()
              if k.startswith("language_model.")}
        m = load_model_from_weights(tcfg, tw, jnp.float32)
        assert all(not g for g in m.language_model.is_global[:3])
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=3)]
        assert len(toks) == 3


class TestPhi3Text:
    def test_phi3_remap(self):
        from tests.test_phi3_v import tiny_phi3v_config, tiny_phi3v_weights

        pcfg = {k: v for k, v in tiny_phi3v_config().items()
                if k != "vision_config"}
        pcfg["model_type"] = "phi3"
        pw = {k: v for k, v in tiny_phi3v_weights(tiny_phi3v_config()).items()
              if "vision" not in k}
        m = load_model_from_weights(pcfg, pw, jnp.float32)
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=3)]
        assert len(toks) == 3
