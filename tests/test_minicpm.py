"""MiniCPM: depth/width scaling on the llama decoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from mlx_vlm_tpu.utils.testing import llama_hf_weights, tiny_llama_config


def tiny_minicpm_config():
    cfg = tiny_llama_config()
    cfg["model_type"] = "minicpm"
    cfg["dim_model_base"] = 32
    cfg["scale_depth"] = 1.4
    cfg["scale_emb"] = 12.0
    return cfg


class TestMiniCPM:
    def test_scaling_applied(self):
        cfg = tiny_minicpm_config()
        w = llama_hf_weights(cfg, 0)
        m = load_model_from_weights(cfg, dict(w), jnp.float32)
        lcfg = dict(cfg); lcfg["model_type"] = "llama"
        plain = load_model_from_weights(lcfg, dict(w), jnp.float32)
        ids = (np.arange(5, dtype=np.int32) % 200)[None]
        e_m = np.asarray(jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids)))
        e_p = np.asarray(jax.jit(plain.get_input_embeddings)(plain.params, jnp.asarray(ids)))
        np.testing.assert_allclose(e_m, e_p * 12.0, atol=1e-5)

    def test_generate(self):
        cfg = tiny_minicpm_config()
        m = load_model_from_weights(cfg, llama_hf_weights(cfg, 0), jnp.float32)
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=4)]
        assert len(toks) == 4
