"""Text-family tranche 3: dots1, bailing_moe, mimo, apertus."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights

from test_glm4_moe import hf_weights as glm_weights
from test_glm4_moe import tiny_cfg as glm_tiny
from test_llada2_moe import fused_weights, tiny_cfg as llada2_tiny

IDS = (np.arange(6, dtype=np.int32) * 7 % 120)[None]


def _gen(model, n=3):
    e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(IDS))
    return [int(t[0]) for t, _ in generate_step(e, model, max_tokens=n)]


class TestDots1:
    def test_generate(self):
        cfg = glm_tiny(model_type="dots1", partial_rotary_factor=1.0,
                       attention_bias=True)
        m = load_model_from_weights(cfg, glm_weights(cfg), jnp.float32)
        # full rotary: all head lanes rotate
        assert m.language_model.rope.dim == 8
        assert len(_gen(m)) == 3


class TestBailingMoe:
    def test_generate_and_norm_head(self):
        cfg = llada2_tiny()
        cfg["model_type"] = "bailing_moe"
        cfg["norm_head"] = True
        cfg.pop("mask_token_id", None)
        w = fused_weights(cfg)
        w = {k.replace("model.embed_tokens.", "model.word_embeddings.")
             .replace(".self_attn.", ".attention."): v
             for k, v in w.items()}
        m = load_model_from_weights(cfg, w, jnp.float32)
        lm_head = np.asarray(m.params["language_model"]["lm_head"]["weight"])
        norms = np.linalg.norm(lm_head, axis=0)
        np.testing.assert_allclose(norms, norms[0], rtol=1e-4)  # normalized
        assert len(_gen(m)) == 3

    def test_not_diffusion(self):
        from mlx_vlm_tpu.generate.diffusion import is_diffusion_model

        cfg = llada2_tiny()
        cfg["model_type"] = "bailing_moe"
        cfg.pop("mask_token_id", None)
        cfg.pop("diffusion", None)
        w = fused_weights(cfg)
        w = {k.replace("model.embed_tokens.", "model.word_embeddings.")
             .replace(".self_attn.", ".attention."): v
             for k, v in w.items()}
        m = load_model_from_weights(cfg, w, jnp.float32)
        assert not is_diffusion_model(m)


class TestMimo:
    def test_mtp_layers_dropped(self):
        rng = np.random.default_rng(5)

        def rand(*sh):
            return (rng.standard_normal(sh) * 0.08).astype(np.float32)

        D, V = 32, 128
        cfg = {"model_type": "mimo", "hidden_size": D,
               "num_hidden_layers": 2, "num_attention_heads": 4,
               "num_key_value_heads": 2, "intermediate_size": 64,
               "vocab_size": V, "rms_norm_eps": 1e-6}
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.norm.weight": np.ones(D, np.float32),
             "lm_head.weight": rand(V, D),
             # MTP head weights must be ignored
             "model.mtp_layers.0.input_layernorm.weight": np.ones(
                 D, np.float32)}
        for i in range(2):
            p = f"model.layers.{i}."
            w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
            w[p + "post_attention_layernorm.weight"] = np.ones(
                D, np.float32)
            w[p + "self_attn.q_proj.weight"] = rand(D, D)
            w[p + "self_attn.k_proj.weight"] = rand(16, D)
            w[p + "self_attn.v_proj.weight"] = rand(16, D)
            w[p + "self_attn.o_proj.weight"] = rand(D, D)
            w[p + "mlp.gate_proj.weight"] = rand(64, D)
            w[p + "mlp.up_proj.weight"] = rand(64, D)
            w[p + "mlp.down_proj.weight"] = rand(D, 64)
        m = load_model_from_weights(cfg, w, jnp.float32)
        assert "mtp_layers" not in m.params["language_model"]["model"]
        assert len(_gen(m)) == 3


class TestApertus:
    def test_generate_and_xielu(self):
        from mlx_vlm_tpu.models.apertus import xielu

        rng = np.random.default_rng(7)

        def rand(*sh):
            return (rng.standard_normal(sh) * 0.08).astype(np.float32)

        D, V, hd = 32, 128, 8
        cfg = {"model_type": "apertus", "hidden_size": D,
               "num_hidden_layers": 2, "num_attention_heads": 4,
               "num_key_value_heads": 2, "intermediate_size": 64,
               "vocab_size": V, "rms_norm_eps": 1e-6}
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.norm.weight": np.ones(D, np.float32),
             "lm_head.weight": rand(V, D)}
        for i in range(2):
            p = f"model.layers.{i}."
            w[p + "attention_layernorm.weight"] = np.ones(D, np.float32)
            w[p + "feedforward_layernorm.weight"] = np.ones(D, np.float32)
            w[p + "self_attn.q_proj.weight"] = rand(D, D)
            w[p + "self_attn.k_proj.weight"] = rand(16, D)
            w[p + "self_attn.v_proj.weight"] = rand(16, D)
            w[p + "self_attn.o_proj.weight"] = rand(D, D)
            w[p + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
            w[p + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
            w[p + "mlp.up_proj.weight"] = rand(64, D)
            w[p + "mlp.down_proj.weight"] = rand(D, 64)
            w[p + "mlp.act_fn.alpha_p"] = np.asarray([0.54], np.float32)
            w[p + "mlp.act_fn.alpha_n"] = np.asarray([0.17], np.float32)
        m = load_model_from_weights(cfg, w, jnp.float32)
        assert len(_gen(m)) == 3
        # xielu semantics: positive branch quadratic, negative saturates
        x = jnp.asarray([-3.0, 0.0, 2.0])
        y = np.asarray(xielu(x, jnp.float32(0.54), jnp.float32(0.17)))
        ap = float(jax.nn.softplus(0.54))
        an = 0.5 + float(jax.nn.softplus(0.17))
        np.testing.assert_allclose(y[2], ap * 4 + 0.5 * 2, rtol=1e-5)
        np.testing.assert_allclose(
            y[0], (np.expm1(-3.0) + 3.0) * an + 0.5 * -3.0, rtol=1e-5)
