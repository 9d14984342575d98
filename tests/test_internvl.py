"""InternVL-Chat: InternViT layer scales, pixel shuffle, qwen2 LLM merge."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_internvl_config():
    return {
        "model_type": "internvl_chat",
        "image_token_index": 64,
        "downsample_ratio": 0.5,
        "llm_config": {
            "model_type": "qwen2",
            "hidden_size": 48,
            "num_hidden_layers": 2,
            "intermediate_size": 96,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "rms_norm_eps": 1e-6,
            "vocab_size": 256,
            "rope_theta": 10000.0,
            "attention_bias": True,
        },
        "vision_config": {
            "model_type": "intern_vit_6b",
            "hidden_size": 32,
            "num_attention_heads": 4,
            "patch_size": 14,
            "num_hidden_layers": 2,
            "intermediate_size": 64,
            "image_size": 56,  # 4x4 grid -> shuffle 2x2 -> 4 tokens/tile
            "qkv_bias": True,
            "qk_normalization": True,
            "norm_type": "rms_norm",
        },
    }


def tiny_internvl_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    from mlx_vlm_tpu.utils.testing import llama_hf_weights

    tc, vc = cfg["llm_config"], cfg["vision_config"]
    w = {
        "language_model." + k: v
        for k, v in llama_hf_weights(tc, seed, scale).items()
    }
    E, P = vc["hidden_size"], vc["patch_size"]
    n_pos = (vc["image_size"] // P) ** 2 + 1
    p = "vision_model."
    w[p + "embeddings.class_embedding"] = rand(1, 1, E)
    w[p + "embeddings.patch_embedding.weight"] = rand(E, 3, P, P)
    w[p + "embeddings.patch_embedding.bias"] = rand(E)
    w[p + "embeddings.position_embedding"] = rand(1, n_pos, E)
    for i in range(vc["num_hidden_layers"]):
        q = p + f"encoder.layers.{i}."
        w[q + "norm1.weight"] = np.ones(E, np.float32)
        w[q + "norm2.weight"] = np.ones(E, np.float32)
        w[q + "ls1"] = np.full(E, 0.9, np.float32)
        w[q + "ls2"] = np.full(E, 0.9, np.float32)
        w[q + "attn.qkv.weight"] = rand(3 * E, E)
        w[q + "attn.qkv.bias"] = rand(3 * E)
        w[q + "attn.q_norm.weight"] = np.ones(E, np.float32)
        w[q + "attn.k_norm.weight"] = np.ones(E, np.float32)
        w[q + "attn.proj.weight"] = rand(E, E)
        w[q + "attn.proj.bias"] = rand(E)
        w[q + "mlp.fc1.weight"] = rand(vc["intermediate_size"], E)
        w[q + "mlp.fc1.bias"] = rand(vc["intermediate_size"])
        w[q + "mlp.fc2.weight"] = rand(E, vc["intermediate_size"])
        w[q + "mlp.fc2.bias"] = rand(E)
    D = tc["hidden_size"]
    Ein = E * 4  # downsample 0.5 -> channels x4
    w["mlp1.0.weight"] = np.ones(Ein, np.float32)
    w["mlp1.0.bias"] = np.zeros(Ein, np.float32)
    w["mlp1.1.weight"] = rand(D, Ein)
    w["mlp1.1.bias"] = rand(D)
    w["mlp1.3.weight"] = rand(D, D)
    w["mlp1.3.bias"] = rand(D)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_internvl_config()
    return load_model_from_weights(cfg, tiny_internvl_weights(cfg), jnp.float32)


class TestPixelShuffle:
    def test_shapes_and_locality(self):
        from mlx_vlm_tpu.models.internvl_chat.internvl_chat import (
            pixel_shuffle_internvl,
        )

        x = jnp.arange(1 * 16 * 8, dtype=jnp.float32).reshape(1, 16, 8)
        y = pixel_shuffle_internvl(x, 0.5)
        assert y.shape == (1, 4, 32)
        # every output channel-group comes from the original tensor
        assert set(np.asarray(y).ravel().tolist()) == set(
            np.asarray(x).ravel().tolist()
        )


class TestInternVL:
    def test_image_generate(self, model):
        # 1 tile of 56x56 -> 16 patches -> 4 merged tokens
        ids = np.asarray([[1, 64, 64, 64, 64, 2]], np.int32)
        rng = np.random.default_rng(0)
        pixels = rng.standard_normal((1, 3, 56, 56)).astype(np.float32) * 0.1
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), pixel_values=jnp.asarray(pixels)
        )
        assert embeds.shape == (1, 6, 48)
        plain = jax.jit(model.get_input_embeddings)(model.params,
                                                    jnp.asarray(ids))
        assert not np.allclose(np.asarray(embeds[0, 1]), np.asarray(plain[0, 1]))
        np.testing.assert_allclose(np.asarray(embeds[0, 0]),
                                   np.asarray(plain[0, 0]), atol=1e-6)
        toks = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=3)]
        assert len(toks) == 3

    def test_multi_tile(self, model):
        ids = np.asarray([[1] + [64] * 8 + [2]], np.int32)
        rng = np.random.default_rng(1)
        pixels = rng.standard_normal((2, 3, 56, 56)).astype(np.float32) * 0.1
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), pixel_values=jnp.asarray(pixels)
        )
        assert embeds.shape == (1, 10, 48)
