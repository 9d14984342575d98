"""LFM2-VL: SigLIP2 NaViT tower + pixel unshuffle over the lfm2 hybrid."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from tests.test_lfm2 import tiny_lfm2_config, tiny_lfm2_weights


def tiny_lfm2vl_config():
    return {
        "model_type": "lfm2_vl",
        "image_token_index": 64,
        "downsample_factor": 2,
        "projector_hidden_size": 64,
        "text_config": tiny_lfm2_config(),
        "vision_config": {
            "model_type": "lfm2_vl",
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "patch_size": 16,
            "num_patches": 16,  # 4x4 base pos grid
        },
    }


def tiny_lfm2vl_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed + 3)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w = dict(tiny_lfm2_weights(cfg["text_config"], seed))
    vc = cfg["vision_config"]
    E, P = vc["hidden_size"], vc["patch_size"]
    p = "vision_tower."
    w[p + "embeddings.patch_embedding.weight"] = rand(E, 3 * P * P)
    w[p + "embeddings.patch_embedding.bias"] = rand(E)
    w[p + "embeddings.position_embedding.weight"] = rand(vc["num_patches"], E)
    w[p + "post_layernorm.weight"] = np.ones(E, np.float32)
    w[p + "post_layernorm.bias"] = np.zeros(E, np.float32)
    for i in range(vc["num_hidden_layers"]):
        q = p + f"encoder.layers.{i}."
        for nm in ("layer_norm1", "layer_norm2"):
            w[q + nm + ".weight"] = np.ones(E, np.float32)
            w[q + nm + ".bias"] = np.zeros(E, np.float32)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            w[q + f"self_attn.{nm}.weight"] = rand(E, E)
            w[q + f"self_attn.{nm}.bias"] = rand(E)
        w[q + "mlp.fc1.weight"] = rand(vc["intermediate_size"], E)
        w[q + "mlp.fc1.bias"] = rand(vc["intermediate_size"])
        w[q + "mlp.fc2.weight"] = rand(E, vc["intermediate_size"])
        w[q + "mlp.fc2.bias"] = rand(E)
    D = cfg["text_config"]["hidden_size"]
    ph = cfg["projector_hidden_size"]
    inp = E * 4
    w["multi_modal_projector.layer_norm.weight"] = np.ones(inp, np.float32)
    w["multi_modal_projector.layer_norm.bias"] = np.zeros(inp, np.float32)
    w["multi_modal_projector.linear_1.weight"] = rand(ph, inp)
    w["multi_modal_projector.linear_1.bias"] = rand(ph)
    w["multi_modal_projector.linear_2.weight"] = rand(D, ph)
    w["multi_modal_projector.linear_2.bias"] = rand(D)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_lfm2vl_config()
    return load_model_from_weights(cfg, tiny_lfm2vl_weights(cfg), jnp.float32)


class TestLfm2VL:
    def test_pixel_unshuffle_shapes(self):
        from mlx_vlm_tpu.models.lfm2_vl.lfm2_vl import pixel_unshuffle

        x = jnp.arange(4 * 6 * 2, dtype=jnp.float32).reshape(24, 2)
        y = pixel_unshuffle(x, 4, 6, 2)
        assert y.shape == (6, 8)
        assert set(np.asarray(y).ravel().tolist()) == set(
            np.asarray(x).ravel().tolist())

    def test_image_generate(self, model):
        # one image with a 4x4 patch grid -> unshuffle 2 -> 4 tokens
        ids = np.asarray([[1, 64, 64, 64, 64, 2]], np.int32)
        aux = model.vision_aux_inputs(np.asarray([[4, 4]]))
        P = model.config.vision_config.patch_size
        rng = np.random.default_rng(0)
        pixels = rng.standard_normal((16, 3 * P * P)).astype(np.float32) * 0.05
        embeds = jax.jit(
            model.get_input_embeddings, static_argnames=("spatial_shapes",)
        )(model.params, jnp.asarray(ids),
          pixel_values=jnp.asarray(pixels),
          segment_ids=jnp.asarray(aux["segment_ids"]),
          pos_idx=jnp.asarray(aux["pos_idx"]),
          pos_weights=jnp.asarray(aux["pos_weights"]),
          spatial_shapes=aux["spatial_shapes"])
        plain = jax.jit(model.get_input_embeddings)(model.params,
                                                    jnp.asarray(ids))
        assert not np.allclose(np.asarray(embeds[0, 1]), np.asarray(plain[0, 1]))
        toks = [int(t[0]) for t, _ in generate_step(embeds, model,
                                                    max_tokens=3)]
        assert len(toks) == 3

    def test_text_only(self, model):
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=3)]
        assert len(toks) == 3
