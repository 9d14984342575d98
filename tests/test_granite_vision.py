"""Granite Vision: multi-layer feature concat + granite decoder.

Contract parity: reference mlx_vlm/models/granite_vision/ — projector over
hidden_size * len(vision_feature_layer) (granite_vision.py:14), default
strategy drops CLS per layer (:96), granite text decoder.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_gv_config():
    return {
        "model_type": "granite_vision",
        "image_token_index": 77,
        "vision_feature_layer": [-1, -2],
        "text_config": {
            "model_type": "granite",
            "hidden_size": 48,
            "num_hidden_layers": 2,
            "intermediate_size": 96,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "rms_norm_eps": 1e-5,
            "vocab_size": 256,
            "rope_theta": 10000.0,
            "logits_scaling": 8.0,
            "embedding_multiplier": 12.0,
            "residual_multiplier": 0.22,
            "attention_multiplier": 0.0078125,
        },
        "vision_config": {
            "model_type": "granite_vision",
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "intermediate_size": 64,
            "num_attention_heads": 4,
            "image_size": 56,
            "patch_size": 14,
        },
    }


def tiny_gv_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    from mlx_vlm_tpu.utils.testing import llama_hf_weights

    tc, vc = cfg["text_config"], cfg["vision_config"]
    w = dict(llama_hf_weights(tc, seed, scale))
    E, P, I = vc["hidden_size"], vc["patch_size"], vc["intermediate_size"]
    n_pos = (vc["image_size"] // P) ** 2  # siglip: no CLS
    p = "vision_tower.vision_model."
    w[p + "embeddings.patch_embedding.weight"] = rand(E, 3, P, P)
    w[p + "embeddings.position_embedding.weight"] = rand(n_pos, E)
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
        w[q + "mlp.fc1.weight"] = rand(I, E)
        w[q + "mlp.fc1.bias"] = rand(I)
        w[q + "mlp.fc2.weight"] = rand(E, I)
        w[q + "mlp.fc2.bias"] = rand(E)
    D = tc["hidden_size"]
    w["multi_modal_projector.linear_1.weight"] = rand(D, 2 * E)
    w["multi_modal_projector.linear_1.bias"] = rand(D)
    w["multi_modal_projector.linear_2.weight"] = rand(D, D)
    w["multi_modal_projector.linear_2.bias"] = rand(D)
    w["image_newline"] = rand(D)  # dropped by sanitize
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_gv_config()
    return load_model_from_weights(cfg, tiny_gv_weights(cfg), jnp.float32)


class TestGraniteVision:
    def test_multi_layer_features(self, model):
        px = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (1, 3, 56, 56)), jnp.float32)
        feats = model.vision_features(model.params, px)
        assert feats.shape == (16, 48)  # 16 patches, strategy "full"

    def test_merge_and_generate(self, model):
        ids = np.asarray([[1, 5] + [77] * 16 + [9]], np.int32)
        px = jnp.asarray(np.random.default_rng(1).uniform(
            0, 1, (1, 3, 56, 56)), jnp.float32)
        emb = model.get_input_embeddings(model.params, jnp.asarray(ids), px)
        assert emb.shape == (1, 19, 48)
        toks = [int(t[0]) for t, _ in generate_step(emb, model,
                                                    max_tokens=4)]
        assert len(toks) == 4

    def test_image_newline_dropped(self, model):
        assert "image_newline" not in model.params
