"""Idefics2: perceiver resampler + SigLIP tower + mistral decoder.

Contract parity: reference mlx_vlm/models/idefics2/ — 64-latent resampler
(idefics2.py:122, latents query [context|latents]), SwiGLU modality
projection (:157), image features replace <image> ids, key remap (:303).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_idefics2_config():
    return {
        "model_type": "idefics2",
        "image_token_id": 77,
        "text_config": {
            "model_type": "mistral",
            "hidden_size": 48,
            "num_hidden_layers": 2,
            "intermediate_size": 96,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "rms_norm_eps": 1e-5,
            "vocab_size": 256,
            "rope_theta": 10000.0,
        },
        "vision_config": {
            "model_type": "idefics2_vision",
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "intermediate_size": 64,
            "num_attention_heads": 4,
            "image_size": 56,
            "patch_size": 14,
        },
        "perceiver_config": {
            "model_type": "idefics2_perceiver",
            "num_key_value_heads": 2,
            "resampler_depth": 2,
            "resampler_head_dim": 12,
            "resampler_n_heads": 4,
            "resampler_n_latents": 4,
        },
    }


def tiny_idefics2_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    from mlx_vlm_tpu.utils.testing import llama_hf_weights

    tc, vc, pc = (cfg["text_config"], cfg["vision_config"],
                  cfg["perceiver_config"])
    D = tc["hidden_size"]
    w = {}
    for k, v in llama_hf_weights(tc, seed, scale).items():
        if k.startswith("model."):
            w["model.text_model." + k[len("model."):]] = v
        else:
            w[k] = v
    E, P, I = vc["hidden_size"], vc["patch_size"], vc["intermediate_size"]
    n_pos = (vc["image_size"] // P) ** 2
    p = "model.vision_model."
    w[p + "embeddings.patch_embedding.weight"] = rand(E, 3, P, P)
    w[p + "embeddings.patch_embedding.bias"] = rand(E)
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
    # connector: modality projection (vision E -> text D, swiglu through
    # text intermediate) + perceiver
    cp = "model.connector."
    w[cp + "modality_projection.gate_proj.weight"] = rand(
        tc["intermediate_size"], E)
    w[cp + "modality_projection.up_proj.weight"] = rand(
        tc["intermediate_size"], E)
    w[cp + "modality_projection.down_proj.weight"] = rand(
        D, tc["intermediate_size"])
    w[cp + "perceiver_resampler.latents"] = rand(
        pc["resampler_n_latents"], D)
    w[cp + "perceiver_resampler.norm.weight"] = np.ones(D, np.float32)
    hd, nh, nkv = (pc["resampler_head_dim"], pc["resampler_n_heads"],
                   pc["num_key_value_heads"])
    for i in range(pc["resampler_depth"]):
        q = cp + f"perceiver_resampler.layers.{i}."
        for nm in ("input_latents_norm", "input_context_norm",
                   "post_attention_layernorm"):
            w[q + nm + ".weight"] = np.ones(D, np.float32)
        w[q + "self_attn.q_proj.weight"] = rand(nh * hd, D)
        w[q + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
        w[q + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
        w[q + "self_attn.o_proj.weight"] = rand(D, nh * hd)
        w[q + "mlp.gate_proj.weight"] = rand(4 * D, D)
        w[q + "mlp.up_proj.weight"] = rand(4 * D, D)
        w[q + "mlp.down_proj.weight"] = rand(D, 4 * D)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_idefics2_config()
    return load_model_from_weights(cfg, tiny_idefics2_weights(cfg),
                                   jnp.float32)


class TestIdefics2:
    def test_resampler_fixed_output_length(self, model):
        px = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (1, 3, 56, 56)), jnp.float32)
        feats = model.vision_features(model.params, px)
        # 4 latents regardless of the 16 input patches
        assert feats.shape == (4, 48)

    def test_image_merge_and_generate(self, model):
        ids = np.asarray([[1, 5] + [77] * 4 + [9, 2]], np.int32)
        px = jnp.asarray(np.random.default_rng(1).uniform(
            0, 1, (1, 3, 56, 56)), jnp.float32)
        emb = model.get_input_embeddings(model.params, jnp.asarray(ids), px)
        assert emb.shape == (1, 8, 48)
        toks = [int(t[0]) for t, _ in generate_step(emb, model,
                                                    max_tokens=4)]
        assert len(toks) == 4

    def test_image_features_affect_output(self, model):
        ids = np.asarray([[1, 5] + [77] * 4 + [9, 2]], np.int32)
        rng = np.random.default_rng
        px_a = jnp.asarray(rng(1).uniform(0, 1, (1, 3, 56, 56)), jnp.float32)
        px_b = jnp.asarray(rng(2).uniform(0, 1, (1, 3, 56, 56)), jnp.float32)
        ea = model.get_input_embeddings(model.params, jnp.asarray(ids), px_a)
        eb = model.get_input_embeddings(model.params, jnp.asarray(ids), px_b)
        assert not np.allclose(np.asarray(ea), np.asarray(eb))
        # text positions identical
        np.testing.assert_allclose(np.asarray(ea[:, :2]),
                                   np.asarray(eb[:, :2]))

    def test_stacked_resampler_layers(self, model):
        lat = model.params["connector"]["perceiver_resampler"]
        assert lat["layers"]["self_attn"]["q_proj"]["weight"].shape[0] == 2
