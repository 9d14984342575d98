"""Aya Vision: parallel-residual cohere decoder, NoPE globals, SwiGLU adapter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step, make_cache
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_aya_config():
    return {
        "model_type": "aya_vision",
        "image_token_index": 64,
        "downsample_factor": 2,
        "alignment_intermediate_size": 64,
        "text_config": {
            "model_type": "cohere2",
            "hidden_size": 48,
            "head_dim": 12,
            "num_hidden_layers": 4,
            "intermediate_size": 96,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "rope_theta": 10000.0,
            "vocab_size": 256,
            "logit_scale": 0.5,
            "sliding_window": 4,
            "sliding_window_pattern": 2,
            "tie_word_embeddings": True,
        },
        "vision_config": {
            "model_type": "siglip_vision_model",
            "num_hidden_layers": 2,
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_attention_heads": 4,
            "image_size": 28,  # 2x2 patches -> shuffle -> 1 token
            "patch_size": 14,
        },
    }


def tiny_aya_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tc, vc = cfg["text_config"], cfg["vision_config"]
    D, V, I = tc["hidden_size"], tc["vocab_size"], tc["intermediate_size"]
    nh, nkv, hd = (tc["num_attention_heads"], tc["num_key_value_heads"],
                   tc["head_dim"])
    w = {
        "language_model.model.embed_tokens.weight": rand(V, D),
        "language_model.model.norm.weight": np.ones(D, np.float32),
    }
    for i in range(tc["num_hidden_layers"]):
        p = f"language_model.model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.q_proj.weight"] = rand(nh * hd, D)
        w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
        w[p + "mlp.gate_proj.weight"] = rand(I, D)
        w[p + "mlp.up_proj.weight"] = rand(I, D)
        w[p + "mlp.down_proj.weight"] = rand(D, I)
    E, P = vc["hidden_size"], vc["patch_size"]
    n_pos = (vc["image_size"] // P) ** 2
    p = "vision_tower.vision_model."
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
        w[q + "mlp.fc1.weight"] = rand(vc["intermediate_size"], E)
        w[q + "mlp.fc1.bias"] = rand(vc["intermediate_size"])
        w[q + "mlp.fc2.weight"] = rand(E, vc["intermediate_size"])
        w[q + "mlp.fc2.bias"] = rand(E)
    shuf = E * cfg["downsample_factor"] ** 2
    ai = cfg["alignment_intermediate_size"]
    w["multi_modal_projector.layernorm.weight"] = np.ones(shuf, np.float32)
    w["multi_modal_projector.layernorm.bias"] = np.zeros(shuf, np.float32)
    w["multi_modal_projector.linear_1.weight"] = rand(ai, shuf)
    w["multi_modal_projector.linear_1.bias"] = rand(ai)
    w["multi_modal_projector.linear_2.weight"] = rand(D, ai // 2)
    w["multi_modal_projector.linear_2.bias"] = rand(D)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_aya_config()
    return load_model_from_weights(cfg, tiny_aya_weights(cfg), jnp.float32)


class TestAyaVision:
    def test_logit_scale_applied(self, model):
        ids = (np.arange(5, dtype=np.int32) % 200)[None]
        e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        cache = make_cache(model, 1, 16, jnp.float32)
        pos = np.broadcast_to(np.arange(5, dtype=np.int32), (3, 1, 5)).copy()
        l1, _ = model(model.params, e, cache, jnp.asarray(pos))
        # halving logit_scale must halve the logits
        model.language_model.args.logit_scale = 0.25
        cache = make_cache(model, 1, 16, jnp.float32)
        l2, _ = model(model.params, e, cache, jnp.asarray(pos))
        model.language_model.args.logit_scale = 0.5
        np.testing.assert_allclose(np.asarray(l1), 2 * np.asarray(l2),
                                   atol=1e-5)

    def test_image_generate(self, model):
        ids = np.asarray([[1, 64, 2]], np.int32)
        pixels = np.random.default_rng(0).standard_normal(
            (1, 3, 28, 28)).astype(np.float32) * 0.1
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), pixel_values=jnp.asarray(pixels)
        )
        plain = jax.jit(model.get_input_embeddings)(model.params,
                                                    jnp.asarray(ids))
        assert not np.allclose(np.asarray(embeds[0, 1]), np.asarray(plain[0, 1]))
        toks = [int(t[0]) for t, _ in generate_step(embeds, model,
                                                    max_tokens=3)]
        assert len(toks) == 3

    def test_prefill_matches_stepwise(self, model):
        S = 6
        ids = (np.arange(S, dtype=np.int32) * 11 % 200)[None]
        e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S)).copy()
        cache = make_cache(model, 1, 16, jnp.float32)
        lf, _ = model(model.params, e, cache, jnp.asarray(pos))
        cache2 = make_cache(model, 1, 16, jnp.float32)
        for t in range(S):
            p = np.full((3, 1, 1), t, np.int32)
            lg, cache2 = model(model.params, e[:, t:t + 1], cache2,
                               jnp.asarray(p))
        np.testing.assert_allclose(np.asarray(lf[0, -1]), np.asarray(lg[0, 0]),
                                   atol=2e-4, rtol=1e-3)
