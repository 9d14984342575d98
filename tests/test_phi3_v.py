"""Phi-3-Vision: HD transform shapes, negative-id merge, fused split."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_phi3v_config():
    return {
        "model_type": "phi3_v",
        "hidden_size": 48,
        "num_hidden_layers": 2,
        "intermediate_size": 96,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "rms_norm_eps": 1e-5,
        "vocab_size": 256,
        "rope_theta": 10000.0,
        "max_position_embeddings": 2048,
        "original_max_position_embeddings": 1024,
        "rope_scaling": {
            "type": "su",
            "short_factor": [1.0] * 6,
            "long_factor": [1.5] * 6,
        },
        "vision_config": {
            "model_type": "clip_vision_model",
            "num_hidden_layers": 2,
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_attention_heads": 4,
            "image_size": 56,  # H = 4 patches per side
            "patch_size": 14,
        },
    }


def tiny_phi3v_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    D, V, I = cfg["hidden_size"], cfg["vocab_size"], cfg["intermediate_size"]
    nh, nkv = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    hd = D // nh
    w = {
        "model.embed_tokens.weight": rand(V, D),
        "model.norm.weight": np.ones(D, np.float32),
        "lm_head.weight": rand(V, D),
    }
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.qkv_proj.weight"] = rand((nh + 2 * nkv) * hd, D)
        w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
        w[p + "mlp.gate_up_proj.weight"] = rand(2 * I, D)
        w[p + "mlp.down_proj.weight"] = rand(D, I)
    vc = cfg["vision_config"]
    E, P = vc["hidden_size"], vc["patch_size"]
    n_pos = (vc["image_size"] // P) ** 2 + 1
    p = "model.vision_embed_tokens.img_processor.vision_model."
    w[p + "embeddings.class_embedding"] = rand(E)
    w[p + "embeddings.patch_embedding.weight"] = rand(E, 3, P, P)
    w[p + "embeddings.position_embedding.weight"] = rand(n_pos, E)
    w[p + "pre_layrnorm.weight"] = np.ones(E, np.float32)
    w[p + "pre_layrnorm.bias"] = np.zeros(E, np.float32)
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
    ve = "model.vision_embed_tokens."
    w[ve + "glb_GN"] = rand(1, 1, 4 * E)
    w[ve + "sub_GN"] = rand(1, 1, 1, 4 * E)
    w[ve + "img_projection.0.weight"] = rand(D, 4 * E)
    w[ve + "img_projection.0.bias"] = rand(D)
    w[ve + "img_projection.2.weight"] = rand(D, D)
    w[ve + "img_projection.2.bias"] = rand(D)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_phi3v_config()
    return load_model_from_weights(cfg, tiny_phi3v_weights(cfg, 6), jnp.float32)


class TestPhi3V:
    def test_image_merge_and_generate(self, model):
        # 1x1 tile grid with H=4: tokens = (1*1+1)*4 + 1 + (1+1)*2 = 13
        h, w = 1, 1
        H2 = 2
        cnt = (h * w + 1) * (H2 * H2) + 1 + (h + 1) * H2
        ids = np.asarray([[1] + [-1] * cnt + [2]], np.int32)
        rng = np.random.default_rng(0)
        pixels = rng.standard_normal((2, 3, 56, 56)).astype(np.float32) * 0.1
        embeds = jax.jit(
            model.get_input_embeddings, static_argnames=("image_tiles",)
        )(model.params, jnp.asarray(ids), pixel_values=jnp.asarray(pixels),
          image_tiles=((1, 1),))
        assert embeds.shape == (1, cnt + 2, 48)
        plain = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(np.maximum(ids, 0))
        )
        assert not np.allclose(np.asarray(embeds[0, 1]), np.asarray(plain[0, 1]))
        np.testing.assert_allclose(np.asarray(embeds[0, 0]),
                                   np.asarray(plain[0, 0]), atol=1e-6)
        toks = [int(t[0]) for t, _ in generate_step(embeds, model,
                                                    max_tokens=3)]
        assert len(toks) == 3

    def test_su_rope_scaling_applied(self, model):
        r = model.language_model.rope
        assert r.attention_scaling > 1.0  # mscale from max/orig = 2

    def test_text_only(self, model):
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=3)]
        assert len(toks) == 3
