"""Youtu-VL: SigLIP2 NaViT (linear patch embed, 2-D rope) + MLA MoE."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights

from test_deepseek_v2 import tiny_dsv2_config, tiny_dsv2_weights


def tiny_cfg():
    text = tiny_dsv2_config()
    text["model_type"] = "youtu_vl"
    text["topk_method"] = "noaux_tc"
    text["n_group"] = 2
    text["topk_group"] = 1
    text["norm_topk_prob"] = True
    return {
        "model_type": "youtu_vl",
        "image_token_id": 64,
        "video_token_id": 65,
        "text_config": text,
        "vision_config": {
            "model_type": "siglip2_vision_model",
            "hidden_size": 32,
            "out_hidden_size": text["hidden_size"],
            "intermediate_size": 64,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "patch_size": 14,
            "spatial_merge_size": 2,
        },
    }


def weights(cfg, seed=0):
    rng = np.random.default_rng(seed + 31)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.05).astype(np.float32)

    w = {}
    tw = tiny_dsv2_weights(cfg["text_config"], seed)
    for k, v in tw.items():
        w[k] = v  # model./lm_head. prefixes; sanitize maps them
    # noaux gate needs correction bias
    tc = cfg["text_config"]
    for i in range(tc["first_k_dense_replace"], tc["num_hidden_layers"]):
        w[f"model.layers.{i}.mlp.gate.e_score_correction_bias"] = np.zeros(
            tc["n_routed_experts"], np.float32)
    vc = cfg["vision_config"]
    E, I = vc["hidden_size"], vc["intermediate_size"]
    P = vc["patch_size"]
    p = "siglip2.vision_model."
    w[p + "embeddings.patch_embedding.weight"] = rand(E, 3 * P * P)
    w[p + "embeddings.patch_embedding.bias"] = rand(E)
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
    w[p + "post_layernorm.weight"] = np.ones(E, np.float32)
    w[p + "post_layernorm.bias"] = np.zeros(E, np.float32)
    hm = E * 4
    D = cfg["text_config"]["hidden_size"]
    w["merger.ln_q.weight"] = np.ones(E, np.float32)
    w["merger.mlp.0.weight"] = rand(hm, hm)
    w["merger.mlp.0.bias"] = rand(hm)
    w["merger.mlp.2.weight"] = rand(D, hm)
    w["merger.mlp.2.bias"] = rand(D)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    return load_model_from_weights(cfg, weights(cfg), jnp.float32)


class TestYoutuVL:
    def test_image_generate(self, model):
        ids = np.asarray([[1, 64, 64, 64, 64, 2]], np.int32)
        grid = np.asarray([[1, 4, 4]])
        aux = model.vision_aux_inputs(grid)
        rng = np.random.default_rng(0)
        px = rng.standard_normal((16, 3 * 14 * 14)).astype(np.float32) * 0.05
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), pixel_values=jnp.asarray(px),
            **{k: jnp.asarray(v) for k, v in aux.items()})
        plain = jax.jit(model.get_input_embeddings)(model.params,
                                                    jnp.asarray(ids))
        assert not np.allclose(np.asarray(embeds[0, 1]),
                               np.asarray(plain[0, 1]))
        toks = [int(t[0]) for t, _ in generate_step(embeds, model,
                                                    max_tokens=3)]
        assert len(toks) == 3

    def test_segments_isolate_images(self, model):
        """Two packed images: features of image 0 must not change when
        image 1's pixels change (block-diagonal attention)."""
        rng = np.random.default_rng(2)
        px0 = rng.standard_normal((16, 588)).astype(np.float32) * 0.05
        pxA = rng.standard_normal((16, 588)).astype(np.float32) * 0.05
        pxB = rng.standard_normal((16, 588)).astype(np.float32) * 0.05
        aux = model.vision_aux_inputs(np.asarray([[1, 4, 4], [1, 4, 4]]))
        aux = {k: jnp.asarray(v) for k, v in aux.items()}
        fA = model.vision_features(model.params,
                                   jnp.asarray(np.concatenate([px0, pxA])),
                                   **aux)
        fB = model.vision_features(model.params,
                                   jnp.asarray(np.concatenate([px0, pxB])),
                                   **aux)
        np.testing.assert_allclose(np.asarray(fA[:4]), np.asarray(fB[:4]),
                                   atol=1e-5)
        assert not np.allclose(np.asarray(fA[4:]), np.asarray(fB[4:]))
