"""MiniCPM-V 4.6: bucketed-pos SigLIP + VitMerger/Merger over qwen3_5."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights

from test_qwen3_5 import tiny_qwen3_5_config, tiny_qwen3_5_weights


def tiny_cfg():
    q = tiny_qwen3_5_config()
    return {
        "model_type": "minicpmv4_6",
        "image_token_id": 64,
        "merger_times": 1,
        "text_config": q["text_config"],
        "vision_config": {
            "model_type": "siglip_vision_model",
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "image_size": 56,
            "patch_size": 14,
        },
    }


def weights(cfg, seed=0):
    rng = np.random.default_rng(seed + 5)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    base_cfg = tiny_qwen3_5_config()
    base_cfg["text_config"] = cfg["text_config"]
    w = {}
    for k, v in tiny_qwen3_5_weights(base_cfg).items():
        if k.startswith(("visual.", "model.visual.")):
            continue
        w[k] = v  # model.language_model.* / lm_head.* HF-style keys
    E, D = 32, cfg["text_config"]["hidden_size"]
    P = "vpm."
    w[P + "embeddings.patch_embedding.weight"] = rand(E, 3, 14, 14)
    w[P + "embeddings.patch_embedding.bias"] = rand(E)
    w[P + "embeddings.position_embedding.weight"] = rand(16, E)
    for i in range(2):
        q = P + f"encoder.layers.{i}."
        for nm in ("layer_norm1", "layer_norm2"):
            w[q + nm + ".weight"] = np.ones(E, np.float32)
            w[q + nm + ".bias"] = np.zeros(E, np.float32)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            w[q + f"self_attn.{nm}.weight"] = rand(E, E)
            w[q + f"self_attn.{nm}.bias"] = rand(E)
        w[q + "mlp.fc1.weight"] = rand(64, E)
        w[q + "mlp.fc1.bias"] = rand(64)
        w[q + "mlp.fc2.weight"] = rand(E, 64)
        w[q + "mlp.fc2.bias"] = rand(E)
    w[P + "post_layernorm.weight"] = np.ones(E, np.float32)
    w[P + "post_layernorm.bias"] = np.zeros(E, np.float32)
    # vit merger (group 2x2)
    gE = 4 * E
    w["vit_merger.pre_norm.weight"] = np.ones(gE, np.float32)
    w["vit_merger.pre_norm.bias"] = np.zeros(gE, np.float32)
    w["vit_merger.layer_norm1.weight"] = np.ones(E, np.float32)
    w["vit_merger.layer_norm1.bias"] = np.zeros(E, np.float32)
    for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
        w[f"vit_merger.self_attn.{nm}.weight"] = rand(E, E)
        w[f"vit_merger.self_attn.{nm}.bias"] = rand(E)
    w["vit_merger.linear_1.weight"] = rand(96, gE)
    w["vit_merger.linear_1.bias"] = rand(96)
    w["vit_merger.linear_2.weight"] = rand(E, 96)
    w["vit_merger.linear_2.bias"] = rand(E)
    # merger (1 block: 4E -> D)
    w["merger.mlp.0.pre_norm.weight"] = np.ones(gE, np.float32)
    w["merger.mlp.0.pre_norm.bias"] = np.zeros(gE, np.float32)
    w["merger.mlp.0.linear_1.weight"] = rand(gE, gE)
    w["merger.mlp.0.linear_1.bias"] = rand(gE)
    w["merger.mlp.0.linear_2.weight"] = rand(D, gE)
    w["merger.mlp.0.linear_2.bias"] = rand(D)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    return load_model_from_weights(cfg, weights(cfg), jnp.float32)


class TestMiniCPMV46:
    def test_position_buckets(self):
        from mlx_vlm_tpu.models.minicpmv4_6 import position_bucket_ids

        # native grid: identity buckets
        ids = position_bucket_ids(4, 4, 4)
        assert ids.tolist() == list(range(16))
        # half-res grid samples every other bucket
        ids2 = position_bucket_ids(2, 2, 4)
        assert ids2.tolist() == [0, 2, 8, 10]

    def test_image_generate(self, model):
        # 8x8 patches -> vit_merger 4x4 -> merger 2x2 = 4 image tokens
        ids = np.asarray([[1, 64, 64, 64, 64, 5]], np.int32)
        aux = model.vision_aux_inputs(np.asarray([[8, 8]]))
        px = np.random.default_rng(0).standard_normal(
            (1, 112, 112, 3)).astype(np.float32) * 0.1
        e = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), pixel_values=jnp.asarray(px),
            **{k: jnp.asarray(v) for k, v in aux.items()})
        plain = jax.jit(model.get_input_embeddings)(model.params,
                                                    jnp.asarray(ids))
        assert not np.allclose(np.asarray(e[0, 1]), np.asarray(plain[0, 1]))
        toks = [int(t[0]) for t, _ in generate_step(e, model,
                                                    max_tokens=3)]
        assert len(toks) == 3
