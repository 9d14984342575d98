"""PaddleOCR-VL: abs+rotary NaViT tower, sectioned M-RoPE decoder.

Contract parity: reference mlx_vlm/models/paddleocr_vl/ — bilinear pos
interpolation (vision.py:86), spatial-merge projector (vision.py:149),
sectioned_half_split M-RoPE == chunked t/h/w map (language.py:19), biased
attention projections.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_po_config():
    return {
        "model_type": "paddleocr_vl",
        "image_token_id": 250,
        "text_config": {
            "model_type": "ernie4_5",
            "hidden_size": 48,
            "num_hidden_layers": 2,
            "intermediate_size": 96,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "rms_norm_eps": 1e-5,
            "vocab_size": 256,
            "rope_theta": 10000.0,
            "use_bias": True,
            "rope_parameters": {"mrope_section": [2, 2, 2],
                                "rope_theta": 10000.0},
        },
        "vision_config": {
            "hidden_size": 16,
            "intermediate_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 2,
            "patch_size": 4,
            "image_size": 16,
            "spatial_merge_size": 2,
        },
    }


def tiny_po_weights(cfg, seed=0, scale=0.06):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    from mlx_vlm_tpu.utils.testing import llama_hf_weights

    tc, vc = cfg["text_config"], cfg["vision_config"]
    w = dict(llama_hf_weights(tc, seed, scale))
    # biased projections
    D = tc["hidden_size"]
    hd = D // tc["num_attention_heads"]
    for i in range(tc["num_hidden_layers"]):
        p = f"model.layers.{i}.self_attn."
        w[p + "q_proj.bias"] = rand(tc["num_attention_heads"] * hd)
        w[p + "k_proj.bias"] = rand(tc["num_key_value_heads"] * hd)
        w[p + "v_proj.bias"] = rand(tc["num_key_value_heads"] * hd)
        w[p + "o_proj.bias"] = rand(D)
    E, P = vc["hidden_size"], vc["patch_size"]
    edge = vc["image_size"] // P
    p = "visual."
    w[p + "embeddings.patch_embedding.weight"] = rand(E, 3, P, P)
    w[p + "embeddings.patch_embedding.bias"] = rand(E)
    w[p + "embeddings.position_embedding.weight"] = rand(edge * edge, E)
    w[p + "post_layernorm.weight"] = np.ones(E, np.float32)
    w[p + "post_layernorm.bias"] = np.zeros(E, np.float32)
    for i in range(vc["num_hidden_layers"]):
        q = p + f"encoder.layers.{i}."
        for nm in ("layer_norm1", "layer_norm2"):
            w[q + nm + ".weight"] = np.ones(E, np.float32)
            w[q + nm + ".bias"] = np.zeros(E, np.float32)
        w[q + "self_attn.qkv.weight"] = rand(3 * E, E)
        w[q + "self_attn.qkv.bias"] = rand(3 * E)
        w[q + "self_attn.out_proj.weight"] = rand(E, E)
        w[q + "self_attn.out_proj.bias"] = rand(E)
        w[q + "mlp.fc1.weight"] = rand(vc["intermediate_size"], E)
        w[q + "mlp.fc1.bias"] = rand(vc["intermediate_size"])
        w[q + "mlp.fc2.weight"] = rand(E, vc["intermediate_size"])
        w[q + "mlp.fc2.bias"] = rand(E)
    m = vc["spatial_merge_size"]
    w[p + "projector.pre_norm.weight"] = np.ones(E, np.float32)
    w[p + "projector.pre_norm.bias"] = np.zeros(E, np.float32)
    w[p + "projector.linear_1.weight"] = rand(m * m * E, m * m * E)
    w[p + "projector.linear_1.bias"] = rand(m * m * E)
    w[p + "projector.linear_2.weight"] = rand(D, m * m * E)
    w[p + "projector.linear_2.bias"] = rand(D)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_po_config()
    return load_model_from_weights(cfg, tiny_po_weights(cfg), jnp.float32)


class TestPaddleOCRVL:
    def test_mrope_sections_active(self, model):
        assert model.language_model.rope.mrope_sections == (2, 2, 2)

    def test_tower_merge_count(self, model):
        # 4x4 patches, merge 2 -> 4 tokens at text dim
        px = jnp.asarray(np.random.default_rng(0).standard_normal(
            (16, 3 * 4 * 4)), jnp.float32)
        feats = model.vision_tower(model.params["vision_tower"], px, (4, 4))
        assert feats.shape == (4, 48)
        assert np.isfinite(np.asarray(feats)).all()

    def test_merge_and_generate(self, model):
        n_img = 4
        ids = np.asarray([[1, 3] + [250] * n_img + [9]], np.int32)
        px = jnp.asarray(np.random.default_rng(1).standard_normal(
            (16, 3 * 4 * 4)), jnp.float32)
        emb = model.get_input_embeddings(model.params, jnp.asarray(ids),
                                         px, grid_hw=(4, 4))
        assert emb.shape == (1, 7, 48)
        pos, deltas = model.prepare_position_ids(
            ids, image_grid_thw=np.asarray([[1, 4, 4]]))
        assert pos.shape == (3, 1, 7)
        toks = [int(t[0]) for t, _ in generate_step(
            emb, model, position_ids=pos, rope_deltas=deltas, max_tokens=4)]
        toks2 = [int(t[0]) for t, _ in generate_step(
            emb, model, position_ids=pos, rope_deltas=deltas, max_tokens=4)]
        assert toks == toks2 and len(toks) == 4

    def test_pos_interp_identity_when_same_grid(self, model):
        vt = model.params["vision_tower"]
        out = model.vision_tower._interp_pos(vt, 4, 4)
        table = vt["embeddings"]["position_embedding"]["weight"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(table),
                                   rtol=1e-5, atol=1e-6)
