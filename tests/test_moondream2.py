"""Moondream2: phi-style parallel decoder + SigLIP-class tower.

Contract parity: reference mlx_vlm/models/moondream2/ — key remap
(moondream2.py:90), parallel residual block x + attn(ln(x)) + mlp(ln(x))
(language.py:68), partial rotary (language.py:26), BOS-first image merge
(moondream2.py:39), crop reconstruction (vision.py:103).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step, make_cache
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_moondream_config():
    return {
        "model_type": "moondream2",
        "eos_token_id": 0,
        "text_config": {
            "model_type": "moondream2",
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_hidden_layers": 2,
            "vocab_size": 96,
            "num_attention_heads": 4,
            "num_key_value_heads": 4,
            "partial_rotary_factor": 0.5,
        },
        "vision_config": {
            "hidden_size": 16,
            "intermediate_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 2,
            "patch_size": 4,
            "crop_size": 16,
            "overlap_margin": 1,
            "proj_inner_dim": 32,
            "proj_out_dim": 32,
        },
    }


def tiny_moondream_weights(cfg, seed=0, scale=0.08):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def ln(d):
        return {"weight": np.ones(d, np.float32),
                "bias": np.zeros(d, np.float32)}

    tc, vc = cfg["text_config"], cfg["vision_config"]
    D, V = tc["hidden_size"], tc["vocab_size"]
    w = {"text_model.transformer.embd.wte.weight": rand(V, D),
         "text_model.lm_head.linear.weight": rand(V, D),
         "text_model.lm_head.linear.bias": rand(V)}
    for kk, vv in ln(D).items():
        w[f"text_model.lm_head.ln.{kk}"] = vv
    hd = D // tc["num_attention_heads"]
    qkv_dim = (tc["num_attention_heads"]
               + 2 * tc["num_key_value_heads"]) * hd
    for i in range(tc["num_hidden_layers"]):
        p = f"text_model.transformer.h.{i}"
        for kk, vv in ln(D).items():
            w[f"{p}.ln.{kk}"] = vv
        w[f"{p}.mixer.Wqkv.weight"] = rand(qkv_dim, D)
        w[f"{p}.mixer.Wqkv.bias"] = rand(qkv_dim)
        w[f"{p}.mixer.out_proj.weight"] = rand(D, D)
        w[f"{p}.mixer.out_proj.bias"] = rand(D)
        w[f"{p}.mlp.fc1.weight"] = rand(tc["intermediate_size"], D)
        w[f"{p}.mlp.fc1.bias"] = rand(tc["intermediate_size"])
        w[f"{p}.mlp.fc2.weight"] = rand(D, tc["intermediate_size"])
        w[f"{p}.mlp.fc2.bias"] = rand(D)

    vd = vc["hidden_size"]
    P = vc["patch_size"]
    n_patch = (vc["crop_size"] // P) ** 2
    vb = "vision_encoder.encoder.model.visual"
    w[f"{vb}.patch_embed.linear.weight"] = rand(vd, 3 * P * P)
    w[f"{vb}.patch_embed.linear.bias"] = rand(vd)
    w[f"{vb}.pos_embed"] = rand(1, n_patch, vd)
    for kk, vv in ln(vd).items():
        w[f"{vb}.norm.{kk}"] = vv
    for i in range(vc["num_hidden_layers"]):
        p = f"{vb}.blocks.{i}"
        for nrm in ("norm1", "norm2"):
            for kk, vv in ln(vd).items():
                w[f"{p}.{nrm}.{kk}"] = vv
        w[f"{p}.attn.qkv.weight"] = rand(3 * vd, vd)
        w[f"{p}.attn.qkv.bias"] = rand(3 * vd)
        w[f"{p}.attn.proj.weight"] = rand(vd, vd)
        w[f"{p}.attn.proj.bias"] = rand(vd)
        w[f"{p}.mlp.fc1.weight"] = rand(vc["intermediate_size"], vd)
        w[f"{p}.mlp.fc1.bias"] = rand(vc["intermediate_size"])
        w[f"{p}.mlp.fc2.weight"] = rand(vd, vc["intermediate_size"])
        w[f"{p}.mlp.fc2.bias"] = rand(vd)
    w["vision_encoder.projection.mlp.fc1.weight"] = rand(
        vc["proj_inner_dim"], 2 * vd)
    w["vision_encoder.projection.mlp.fc1.bias"] = rand(vc["proj_inner_dim"])
    w["vision_encoder.projection.mlp.fc2.weight"] = rand(
        vc["proj_out_dim"], vc["proj_inner_dim"])
    w["vision_encoder.projection.mlp.fc2.bias"] = rand(vc["proj_out_dim"])
    # region_model keys must be dropped by sanitize
    w["region_model.dummy.weight"] = rand(2, 2)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_moondream_config()
    return load_model_from_weights(cfg, tiny_moondream_weights(cfg),
                                   jnp.float32)


class TestModel:
    def test_text_forward_and_cache_parity(self, model):
        S = 6
        ids = (np.arange(S, dtype=np.int32) * 5 % 90)[None]
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S)).copy()
        emb = model.get_input_embeddings(model.params, jnp.asarray(ids))
        # cache-free forward
        lg_full, _ = model(model.params, emb, None, jnp.asarray(pos))
        # cached forward over the same tokens
        cache = make_cache(model, 1, 32, jnp.float32)
        lg_cached, _ = model(model.params, emb, cache, jnp.asarray(pos))
        np.testing.assert_allclose(np.asarray(lg_full),
                                   np.asarray(lg_cached), rtol=2e-4,
                                   atol=2e-5)

    def test_partial_rotary_dims(self, model):
        lm = model.language_model
        assert lm.rope_dim == lm.head_dim // 2
        # relative-position sensitivity: widening the gap between two
        # tokens changes the second token's logits
        emb = model.get_input_embeddings(
            model.params, jnp.asarray([[7, 9]], jnp.int32))
        base = np.broadcast_to(np.asarray([0, 1], np.int32),
                               (3, 1, 2)).copy()
        gap = np.broadcast_to(np.asarray([0, 6], np.int32),
                              (3, 1, 2)).copy()
        lg_a, _ = model(model.params, emb, None, jnp.asarray(base))
        lg_b, _ = model(model.params, emb, None, jnp.asarray(gap))
        assert not np.allclose(np.asarray(lg_a[0, 1]),
                               np.asarray(lg_b[0, 1]))

    def test_image_merge_layout(self, model):
        # processor layout: [BOS, <img placeholders x16>, text...]
        n_img = 16
        ids = np.concatenate([[1], np.full(n_img, 2), [10, 11, 12]]).astype(
            np.int32)[None]
        px = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (1, 16, 16, 3)), jnp.float32)
        emb = model.get_input_embeddings(model.params,
                                         jnp.asarray(ids), px)
        assert emb.shape == (1, 1 + n_img + 3, 32)

    def test_greedy_generation(self, model):
        S = 5
        ids = (np.arange(S, dtype=np.int32) + 3)[None]
        emb = jax.jit(model.get_input_embeddings)(model.params,
                                                  jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(emb, model,
                                                    max_tokens=6)]
        assert len(toks) == 6
        toks2 = [int(t[0]) for t, _ in generate_step(emb, model,
                                                     max_tokens=6)]
        assert toks == toks2

    def test_sanitize_drops_region_model(self, model):
        assert "region_model" not in model.params


class TestCropReconstruction:
    def test_single_crop_identity(self, model):
        G = 4
        D = 8
        local = np.random.default_rng(1).standard_normal(
            (1, G * G, D)).astype(np.float32)
        out = model.vision.reconstruct_local(local, (1, 1))
        np.testing.assert_allclose(out, local[0], rtol=1e-6)

    def test_two_by_one_layout_shape(self, model):
        G = 4
        D = 8
        local = np.random.default_rng(2).standard_normal(
            (2, G * G, D)).astype(np.float32)
        out = model.vision.reconstruct_local(local, (2, 1))
        assert out.shape == (G * G, D)
        assert np.isfinite(out).all()
