"""Hunyuan-VL: XD-RoPE decoder + anyres tower with conv patch merger.

Contract parity: reference mlx_vlm/models/hunyuan_vl/ — xdrope section
selection (language.py:62: all-equal streams == standard rope, so decode
needs no branch), xdrope position builder (language.py:365), patch merger
newline/begin/end layout (vision.py:196: T = mh*(mw+1) + 2).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.models.hunyuan_vl.hunyuan_vl import XDRope
from mlx_vlm_tpu.utils.loader import load_model_from_weights


class TestXDRope:
    def test_equal_streams_match_standard_rope(self):
        from mlx_vlm_tpu.core.rope import make_rope

        hd = 16
        xd = XDRope(hd, 10000.0, (2, 2, 2, 2))
        std = make_rope(hd, 10000.0)
        pos = jnp.asarray(np.arange(5)[None], jnp.int32)  # [B, S]
        pos4 = jnp.broadcast_to(pos[None], (4, 1, 5))
        cx, sx = xd.cos_sin(pos4)
        cs, ss = std.cos_sin(pos)
        np.testing.assert_allclose(np.asarray(cx), np.asarray(cs),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sx), np.asarray(ss),
                                   rtol=1e-6)

    def test_streams_select_sections(self):
        hd = 16
        xd = XDRope(hd, 10000.0, (2, 2, 2, 2))
        # stream 1 differs -> only its section (dims 2:4 of half-dim) moves
        pos = np.zeros((4, 1, 1), np.int32)
        pos_b = pos.copy()
        pos_b[1] = 7
        ca, _ = xd.cos_sin(jnp.asarray(pos))
        cb, _ = xd.cos_sin(jnp.asarray(pos_b))
        ca, cb = np.asarray(ca)[0, 0], np.asarray(cb)[0, 0]
        assert np.allclose(ca[:2], cb[:2])
        assert not np.allclose(ca[2:4], cb[2:4])
        assert np.allclose(ca[4:], cb[4:])


def tiny_hy_config():
    return {
        "model_type": "hunyuan_vl",
        "image_token_id": 250,
        "text_config": {
            "model_type": "hunyuan_vl_text",
            "hidden_size": 48,
            "num_hidden_layers": 2,
            "intermediate_size": 96,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "rms_norm_eps": 1e-5,
            "vocab_size": 256,
            "rope_theta": 10000.0,
            "use_qk_norm": True,
            "rope_scaling": {"type": "xdrope", "alpha": 1.0,
                             "xdrope_section": [2, 2, 1, 1]},
        },
        "vision_config": {
            "model_type": "hunyuan_vl_vision",
            "hidden_size": 16,
            "intermediate_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 2,
            "patch_size": 4,
            "max_image_size": 16,
            "spatial_merge_size": 2,
            "out_hidden_size": 48,
        },
    }


def tiny_hy_weights(cfg, seed=0, scale=0.06):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    from mlx_vlm_tpu.utils.testing import llama_hf_weights

    tc, vc = cfg["text_config"], cfg["vision_config"]
    w = {}
    for k, v in llama_hf_weights(tc, seed, scale).items():
        w[k] = v
    hd = tc["hidden_size"] // tc["num_attention_heads"]
    for i in range(tc["num_hidden_layers"]):
        w[f"model.layers.{i}.self_attn.query_layernorm.weight"] = np.ones(
            hd, np.float32)
        w[f"model.layers.{i}.self_attn.key_layernorm.weight"] = np.ones(
            hd, np.float32)
    E, P = vc["hidden_size"], vc["patch_size"]
    edge = vc["max_image_size"] // P
    p = "vision_model."
    w[p + "embeddings.patch_embedding.weight"] = rand(E, 3, P, P)
    w[p + "embeddings.patch_embedding.bias"] = rand(E)
    w[p + "embeddings.position_embedding.weight"] = rand(edge * edge + 1, E)
    for i in range(vc["num_hidden_layers"]):
        q = p + f"layers.{i}."
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
    sm = vc["spatial_merge_size"]
    mh2, fh = 2 * E, 4 * E
    D = vc["out_hidden_size"]
    pm = p + "perceive."
    w[pm + "before_rms.weight"] = np.ones(E, np.float32)
    w[pm + "after_rms.weight"] = np.ones(D, np.float32)
    w[pm + "proj.0.weight"] = rand(mh2, E, sm, sm)
    w[pm + "proj.0.bias"] = rand(mh2)
    w[pm + "proj.2.weight"] = rand(fh, mh2, 1, 1)
    w[pm + "proj.2.bias"] = rand(fh)
    w[pm + "mlp.weight"] = rand(D, fh)
    w[pm + "mlp.bias"] = rand(D)
    w[pm + "image_newline"] = rand(fh)
    w[pm + "image_begin"] = rand(D)
    w[pm + "image_end"] = rand(D)
    w[pm + "image_sep"] = rand(D)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_hy_config()
    return load_model_from_weights(cfg, tiny_hy_weights(cfg), jnp.float32)


class TestHunyuanVL:
    def test_tower_token_count(self, model):
        # 4x4 grid, merge 2 -> mh=mw=2 -> 2*(2+1) + begin + end = 8 tokens
        px = jnp.asarray(np.random.default_rng(0).standard_normal(
            (16, 3 * 4 * 4)), jnp.float32)
        feats = model.vision_tower(model.params["vision_tower"], px, (4, 4))
        assert feats.shape == (1, 8, 48)
        assert np.isfinite(np.asarray(feats)).all()

    def test_xdrope_positions(self, model):
        ids = np.asarray([[1, 250] + [250] * 8 + [9]], np.int32)
        grid = np.asarray([[1, 8, 8]])
        pos, deltas = model.prepare_position_ids(ids, image_grid_thw=grid)
        assert pos.shape == (4, 1, 11)
        # w stream cycles 0..gw inside the image region
        assert pos[1, 0, 2] == 0 and pos[1, 0, 3] == 1
        # p stream stays sequential everywhere
        np.testing.assert_array_equal(pos[0, 0], np.arange(11))

    def test_merge_and_generate(self, model):
        n_img = 8
        ids = np.asarray([[1, 3] + [250] * n_img + [9]], np.int32)
        px = jnp.asarray(np.random.default_rng(1).standard_normal(
            (16, 3 * 4 * 4)), jnp.float32)
        emb = model.get_input_embeddings(model.params, jnp.asarray(ids),
                                         px, grid_hw=(4, 4))
        assert emb.shape == (1, 11, 48)
        pos, deltas = model.prepare_position_ids(
            ids, image_grid_thw=np.asarray([[1, 8, 8]]))
        toks = [int(t[0]) for t, _ in generate_step(
            emb, model, position_ids=pos, rope_deltas=deltas, max_tokens=4)]
        toks2 = [int(t[0]) for t, _ in generate_step(
            emb, model, position_ids=pos, rope_deltas=deltas, max_tokens=4)]
        assert toks == toks2 and len(toks) == 4
