"""Falcon-OCR: encoder-free projector, golden 3-D rotary, image-block
bidirectional masking, frozen image temporal positions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.models.falcon_ocr.falcon_ocr import (falcon_block_mask,
                                                      falcon_position_ids,
                                                      compute_pos_hw)
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_cfg():
    return {
        "model_type": "falcon_ocr",
        "img_id": 64,
        "image_cls_token_id": 60,
        "img_end_id": 61,
        "text_config": {
            "model_type": "falcon_ocr",
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "head_dim": 8,
            "num_key_value_heads": 2,
            "vocab_size": 160,
            "intermediate_size": 48,
        },
        "vision_config": {
            "spatial_patch_size": 14,
            "temporal_patch_size": 1,
            "channel_size": 3,
        },
    }


def weights(cfg, seed=0):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    tc = cfg["text_config"]
    D, V, I = tc["hidden_size"], tc["vocab_size"], tc["intermediate_size"]
    nh, nkv, hd = (tc["num_attention_heads"], tc["num_key_value_heads"],
                   tc["head_dim"])
    w = {
        "tok_embeddings.weight": rand(V, D),
        "norm.weight": np.ones(D, np.float32),
        "output.weight": rand(V, D),
        "img_projector.weight": rand(D, 14 * 14 * 3),
        "freqs_cis_golden": rand(nh, hd // 4, 2),
    }
    for i in range(tc["num_hidden_layers"]):
        p = f"layers.{i}."
        w[p + "attention.wqkv.weight"] = rand((nh + 2 * nkv) * hd, D)
        w[p + "attention.wo.weight"] = rand(D, nh * hd)
        w[p + "attention.sinks"] = rand(nh)
        # interleaved gate/up rows as the checkpoint ships them
        w[p + "feed_forward.w13.weight"] = rand(2 * I, D)
        w[p + "feed_forward.w2.weight"] = rand(D, I)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    return load_model_from_weights(cfg, weights(cfg), jnp.float32)


class TestHelpers:
    def test_positions_freeze_inside_image(self):
        ids = np.asarray([1, 60, 64, 64, 61, 5, 6])
        pos, delta = falcon_position_ids(ids, 60, 61)
        # text(0) img-cls(1) img img img-end(all 1) text(2) text(3)
        assert pos.tolist() == [0, 1, 1, 1, 1, 2, 3]
        assert delta == 4 - 7

    def test_block_mask_bidirectional(self):
        ids = np.asarray([1, 60, 64, 64, 61, 5])
        m = falcon_block_mask(ids, 60, 61)
        assert m[1, 3] and m[2, 3]  # image tokens see FORWARD in block
        assert not m[1, 4]          # end token is outside the block
        assert not m[0, 1]          # text before image stays causal
        assert m[5, 2]              # later text sees image (causal)

    def test_pos_hw_golden_coords(self):
        ids = np.asarray([1, 64, 64, 64, 64, 2])
        hw = compute_pos_hw(ids, 64, [(2, 2)])
        assert hw.shape == (1, 6, 2)
        np.testing.assert_allclose(hw[0, 0], 0.0)
        # 2x2 grid: corners at +-1 (gh == gw -> ratio 1)
        np.testing.assert_allclose(hw[0, 1], [-1.0, -1.0], atol=1e-6)
        np.testing.assert_allclose(hw[0, 4], [1.0, 1.0], atol=1e-6)


class TestFalconOcr:
    def test_image_generate(self, model):
        ids = np.asarray([[1, 60, 64, 64, 64, 64, 61, 5]], np.int32)
        pos, deltas = model.prepare_position_ids(
            ids, image_grid_thw=np.asarray([[1, 2, 2]]))
        assert pos.shape == (3, 1, 8)
        px = np.random.default_rng(0).standard_normal(
            (4, 14 * 14 * 3)).astype(np.float32) * 0.1
        e = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), pixel_values=jnp.asarray(px))
        plain = jax.jit(model.get_input_embeddings)(model.params,
                                                    jnp.asarray(ids))
        assert not np.allclose(np.asarray(e[0, 2]), np.asarray(plain[0, 2]))
        toks = [int(t[0]) for t, _ in generate_step(
            e, model, max_tokens=3, position_ids=jnp.asarray(pos))]
        assert len(toks) == 3

    def test_text_generate(self, model):
        ids = (np.arange(6, dtype=np.int32) % 150)[None]
        model.prepare_position_ids(ids)
        e = jax.jit(model.get_input_embeddings)(model.params,
                                                jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=3)]
        assert len(toks) == 3

    def test_no_chunked_prefill_flag(self, model):
        assert model.no_chunked_prefill
