"""Qwen3-VL: deepstack injection, interpolated pos-embeds, interleaved mrope.

Parity: reference mlx_vlm/models/qwen3_vl (deepstack :220-266, interleaved
selector rope_utils.py:352)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step, make_cache
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_qwen3_vl_config(**overrides) -> dict:
    cfg = {
        "model_type": "qwen3_vl",
        "image_token_id": 64,
        "video_token_id": 65,
        "vision_start_token_id": 66,
        "text_config": {
            "model_type": "qwen3_vl_text",
            "hidden_size": 48,
            "num_hidden_layers": 4,
            "intermediate_size": 96,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "head_dim": 16,
            "rms_norm_eps": 1e-6,
            "vocab_size": 256,
            "rope_theta": 10000.0,
            "max_position_embeddings": 1024,
            "rope_scaling": {"type": "default", "mrope_section": [4, 2, 2]},
        },
        "vision_config": {
            "model_type": "qwen3_vl",
            "depth": 3,
            "hidden_size": 32,
            "intermediate_size": 64,
            "out_hidden_size": 48,
            "num_heads": 4,
            "patch_size": 14,
            "temporal_patch_size": 2,
            "spatial_merge_size": 2,
            "num_position_embeddings": 16,
            "deepstack_visual_indexes": [0, 1],
        },
    }
    cfg.update(overrides)
    return cfg


def tiny_qwen3_vl_weights(config: dict, seed: int = 0, scale: float = 0.05) -> dict:
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tc, vc = config["text_config"], config["vision_config"]
    D, V, I = tc["hidden_size"], tc["vocab_size"], tc["intermediate_size"]
    nh, nkv, hd = tc["num_attention_heads"], tc["num_key_value_heads"], tc["head_dim"]
    w = {
        "model.language_model.embed_tokens.weight": rand(V, D),
        "model.language_model.norm.weight": np.ones(D, np.float32),
        "lm_head.weight": rand(V, D),
    }
    for i in range(tc["num_hidden_layers"]):
        p = f"model.language_model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.q_proj.weight"] = rand(nh * hd, D)
        w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
        w[p + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
        w[p + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
        w[p + "mlp.gate_proj.weight"] = rand(I, D)
        w[p + "mlp.up_proj.weight"] = rand(I, D)
        w[p + "mlp.down_proj.weight"] = rand(D, I)
    E = vc["hidden_size"]
    P, T, C = vc["patch_size"], vc["temporal_patch_size"], 3
    Iv = vc["intermediate_size"]
    mu = vc["spatial_merge_size"] ** 2
    out_d = vc["out_hidden_size"]
    p = "model.visual."
    w[p + "patch_embed.proj.weight"] = rand(E, C, T, P, P)
    w[p + "patch_embed.proj.bias"] = rand(E)
    w[p + "pos_embed.weight"] = rand(vc["num_position_embeddings"], E)
    for i in range(vc["depth"]):
        q = p + f"blocks.{i}."
        for nm in ("norm1", "norm2"):
            w[q + nm + ".weight"] = np.ones(E, np.float32)
            w[q + nm + ".bias"] = np.zeros(E, np.float32)
        w[q + "attn.qkv.weight"] = rand(3 * E, E)
        w[q + "attn.qkv.bias"] = rand(3 * E)
        w[q + "attn.proj.weight"] = rand(E, E)
        w[q + "attn.proj.bias"] = rand(E)
        w[q + "mlp.linear_fc1.weight"] = rand(Iv, E)
        w[q + "mlp.linear_fc1.bias"] = rand(Iv)
        w[q + "mlp.linear_fc2.weight"] = rand(E, Iv)
        w[q + "mlp.linear_fc2.bias"] = rand(E)
    mergers = [p + "merger."] + [
        p + f"deepstack_merger_list.{j}."
        for j in range(len(vc["deepstack_visual_indexes"]))
    ]
    for q in mergers:
        w[q + "norm.weight"] = np.ones(
            mu * E if "deepstack" in q else E, np.float32
        )
        w[q + "norm.bias"] = np.zeros(
            mu * E if "deepstack" in q else E, np.float32
        )
        w[q + "linear_fc1.weight"] = rand(mu * E, mu * E)
        w[q + "linear_fc1.bias"] = rand(mu * E)
        w[q + "linear_fc2.weight"] = rand(out_d, mu * E)
        w[q + "linear_fc2.bias"] = rand(out_d)
    return w


def make_tiny_qwen3_vl(seed=0, dtype=jnp.float32, config=None):
    cfg = config or tiny_qwen3_vl_config()
    return load_model_from_weights(cfg, tiny_qwen3_vl_weights(cfg, seed), dtype)


@pytest.fixture(scope="module")
def model():
    return make_tiny_qwen3_vl(seed=5)


def _image_inputs(model, grid=(1, 4, 4), seed=0):
    vc = model.config.vision_config
    t, h, w = grid
    n = t * h * w
    dim = 3 * vc.temporal_patch_size * vc.patch_size**2
    rng = np.random.default_rng(seed)
    pixels = rng.standard_normal((n, dim)).astype(np.float32) * 0.05
    aux = model.vision_aux_inputs(np.asarray([grid]))
    return pixels, aux


class TestVision:
    def test_tower_shapes(self, model):
        pixels, aux = _image_inputs(model)
        feats, ds = jax.jit(model.vision_features)(
            model.params, jnp.asarray(pixels), **{
                k: jnp.asarray(v) for k, v in aux.items()
            }
        )
        assert feats.shape == (4, 48)  # 16 patches / merge 4
        assert ds.shape == (2, 4, 48)  # two deepstack levels

    def test_pos_embed_interp_weights_sum_to_one(self, model):
        from mlx_vlm_tpu.models.qwen3_vl.vision import pos_embed_interp_aux

        idx, wgt = pos_embed_interp_aux(np.asarray([[1, 4, 6]]), 4, 2)
        assert idx.shape == (4, 24) and wgt.shape == (4, 24)
        np.testing.assert_allclose(wgt.sum(axis=0), 1.0, atol=1e-6)
        assert idx.max() < 16


class TestDeepstack:
    def test_packed_embeds_and_injection(self, model):
        ids = np.asarray([[1, 64, 64, 64, 64, 2]], np.int32)
        pixels, aux = _image_inputs(model)
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), pixel_values=jnp.asarray(pixels),
            **{k: jnp.asarray(v) for k, v in aux.items()},
        )
        D = model.config.text_config.hidden_size
        assert embeds.shape == (1, 6, D * 3)  # base + 2 deepstack levels
        # deepstack channels are zero at text positions
        assert np.asarray(embeds[0, 0, D:]).max() == 0.0
        assert np.abs(np.asarray(embeds[0, 1, D:])).max() > 0.0

        pos = np.broadcast_to(np.arange(6, dtype=np.int32), (3, 1, 6)).copy()
        cache = make_cache(model, 1, 16, jnp.float32)
        logits_ds, _ = model(model.params, embeds, cache, jnp.asarray(pos))
        # zeroing the deepstack channels must change the logits
        stripped = jnp.concatenate(
            [embeds[..., :D], jnp.zeros_like(embeds[..., D:])], axis=-1
        )
        cache2 = make_cache(model, 1, 16, jnp.float32)
        logits_plain, _ = model(model.params, stripped, cache2, jnp.asarray(pos))
        assert not np.allclose(np.asarray(logits_ds), np.asarray(logits_plain))

    def test_generate_with_image(self, model):
        ids = np.asarray([[1, 64, 64, 64, 64, 2]], np.int32)
        pixels, aux = _image_inputs(model)
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), pixel_values=jnp.asarray(pixels),
            **{k: jnp.asarray(v) for k, v in aux.items()},
        )
        toks = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=4)]
        assert len(toks) == 4


class TestInterleavedMrope:
    def test_section_map_matches_reference_selector(self):
        from mlx_vlm_tpu.core.rope import mrope_section_map

        # reference rope_utils.py:352: stride-3 slots for h/w, rest t
        m = mrope_section_map([24, 20, 20], "interleaved")
        assert len(m) == 64
        ref = np.zeros(64, np.int32)
        for dim, offset in enumerate((1, 2), start=1):
            ref[offset:min([24, 20, 20][dim] * 3, 64):3] = dim
        np.testing.assert_array_equal(m, ref)

    def test_differs_from_chunked(self, model):
        ids = np.asarray([[1, 64, 64, 64, 64, 2]], np.int32)
        pos, deltas = model.prepare_position_ids(ids, np.asarray([[1, 4, 4]]))
        assert pos.shape == (3, 1, 6)
        # text positions resume after the vision span max
        assert pos[0, 0, -1] == 3 and deltas[0, 0] == 4 - 6

    def test_text_only_positions(self, model):
        ids = np.arange(5, dtype=np.int32)[None]
        pos, deltas = model.prepare_position_ids(ids)
        np.testing.assert_array_equal(pos[0, 0], np.arange(5))
        assert deltas[0, 0] == 0
