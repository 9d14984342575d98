"""ERNIE 4.5 VL MoE: 3-D interleaved rope, dual expert groups, resampler."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_ernie_config():
    return {
        "model_type": "ernie4_5_moe_vl",
        "im_patch_id": 64,
        "image_start_token_id": 65,
        "image_end_token_id": 66,
        "video_start_token_id": 67,
        "video_end_token_id": 68,
        "pixel_hidden_size": 16,
        "hidden_size": 32,
        "spatial_conv_size": 2,
        "temporal_conv_size": 2,
        "use_temporal_conv": True,
        "text_config": {
            "model_type": "ernie",
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "num_hidden_layers": 4,
            "rms_norm_eps": 1e-6,
            "vocab_size": 256,
            "rope_theta": 10000.0,
            "moe_num_experts": [4, 4],
            "moe_layer_start_index": 1,
            "moe_layer_end_index": 2,
            "moe_intermediate_size": [16, 16],
            "moe_k": 2,
            "moe_num_shared_experts": 1,
            "freq_allocation": 2,
            "mrope_section": [1, 1, 2],
        },
        "vision_config": {
            "model_type": "DFNRope_vision_transformer",
            "depth": 2,
            "embed_dim": 16,
            "num_heads": 2,
            "patch_size": 14,
            "mlp_ratio": 2.0,
            "spatial_merge_size": 2,
        },
    }


def tiny_ernie_weights(cfg, seed=0, scale=0.05, mm_expert_scale=1.0):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tc, vc = cfg["text_config"], cfg["vision_config"]
    D, I = tc["hidden_size"], tc["intermediate_size"]
    H, KV = tc["num_attention_heads"], tc["num_key_value_heads"]
    hd = D // H
    V = tc["vocab_size"]
    w = {}
    w["model.embed_tokens.weight"] = rand(V, D)
    w["model.norm.weight"] = np.ones(D, np.float32)
    w["lm_head.weight"] = rand(V, D)
    moe_flags = [False, True, True, False]
    for i, is_moe in enumerate(moe_flags):
        p = f"model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.q_proj.weight"] = rand(H * hd, D)
        w[p + "self_attn.k_proj.weight"] = rand(KV * hd, D)
        w[p + "self_attn.v_proj.weight"] = rand(KV * hd, D)
        w[p + "self_attn.o_proj.weight"] = rand(D, H * hd)
        if not is_moe:
            w[p + "mlp.gate_proj.weight"] = rand(I, D)
            w[p + "mlp.up_proj.weight"] = rand(I, D)
            w[p + "mlp.down_proj.weight"] = rand(D, I)
            continue
        Et, Em, Im = 4, 4, 16
        w[p + "mlp.gate.weight"] = rand(D, Et)  # HF [in, out]
        w[p + "mlp.gate.weight_1"] = rand(D, Em)
        w[p + "mlp.moe_statics.e_score_correction_bias"] = np.zeros(
            (2, Et), np.float32
        )
        for e in range(Et + Em):
            q = p + f"mlp.experts.{e}."
            s = scale if e < Et else scale * mm_expert_scale
            w[q + "gate_proj.weight"] = (
                rng.standard_normal((Im, D)) * s
            ).astype(np.float32)
            w[q + "up_proj.weight"] = (
                rng.standard_normal((Im, D)) * s
            ).astype(np.float32)
            w[q + "down_proj.weight"] = (
                rng.standard_normal((D, Im)) * s
            ).astype(np.float32)
        w[p + "mlp.shared_experts.gate_proj.weight"] = rand(Im, D)
        w[p + "mlp.shared_experts.up_proj.weight"] = rand(Im, D)
        w[p + "mlp.shared_experts.down_proj.weight"] = rand(D, Im)
    # vision tower
    E, P = vc["embed_dim"], vc["patch_size"]
    vp = "vision_model."
    w[vp + "patch_embed.proj.weight"] = rand(E, 3 * P * P)
    for i in range(vc["depth"]):
        q = vp + f"blocks.{i}."
        w[q + "norm1.weight"] = np.ones(E, np.float32)
        w[q + "norm1.bias"] = np.zeros(E, np.float32)
        w[q + "norm2.weight"] = np.ones(E, np.float32)
        w[q + "norm2.bias"] = np.zeros(E, np.float32)
        w[q + "attn.qkv.weight"] = rand(3 * E, E)
        w[q + "attn.qkv.bias"] = rand(3 * E)
        w[q + "attn.proj.weight"] = rand(E, E)
        w[q + "attn.proj.bias"] = rand(E)
        mi = int(E * vc["mlp_ratio"])
        w[q + "mlp.fc1.weight"] = rand(mi, E)
        w[q + "mlp.fc1.bias"] = rand(mi)
        w[q + "mlp.fc2.weight"] = rand(E, mi)
        w[q + "mlp.fc2.bias"] = rand(E)
    w[vp + "ln.weight"] = np.ones(E, np.float32)
    w[vp + "ln.bias"] = np.zeros(E, np.float32)
    # resampler
    sd = E * 4  # spatial_dim
    rp = "model.resampler_model."
    for base, din in (("spatial_linear", sd), ("temporal_linear", 2 * sd)):
        w[rp + base + ".0.weight"] = rand(sd, din)
        w[rp + base + ".0.bias"] = rand(sd)
        w[rp + base + ".2.weight"] = rand(sd, sd)
        w[rp + base + ".2.bias"] = rand(sd)
        w[rp + base + ".3.weight"] = np.ones(sd, np.float32)
        w[rp + base + ".3.bias"] = np.zeros(sd, np.float32)
    w[rp + "mlp.weight"] = rand(cfg["hidden_size"], sd)
    w[rp + "mlp.bias"] = rand(cfg["hidden_size"])
    w[rp + "after_norm.weight"] = np.ones(cfg["hidden_size"], np.float32)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_ernie_config()
    return load_model_from_weights(cfg, tiny_ernie_weights(cfg), jnp.float32)


def _image_inputs(model, n_txt_before=2, grid=(1, 4, 4), seed=0):
    """ids + device vision aux inputs for one image."""
    t, h, w = grid
    n_img = t * h * w // 4  # merge 2x2
    ids = np.asarray(
        [[1] * n_txt_before + [65] + [64] * n_img + [66, 2]], np.int32
    )
    rng = np.random.default_rng(seed)
    P = model.config.vision_config.patch_size
    pixels = (rng.standard_normal((t * h * w, 3 * P * P)) * 0.1).astype(
        np.float32
    )
    grid_thw = np.asarray([grid])
    aux = model.vision_aux_inputs(grid_thw)
    pos, deltas = model.prepare_position_ids(ids, image_grid_thw=grid_thw)
    return ids, pixels, aux, pos, deltas


class TestSectionMap:
    def test_matches_reference_layout(self):
        # head_dim 128, freq_allocation 20 -> j<44: even h / odd w; tail t
        from mlx_vlm_tpu.models.ernie4_5_moe_vl.language import (
            ernie_section_map,
        )

        m = ernie_section_map(64, 20)
        assert m.shape == (64,)
        assert all(m[j] == (1 if j % 2 == 0 else 2) for j in range(44))
        assert all(m[j] == 0 for j in range(44, 64))


class TestErnieVL:
    def test_text_generate(self, model):
        ids = np.asarray([[1, 5, 9, 2]], np.int32)
        embeds = model.language_model.embed(
            model.params["language_model"], jnp.asarray(ids)
        )
        toks = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=4)]
        assert len(toks) == 4

    def test_image_generate_and_merge(self, model):
        ids, pixels, aux, pos, deltas = _image_inputs(model)
        embeds = jax.jit(model.get_input_embeddings)(
            model.params,
            jnp.asarray(ids),
            pixel_values=jnp.asarray(pixels),
            **{k: jnp.asarray(v) for k, v in aux.items()},
        )
        assert embeds.shape == (1, ids.shape[1], 32)
        plain = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids)
        )
        img_slice = slice(3, 3 + 4)
        assert not np.allclose(
            np.asarray(embeds[0, img_slice]), np.asarray(plain[0, img_slice])
        )
        np.testing.assert_allclose(
            np.asarray(embeds[0, 0]), np.asarray(plain[0, 0]), atol=1e-6
        )
        assert pos.shape[0] == 4  # token-type channel present
        toks = [
            int(t[0])
            for t, _ in generate_step(
                embeds, model, position_ids=pos, rope_deltas=deltas,
                max_tokens=3,
            )
        ]
        assert len(toks) == 3

    def test_dual_expert_routing(self):
        """Vision tokens must route through the mm expert group."""
        cfg = tiny_ernie_config()
        m = load_model_from_weights(
            cfg, tiny_ernie_weights(cfg, mm_expert_scale=50.0), jnp.float32
        )
        ids = np.asarray([[1, 64, 64, 5]], np.int32)
        embeds = m.language_model.embed(
            m.params["language_model"], jnp.asarray(ids)
        )
        pos = np.broadcast_to(np.arange(4, dtype=np.int32), (3, 1, 4))
        tt = (ids == 64).astype(np.int32)[None]
        pos4 = np.concatenate([pos, tt], axis=0)
        cache0 = m.language_model.init_cache(1, 8, jnp.float32)
        h_typed, _ = m.language_model(
            m.params["language_model"], embeds, cache0, jnp.asarray(pos4)
        )
        cache1 = m.language_model.init_cache(1, 8, jnp.float32)
        h_text, _ = m.language_model(
            m.params["language_model"], embeds, cache1, jnp.asarray(pos)
        )
        h_typed, h_text = np.asarray(h_typed), np.asarray(h_text)
        # text positions before the image tokens agree; vision rows diverge
        np.testing.assert_allclose(h_typed[0, 0], h_text[0, 0], atol=1e-5)
        assert not np.allclose(h_typed[0, 1], h_text[0, 1], atol=1e-3)

    def test_prefill_decode_consistency(self, model):
        """Greedy decode == teacher-forced full prefill logits argmax."""
        ids = np.asarray([[1, 7, 11, 13, 2]], np.int32)
        lm_params = model.params["language_model"]
        embeds = model.language_model.embed(lm_params, jnp.asarray(ids))
        gen = generate_step(embeds, model, max_tokens=3, seed=0)
        toks = [int(t[0]) for t, _ in gen]
        # teacher-forced: run the full sequence (prompt + toks[:-1]) at once
        full = np.concatenate([ids[0], np.asarray(toks[:-1])])[None]
        fe = model.language_model.embed(lm_params, jnp.asarray(full))
        cache = model.language_model.init_cache(1, 16, jnp.float32)
        pos = np.broadcast_to(
            np.arange(full.shape[1], dtype=np.int32), (3, 1, full.shape[1])
        )
        logits, _ = jax.jit(model.__call__)(
            model.params, fe, cache, jnp.asarray(pos)
        )
        want = np.argmax(np.asarray(logits)[0, ids.shape[1] - 1 :], axis=-1)
        np.testing.assert_array_equal(np.asarray(toks), want)

    def test_kv_quant_generate(self, model):
        ids = np.asarray([[1, 7, 11, 13, 2]], np.int32)
        embeds = model.language_model.embed(
            model.params["language_model"], jnp.asarray(ids)
        )
        t_ref = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=3)]
        t_q = [
            int(t[0])
            for t, _ in generate_step(embeds, model, max_tokens=3, kv_bits=8, kv_group_size=8)
        ]
        assert t_ref == t_q
