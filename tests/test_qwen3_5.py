"""Qwen3.5-VL: hybrid GDN/attention decoder + qwen3_vl tower + M-RoPE.

Contract parity: reference mlx_vlm/models/qwen3_5/ — sanitize_key:15 and
norm-shift:36 (qwen3_5.py), hybrid decoder layout (language.py:1790),
deepstack disabled (config.py:50), chat EOS always accepted
(config.py:23).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_qwen3_5_config(**overrides) -> dict:
    cfg = {
        "model_type": "qwen3_5",
        "image_token_id": 64,
        "video_token_id": 65,
        "vision_start_token_id": 66,
        "eos_token_id": 7,
        "text_config": {
            "model_type": "qwen3_5_text",
            "hidden_size": 48,
            "num_hidden_layers": 4,
            "intermediate_size": 96,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "head_dim": 16,
            "linear_num_value_heads": 4,
            "linear_num_key_heads": 2,
            "linear_key_head_dim": 8,
            "linear_value_head_dim": 8,
            "linear_conv_kernel_dim": 4,
            "rms_norm_eps": 1e-6,
            "vocab_size": 256,
            "max_position_embeddings": 1024,
            "full_attention_interval": 4,
            "rope_parameters": {
                "rope_type": "default",
                "mrope_section": [2, 1, 1],  # sums to rot_dim/2
                "rope_theta": 10000.0,
                "partial_rotary_factor": 0.5,
            },
        },
        "vision_config": {
            "model_type": "qwen3_5",
            "depth": 2,
            "hidden_size": 32,
            "intermediate_size": 64,
            "out_hidden_size": 48,
            "num_heads": 4,
            "patch_size": 14,
            "temporal_patch_size": 2,
            "spatial_merge_size": 2,
            "num_position_embeddings": 16,
        },
    }
    cfg.update(overrides)
    return cfg


def tiny_qwen3_5_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tc, vc = cfg["text_config"], cfg["vision_config"]
    D, V = tc["hidden_size"], tc["vocab_size"]
    nh, nkv, hd = (tc["num_attention_heads"], tc["num_key_value_heads"],
                   tc["head_dim"])
    nk, nv = tc["linear_num_key_heads"], tc["linear_num_value_heads"]
    dk, dv = tc["linear_key_head_dim"], tc["linear_value_head_dim"]
    key_dim, value_dim = nk * dk, nv * dv
    conv_dim = 2 * key_dim + value_dim
    K = tc["linear_conv_kernel_dim"]
    I = tc["intermediate_size"]
    # raw HF keys: model.language_model.*, zero-centered norms, [C,1,K] conv
    w = {
        "model.language_model.embed_tokens.weight": rand(V, D),
        "model.language_model.norm.weight": np.zeros(D, np.float32),
        "lm_head.weight": rand(V, D),
    }
    for i in range(tc["num_hidden_layers"]):
        p = f"model.language_model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.zeros(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.zeros(D, np.float32)
        if (i + 1) % tc["full_attention_interval"] == 0:
            w[p + "self_attn.q_proj.weight"] = rand(nh * hd * 2, D)
            w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
            w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
            w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
            w[p + "self_attn.q_norm.weight"] = np.zeros(hd, np.float32)
            w[p + "self_attn.k_norm.weight"] = np.zeros(hd, np.float32)
        else:
            q = p + "linear_attn."
            w[q + "in_proj_qkvz.weight"] = rand(
                2 * key_dim + 2 * value_dim, D)
            w[q + "in_proj_ba.weight"] = rand(2 * nv, D)
            w[q + "conv1d.weight"] = rand(conv_dim, 1, K)
            w[q + "dt_bias"] = np.ones(nv, np.float32)
            w[q + "A_log"] = np.log(np.linspace(1, 8, nv)).astype(np.float32)
            w[q + "norm.weight"] = np.ones(dv, np.float32)
            w[q + "out_proj.weight"] = rand(D, value_dim)
        w[p + "mlp.gate_proj.weight"] = rand(I, D)
        w[p + "mlp.up_proj.weight"] = rand(I, D)
        w[p + "mlp.down_proj.weight"] = rand(D, I)

    E = vc["hidden_size"]
    P, T = vc["patch_size"], vc["temporal_patch_size"]
    Iv = vc["intermediate_size"]
    mu = vc["spatial_merge_size"] ** 2
    p = "model.visual."
    w[p + "patch_embed.proj.weight"] = rand(E, 3, T, P, P)
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
    q = p + "merger."
    w[q + "norm.weight"] = np.ones(E, np.float32)
    w[q + "norm.bias"] = np.zeros(E, np.float32)
    w[q + "linear_fc1.weight"] = rand(mu * E, mu * E)
    w[q + "linear_fc1.bias"] = rand(mu * E)
    w[q + "linear_fc2.weight"] = rand(vc["out_hidden_size"], mu * E)
    w[q + "linear_fc2.bias"] = rand(vc["out_hidden_size"])
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_qwen3_5_config()
    return load_model_from_weights(cfg, tiny_qwen3_5_weights(cfg),
                                   jnp.float32)


class TestStructure:
    def test_hybrid_role_split(self, model):
        lm = model.params["language_model"]["model"]
        q = lm["linear_layers"]["linear_attn"]["in_proj_qkvz"]["weight"]
        assert q.shape[0] == 3
        a = lm["attn_layers"]["self_attn"]["q_proj"]["weight"]
        assert a.shape[0] == 1

    def test_mrope_active_and_partial(self, model):
        lm = model.language_model
        assert lm.rope.mrope_sections == (2, 1, 1)
        assert lm.rot_dim == 8  # head_dim 16 * 0.5

    def test_norm_shift_applied(self, model):
        # raw HF zero norms must load as ones
        n = model.params["language_model"]["model"]["norm"]["weight"]
        np.testing.assert_allclose(np.asarray(n), 1.0)

    def test_chat_eos_appended(self, model):
        from mlx_vlm_tpu.models.qwen3_5.config import QWEN_CHAT_EOS_TOKEN_ID

        assert model.config.eos_token_id == [7, QWEN_CHAT_EOS_TOKEN_ID]

    def test_deepstack_disabled(self, model):
        assert model.config.vision_config.deepstack_visual_indexes == []


class TestForward:
    def test_text_generation_mrope_positions(self, model):
        ids = (np.arange(9, dtype=np.int32) % 200)[None]
        embeds = jax.jit(model.get_input_embeddings)(model.params,
                                                     jnp.asarray(ids))
        pos, deltas = model.prepare_position_ids(ids)
        assert pos.shape == (3, 1, 9)
        toks = [int(t[0]) for t, _ in generate_step(
            embeds, model, position_ids=pos, rope_deltas=deltas,
            max_tokens=5)]
        assert len(toks) == 5
        toks2 = [int(t[0]) for t, _ in generate_step(
            embeds, model, position_ids=pos, rope_deltas=deltas,
            max_tokens=5)]
        assert toks == toks2

    def test_image_merge_end_to_end(self, model):
        vc = model.config.vision_config
        merge = vc.spatial_merge_size
        t, h, wgrid = 1, 4, 4
        n_patches = t * h * wgrid
        n_tokens = n_patches // (merge * merge)
        P, T = vc.patch_size, vc.temporal_patch_size
        px = np.random.default_rng(0).standard_normal(
            (n_patches, 3 * T * P * P)).astype(np.float32)
        grid = np.asarray([[t, h, wgrid]])
        aux = model.vision_aux_inputs(grid)
        aux = {k: jnp.asarray(v) for k, v in aux.items()}
        ids = np.asarray([[1, 66] + [64] * n_tokens + [5, 9]], np.int32)
        emb = model.get_input_embeddings(
            model.params, jnp.asarray(ids), jnp.asarray(px), **aux)
        assert emb.shape == (1, ids.shape[1], 48)
        pos, deltas = model.prepare_position_ids(ids, image_grid_thw=grid)
        toks = [int(tk[0]) for tk, _ in generate_step(
            emb, model, position_ids=pos, rope_deltas=deltas, max_tokens=4)]
        assert len(toks) == 4
