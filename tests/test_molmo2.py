"""Molmo-2: gather-pooled ViT adapter + extended-vocab OLMo decoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_cfg():
    return {
        "model_type": "molmo2",
        "image_patch_id": 120,
        "text_config": {
            "hidden_size": 32,
            "intermediate_size": 48,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "head_dim": 8,
            "vocab_size": 120,
            "additional_vocab_size": 8,
        },
        "vision_config": {
            "vit_config": {
                "hidden_size": 16,
                "intermediate_size": 32,
                "num_hidden_layers": 3,
                "num_attention_heads": 2,
                "num_key_value_heads": 2,
                "head_dim": 8,
                "image_patch_size": 14,
                "image_num_pos": 4,
            },
            "adapter_config": {
                "hidden_size": 16,
                "intermediate_size": 32,
                "text_hidden_size": 32,
                "num_attention_heads": 2,
                "num_key_value_heads": 2,
                "head_dim": 8,
                "vit_layers": [-1, -2],
            },
        },
    }


def weights(cfg, seed=0):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    tc = cfg["text_config"]
    D, V, AV = tc["hidden_size"], tc["vocab_size"], tc[
        "additional_vocab_size"]
    nh, nkv, hd = 4, 2, 8
    w = {
        "model.transformer.wte.embedding": rand(V, D),
        "model.transformer.wte.new_embedding": rand(AV, D),
        "model.transformer.ln_f.weight": np.ones(D, np.float32),
        "lm_head.weight": rand(V + AV, D),
    }
    for i in range(2):
        p = f"model.transformer.blocks.{i}."
        w[p + "attn_norm.weight"] = np.ones(D, np.float32)
        w[p + "ff_norm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.att_proj.weight"] = rand((nh + 2 * nkv) * hd, D)
        w[p + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
        w[p + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
        w[p + "self_attn.attn_out.weight"] = rand(D, nh * hd)
        w[p + "mlp.ff_proj.weight"] = rand(2 * tc["intermediate_size"], D)
        w[p + "mlp.ff_out.weight"] = rand(D, tc["intermediate_size"])
    E = 16
    P = "model.vision_backbone.image_vit."
    w[P + "patch_embedding.weight"] = rand(E, 14 * 14 * 3)
    w[P + "patch_embedding.bias"] = rand(E)
    w[P + "positional_embedding"] = rand(4, E)
    for i in range(3):
        q = P + f"transformer.resblocks.{i}."
        w[q + "attention_norm.weight"] = np.ones(E, np.float32)
        w[q + "attention_norm.bias"] = np.zeros(E, np.float32)
        w[q + "ffn_norm.weight"] = np.ones(E, np.float32)
        w[q + "ffn_norm.bias"] = np.zeros(E, np.float32)
        for nm in ("wq", "wk", "wv"):
            w[q + f"attention.{nm}.weight"] = rand(16, E)
            w[q + f"attention.{nm}.bias"] = rand(16)
        w[q + "attention.wo.weight"] = rand(E, 16)
        w[q + "attention.wo.bias"] = rand(E)
        w[q + "feed_forward.w1.weight"] = rand(32, E)
        w[q + "feed_forward.w1.bias"] = rand(32)
        w[q + "feed_forward.w2.weight"] = rand(E, 32)
        w[q + "feed_forward.w2.bias"] = rand(E)
    A = "model.vision_backbone."
    pool_in = 2 * E  # two vit layers concatenated
    for nm, i_dim in (("wq", pool_in), ("wk", pool_in), ("wv", pool_in)):
        w[A + f"image_pooling_2d.{nm}.weight"] = rand(16, i_dim)
        w[A + f"image_pooling_2d.{nm}.bias"] = rand(16)
    w[A + "image_pooling_2d.wo.weight"] = rand(E, 16)
    w[A + "image_pooling_2d.wo.bias"] = rand(E)
    w[A + "image_projector.w1.weight"] = rand(32, E)
    w[A + "image_projector.w3.weight"] = rand(32, E)
    w[A + "image_projector.w2.weight"] = rand(32, 32)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    return load_model_from_weights(cfg, weights(cfg), jnp.float32)


class TestMolmo2:
    def test_extended_vocab_embed(self, model):
        lm = model.params["language_model"]
        e = model.language_model.embed(
            lm, jnp.asarray([[119, 120, 127]], jnp.int32))
        base = np.asarray(lm["model"]["wte"]["embedding"])
        new = np.asarray(lm["model"]["wte"]["new_embedding"])
        np.testing.assert_allclose(np.asarray(e[0, 0]), base[119])
        np.testing.assert_allclose(np.asarray(e[0, 1]), new[0])
        np.testing.assert_allclose(np.asarray(e[0, 2]), new[7])

    def test_image_generate(self, model):
        # 1 crop of 4 patches; 2 pooled tokens of 2 patches each
        ids = np.asarray([[1, 120, 120, 5]], np.int32)
        px = np.random.default_rng(0).standard_normal(
            (1, 4, 14 * 14 * 3)).astype(np.float32) * 0.1
        pool_idx = np.asarray([[[0, 1], [2, 3]]], np.int32)
        e = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), pixel_values=jnp.asarray(px),
            pooled_patches_idx=jnp.asarray(pool_idx))
        plain = jax.jit(model.get_input_embeddings)(model.params,
                                                    jnp.asarray(ids))
        # additive merge: patch positions change, text positions don't
        assert not np.allclose(np.asarray(e[0, 1]), np.asarray(plain[0, 1]))
        np.testing.assert_allclose(np.asarray(e[0, 0]),
                                   np.asarray(plain[0, 0]))
        toks = [int(t[0]) for t, _ in generate_step(e, model,
                                                    max_tokens=3)]
        assert len(toks) == 3

    def test_padded_pool_indices(self, model):
        """-1 indices are padding; a padded second token must leave only
        one valid pooled feature feeding the single patch slot."""
        ids = np.asarray([[1, 120, 5, 6]], np.int32)
        px = np.random.default_rng(1).standard_normal(
            (1, 4, 14 * 14 * 3)).astype(np.float32) * 0.1
        pool_idx = np.asarray([[[0, 1], [-1, -1]]], np.int32)
        e = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), pixel_values=jnp.asarray(px),
            pooled_patches_idx=jnp.asarray(pool_idx))
        assert np.isfinite(np.asarray(e)).all()
