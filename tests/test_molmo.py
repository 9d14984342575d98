"""Molmo: fused att_proj decoder, attention pooling, additive image merge."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_molmo_config():
    return {
        "model_type": "molmo",
        "text_config": {
            "model_type": "molmo",
            "d_model": 48,
            "n_heads": 4,
            "n_kv_heads": 2,
            "n_layers": 2,
            "mlp_hidden_size": 96,  # split into value|gate of 48 each
            "vocab_size": 256,
            "embedding_size": 240,
            "additional_vocab_size": 16,
            "layer_norm_eps": 1e-5,
            "rope_theta": 10000.0,
        },
        "vision_config": {
            "model_type": "molmo",
            "image_patch_size": 14,
            "image_emb_dim": 32,
            "image_num_heads": 4,
            "image_num_key_value_heads": 4,
            "image_num_layers": 3,
            "image_head_dim": 8,
            "image_mlp_dim": 64,
            "image_num_pos": 17,  # 4x4 grid + cls
            "intermediate_size": 588,
            "hidden_size": 64,
            "d_model": 48,
            "vit_layers": [-2, -3],
        },
    }


def tiny_molmo_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tc, vc = cfg["text_config"], cfg["vision_config"]
    D = tc["d_model"]
    hd = D // tc["n_heads"]
    nq, nkv = tc["n_heads"] * hd, tc["n_kv_heads"] * hd
    w = {
        "model.transformer.wte.embedding": rand(tc["embedding_size"], D),
        "model.transformer.wte.new_embedding": rand(
            tc["additional_vocab_size"], D),
        "model.transformer.ln_f.weight": np.ones(D, np.float32),
        "model.transformer.ff_out.weight": rand(tc["vocab_size"], D),
    }
    for i in range(tc["n_layers"]):
        p = f"model.transformer.blocks.{i}."
        w[p + "attn_norm.weight"] = np.ones(D, np.float32)
        w[p + "ff_norm.weight"] = np.ones(D, np.float32)
        w[p + "att_proj.weight"] = rand(nq + 2 * nkv, D)
        w[p + "att_proj.bias"] = rand(nq + 2 * nkv)
        w[p + "attn_out.weight"] = rand(D, nq)
        w[p + "ff_proj.weight"] = rand(tc["mlp_hidden_size"], D)
        w[p + "ff_out.weight"] = rand(D, tc["mlp_hidden_size"] // 2)
    E = vc["image_emb_dim"]
    p = "model.vision_backbone.image_vit."
    w[p + "class_embedding"] = rand(E)
    w[p + "positional_embedding"] = rand(vc["image_num_pos"], E)
    w[p + "patch_embedding.weight"] = rand(E, vc["intermediate_size"])
    w[p + "pre_ln.weight"] = np.ones(E, np.float32)
    w[p + "pre_ln.bias"] = np.zeros(E, np.float32)
    for i in range(vc["image_num_layers"]):
        q = p + f"transformer.resblocks.{i}."
        for nm in ("attention_norm", "ffn_norm"):
            w[q + nm + ".weight"] = np.ones(E, np.float32)
            w[q + nm + ".bias"] = np.zeros(E, np.float32)
        for nm in ("wq", "wk", "wv"):
            w[q + f"attention.{nm}.weight"] = rand(
                vc["image_num_heads"] * vc["image_head_dim"], E)
            w[q + f"attention.{nm}.bias"] = rand(
                vc["image_num_heads"] * vc["image_head_dim"])
        w[q + "attention.wo.weight"] = rand(
            E, vc["image_num_heads"] * vc["image_head_dim"])
        w[q + "attention.wo.bias"] = rand(E)
        w[q + "feed_forward.w1.weight"] = rand(vc["image_mlp_dim"], E)
        w[q + "feed_forward.w1.bias"] = rand(vc["image_mlp_dim"])
        w[q + "feed_forward.w2.weight"] = rand(E, vc["image_mlp_dim"])
        w[q + "feed_forward.w2.bias"] = rand(E)
    E2 = E * len(vc["vit_layers"])
    hp = vc["image_num_heads"] * vc["image_head_dim"]
    pq = "model.vision_backbone.image_pooling_2d."
    for nm in ("wq", "wk", "wv"):
        w[pq + nm + ".weight"] = rand(hp, E2)
        w[pq + nm + ".bias"] = rand(hp)
    w[pq + "wo.weight"] = rand(E, hp)
    w[pq + "wo.bias"] = rand(E)
    w["model.vision_backbone.pad_embed"] = rand(2, E2)
    pj = "model.vision_backbone.image_projector."
    w[pj + "w1.weight"] = rand(vc["hidden_size"], E)
    w[pj + "w3.weight"] = rand(vc["hidden_size"], E)
    w[pj + "w2.weight"] = rand(D, vc["hidden_size"])
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_molmo_config()
    return load_model_from_weights(cfg, tiny_molmo_weights(cfg, 8), jnp.float32)


class TestMolmo:
    def test_extended_vocab_embed(self, model):
        ids = np.asarray([[239, 241]], np.int32)  # base + new vocab
        e = np.asarray(jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids)))
        wte = model.params["language_model"]["model"]["wte"]
        np.testing.assert_allclose(e[0, 0], np.asarray(wte["embedding"][239]),
                                   atol=1e-6)
        np.testing.assert_allclose(e[0, 1],
                                   np.asarray(wte["new_embedding"][1]),
                                   atol=1e-6)

    def test_image_additive_merge_and_generate(self, model):
        # one crop, 4x4 patches -> pooled 2x2 = 4 tokens
        S = 8
        ids = (np.arange(S, dtype=np.int32) % 200)[None]
        rng = np.random.default_rng(0)
        pixels = rng.standard_normal((1, 16, 588)).astype(np.float32) * 0.05
        idx = np.asarray([2, 3, 4, 5], np.int32)  # image token positions
        embeds = jax.jit(
            model.get_input_embeddings, static_argnames=("image_grid",)
        )(model.params, jnp.asarray(ids), pixel_values=jnp.asarray(pixels),
          image_input_idx=jnp.asarray(idx), image_grid=(4, 4))
        plain = jax.jit(model.get_input_embeddings)(model.params,
                                                    jnp.asarray(ids))
        assert not np.allclose(np.asarray(embeds[0, 2]), np.asarray(plain[0, 2]))
        np.testing.assert_allclose(np.asarray(embeds[0, 0]),
                                   np.asarray(plain[0, 0]), atol=1e-6)
        toks = [int(t[0]) for t, _ in generate_step(embeds, model,
                                                    max_tokens=3)]
        assert len(toks) == 3

    def test_text_generate(self, model):
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=3)]
        assert len(toks) == 3
