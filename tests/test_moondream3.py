"""Moondream3: Tau temperature scaling, dense/MoE parallel blocks,
prefix-capable decoder, moondream2-style crops tower."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_cfg():
    return {
        "model_type": "moondream3",
        "text_config": {
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_hidden_layers": 3,
            "vocab_size": 160,
            "num_attention_heads": 4,
            "num_key_value_heads": 4,
            "head_dim": 8,
            "rope_dim": 4,
            "num_experts": 4,
            "num_experts_per_tok": 2,
            "moe_intermediate_size": 16,
            "moe_start_layer": 1,
            "attention_bias": True,
        },
        "vision_config": {
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "patch_size": 14,
            "crop_size": 28,
            "proj_inner_dim": 48,
            "proj_out_dim": 32,
        },
    }


def weights(cfg, seed=0):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    tc, vc = cfg["text_config"], cfg["vision_config"]
    D, V = tc["hidden_size"], tc["vocab_size"]
    nh, hd = tc["num_attention_heads"], tc["head_dim"]
    qkv_dim = 3 * nh * hd
    w = {
        "text.wte": rand(V, D),
        "text.post_ln.weight": np.ones(D, np.float32),
        "text.post_ln.bias": np.zeros(D, np.float32),
        "text.lm_head.weight": rand(V, D),
        "text.lm_head.bias": rand(V),
    }
    for i in range(tc["num_hidden_layers"]):
        p = f"text.blocks.{i}."
        w[p + "ln.weight"] = np.ones(D, np.float32)
        w[p + "ln.bias"] = np.zeros(D, np.float32)
        w[p + "attn.qkv.weight"] = rand(qkv_dim, D)
        w[p + "attn.qkv.bias"] = rand(qkv_dim)
        w[p + "attn.proj.weight"] = rand(D, nh * hd)
        w[p + "attn.proj.bias"] = rand(D)
        w[p + "attn.tau.wq"] = rand(nh, qkv_dim)
        w[p + "attn.tau.wv"] = rand(nh, qkv_dim)
        w[p + "attn.tau.alpha"] = rand(nh)
        if i < tc["moe_start_layer"]:
            w[p + "mlp.fc1.weight"] = rand(tc["intermediate_size"], D)
            w[p + "mlp.fc1.bias"] = rand(tc["intermediate_size"])
            w[p + "mlp.fc2.weight"] = rand(D, tc["intermediate_size"])
            w[p + "mlp.fc2.bias"] = rand(D)
        else:
            E, MI = tc["num_experts"], tc["moe_intermediate_size"]
            w[p + "mlp.router.weight"] = rand(E, D)
            w[p + "mlp.router.bias"] = rand(E)
            w[p + "mlp.fc1.weight"] = rand(E, 2 * MI, D)
            w[p + "mlp.fc2.weight"] = rand(E, D, MI)
    E_, P = vc["hidden_size"], vc["patch_size"]
    n_patch = (vc["crop_size"] // P) ** 2
    w["vision.patch_emb.weight"] = rand(E_, 3 * P * P)
    w["vision.patch_emb.bias"] = rand(E_)
    w["vision.pos_emb"] = rand(1, n_patch, E_)
    for i in range(vc["num_hidden_layers"]):
        p = f"vision.blocks.{i}."
        for nm in ("ln1", "ln2"):
            w[p + nm + ".weight"] = np.ones(E_, np.float32)
            w[p + nm + ".bias"] = np.zeros(E_, np.float32)
        w[p + "attn.qkv.weight"] = rand(3 * E_, E_)
        w[p + "attn.qkv.bias"] = rand(3 * E_)
        w[p + "attn.proj.weight"] = rand(E_, E_)
        w[p + "attn.proj.bias"] = rand(E_)
        w[p + "mlp.fc1.weight"] = rand(vc["intermediate_size"], E_)
        w[p + "mlp.fc1.bias"] = rand(vc["intermediate_size"])
        w[p + "mlp.fc2.weight"] = rand(E_, vc["intermediate_size"])
        w[p + "mlp.fc2.bias"] = rand(E_)
    w["vision.post_ln.weight"] = np.ones(E_, np.float32)
    w["vision.post_ln.bias"] = np.zeros(E_, np.float32)
    w["vision.proj_mlp.fc1.weight"] = rand(vc["proj_inner_dim"], 2 * E_)
    w["vision.proj_mlp.fc1.bias"] = rand(vc["proj_inner_dim"])
    w["vision.proj_mlp.fc2.weight"] = rand(vc["proj_out_dim"],
                                           vc["proj_inner_dim"])
    w["vision.proj_mlp.fc2.bias"] = rand(vc["proj_out_dim"])
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    return load_model_from_weights(cfg, weights(cfg), jnp.float32)


class TestMoondream3:
    def test_structure(self, model):
        lm = model.params["language_model"]["model"]
        assert "dense_layers" in lm and "moe_layers" in lm
        fc1 = lm["moe_layers"]["mlp"]["fc1"]["weight"]
        assert fc1.shape == (2, 4, 32, 32)  # [L, E, 2*MI, D]

    def test_text_generate(self, model):
        ids = (np.arange(6, dtype=np.int32) % 150)[None]
        e = jax.jit(model.get_input_embeddings)(model.params,
                                                jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=4)]
        assert len(toks) == 4

    def test_image_embedding(self, model):
        # single 28x28 crop -> 2x2=4 image tokens after projection
        ids = np.asarray([[0] + [1] * 4 + [5, 6]], np.int32)
        px = np.random.default_rng(0).standard_normal(
            (1, 28, 28, 3)).astype(np.float32) * 0.1
        e = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), pixel_values=jnp.asarray(px))
        plain = jax.jit(model.get_input_embeddings)(model.params,
                                                    jnp.asarray(ids))
        assert e.shape == plain.shape
        assert not np.allclose(np.asarray(e[0, 1]), np.asarray(plain[0, 1]))

    def test_tau_changes_output(self, model):
        """Zeroing tau alpha/wq/wv must change logits (scaling active)."""
        cfg = tiny_cfg()
        w = weights(cfg)
        base = load_model_from_weights(cfg, dict(w), jnp.float32)
        w2 = dict(w)
        for i in range(3):
            for nm in ("wq", "wv", "alpha"):
                key = f"text.blocks.{i}.attn.tau.{nm}"
                w2[key] = np.zeros_like(w2[key])
        flat = load_model_from_weights(cfg, w2, jnp.float32)
        ids = (np.arange(6, dtype=np.int32) % 150)[None]

        def logits(m):
            e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
            pos = np.arange(6, dtype=np.int32)[None]
            l, _ = m(m.params, e, None, jnp.asarray(pos))
            return np.asarray(l)

        assert not np.allclose(logits(base), logits(flat))

    def test_prefix_mask_effect(self, model):
        """With prefix_len set, early tokens see later prefix tokens."""
        lm = model.language_model
        ids = (np.arange(6, dtype=np.int32) % 150)[None]
        e = jax.jit(model.get_input_embeddings)(model.params,
                                                jnp.asarray(ids))
        pos = np.arange(6, dtype=np.int32)[None]
        h_causal, _ = lm(model.params["language_model"], e, None,
                         jnp.asarray(pos))
        h_prefix, _ = lm(model.params["language_model"], e, None,
                         jnp.asarray(pos), prefix_len=jnp.int32(4))
        # token 0 output differs when it can attend to tokens 1-3
        assert not np.allclose(np.asarray(h_causal[0, 0]),
                               np.asarray(h_prefix[0, 0]))
        # prefix_len=1 degenerates to plain causal (token 0 already sees
        # itself), so outputs must be identical
        h_p1, _ = lm(model.params["language_model"], e, None,
                     jnp.asarray(pos), prefix_len=jnp.int32(1))
        np.testing.assert_allclose(np.asarray(h_causal),
                                   np.asarray(h_p1), atol=1e-6)
