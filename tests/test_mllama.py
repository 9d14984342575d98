import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_mllama_config():
    return {
        "model_type": "mllama",
        "image_token_index": 99,
        "text_config": {
            "model_type": "mllama",
            "hidden_size": 64,
            "intermediate_size": 128,
            "num_hidden_layers": 4,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "rms_norm_eps": 1e-5,
            "vocab_size": 256,
            "rope_theta": 10000.0,
            "cross_attention_layers": [1, 3],
        },
        "vision_config": {
            "image_size": 28,
            "patch_size": 14,
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "num_global_layers": 1,
            "vision_output_dim": 96,  # 32 global + 2x32 intermediates
            "intermediate_layers_indices": [0, 1],
        },
    }


def tiny_mllama_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tc, vc = cfg["text_config"], cfg["vision_config"]
    D, I = tc["hidden_size"], tc["intermediate_size"]
    nh, nkv = tc["num_attention_heads"], tc["num_key_value_heads"]
    hd = D // nh
    w = {
        "language_model.model.embed_tokens.weight": rand(tc["vocab_size"], D),
        "language_model.model.norm.weight": np.ones(D, np.float32),
        "language_model.lm_head.weight": rand(tc["vocab_size"], D),
    }
    cross = set(tc["cross_attention_layers"])
    for i in range(tc["num_hidden_layers"]):
        p = f"language_model.model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "mlp.gate_proj.weight"] = rand(I, D)
        w[p + "mlp.up_proj.weight"] = rand(I, D)
        w[p + "mlp.down_proj.weight"] = rand(D, I)
        if i in cross:
            w[p + "cross_attn.q_proj.weight"] = rand(nh * hd, D)
            w[p + "cross_attn.k_proj.weight"] = rand(nkv * hd, D)
            w[p + "cross_attn.v_proj.weight"] = rand(nkv * hd, D)
            w[p + "cross_attn.o_proj.weight"] = rand(D, nh * hd)
            w[p + "cross_attn.q_norm.weight"] = np.ones(hd, np.float32)
            w[p + "cross_attn.k_norm.weight"] = np.ones(hd, np.float32)
            w[p + "cross_attn_attn_gate"] = np.asarray([0.5], np.float32)
            w[p + "cross_attn_mlp_gate"] = np.asarray([0.5], np.float32)
        else:
            w[p + "self_attn.q_proj.weight"] = rand(nh * hd, D)
            w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
            w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
            w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
    E = vc["hidden_size"]
    P = vc["patch_size"]
    n_pos = (vc["image_size"] // P) ** 2 + 1
    w["vision_tower.patch_embedding.weight"] = rand(E, 3, P, P)
    w["vision_tower.class_embedding"] = rand(E)
    w["vision_tower.gated_positional_embedding.gate"] = np.zeros(1, np.float32)
    w["vision_tower.gated_positional_embedding.embedding"] = rand(n_pos, E)
    w["vision_tower.layernorm_pre.weight"] = np.ones(E, np.float32)
    w["vision_tower.layernorm_pre.bias"] = np.zeros(E, np.float32)
    w["vision_tower.layernorm_post.weight"] = np.ones(E, np.float32)
    w["vision_tower.layernorm_post.bias"] = np.zeros(E, np.float32)

    def vit_layer(prefix, gated):
        w[prefix + "input_layernorm.weight"] = np.ones(E, np.float32)
        w[prefix + "input_layernorm.bias"] = np.zeros(E, np.float32)
        w[prefix + "post_attention_layernorm.weight"] = np.ones(E, np.float32)
        w[prefix + "post_attention_layernorm.bias"] = np.zeros(E, np.float32)
        for nm in ("q_proj", "k_proj", "v_proj", "o_proj"):
            w[prefix + f"self_attn.{nm}.weight"] = rand(E, E)
        w[prefix + "mlp.fc1.weight"] = rand(vc["intermediate_size"], E)
        w[prefix + "mlp.fc1.bias"] = rand(vc["intermediate_size"])
        w[prefix + "mlp.fc2.weight"] = rand(E, vc["intermediate_size"])
        w[prefix + "mlp.fc2.bias"] = rand(E)
        if gated:
            w[prefix + "gate_attn"] = np.asarray([0.3], np.float32)
            w[prefix + "gate_ffn"] = np.asarray([0.3], np.float32)

    for i in range(vc["num_hidden_layers"]):
        vit_layer(f"vision_tower.transformer.layers.{i}.", False)
    for i in range(vc["num_global_layers"]):
        vit_layer(f"vision_tower.global_transformer.layers.{i}.", True)
    w["multi_modal_projector.weight"] = rand(D, vc["vision_output_dim"])
    w["multi_modal_projector.bias"] = rand(D)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_mllama_config()
    return load_model_from_weights(cfg, tiny_mllama_weights(cfg), jnp.float32)


class TestMllama:
    def test_text_only_forward(self, model):
        S = 6
        ids = (np.arange(S, dtype=np.int32) % 200)[None]
        embeds = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        cache = model.make_cache_with_vision(model.params, 1, 16)
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S))
        logits, cache = model(model.params, embeds, cache, jnp.asarray(pos))
        assert logits.shape == (1, S, model.config.text_config.vocab_size)

    def test_vision_cross_attention(self, model):
        vc = model.config.vision_config
        N = (vc.image_size // vc.patch_size) ** 2
        pv = np.random.default_rng(0).standard_normal(
            (1, N, 3 * vc.patch_size**2)
        ).astype(np.float32)
        cache = model.make_cache_with_vision(
            model.params, 1, 16, jnp.asarray(pv)
        )
        assert cache.has_vision
        assert cache.cross_k.shape[0] == 2  # two cross layers
        assert cache.cross_k.shape[3] == N + 1  # patches + CLS
        S = 5
        ids = (np.arange(S, dtype=np.int32) % 200)[None]
        embeds = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S))
        logits, cache = model(model.params, embeds, cache, jnp.asarray(pos))
        # image must influence the logits
        cache0 = model.make_cache_with_vision(model.params, 1, 16)
        logits0, _ = model(model.params, embeds, cache0, jnp.asarray(pos))
        assert not np.allclose(np.asarray(logits), np.asarray(logits0))

    def test_incremental_decode_with_vision(self, model):
        vc = model.config.vision_config
        N = (vc.image_size // vc.patch_size) ** 2
        pv = np.random.default_rng(1).standard_normal(
            (1, N, 3 * vc.patch_size**2)
        ).astype(np.float32)
        S = 6
        ids = (np.arange(S, dtype=np.int32) * 7 % 200)[None]
        embeds = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S))

        cache = model.make_cache_with_vision(model.params, 1, 16, jnp.asarray(pv))
        full, _ = model(model.params, embeds, cache, jnp.asarray(pos))

        cache = model.make_cache_with_vision(model.params, 1, 16, jnp.asarray(pv))
        outs = []
        for t in range(S):
            lt, cache = model(
                model.params, embeds[:, t : t + 1], cache,
                jnp.asarray(pos[:, :, t : t + 1]),
            )
            outs.append(np.asarray(lt)[:, 0])
        np.testing.assert_allclose(
            np.asarray(full), np.stack(outs, 1), atol=3e-4, rtol=1e-3
        )
