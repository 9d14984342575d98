"""Llama4: role-split iRoPE decoder, sigmoid MoE, vision adapter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step, make_cache
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_llama4_config(step=1):
    return {
        "model_type": "llama4",
        "image_token_id": 64,
        "text_config": {
            "model_type": "llama4_text",
            "hidden_size": 48,
            "intermediate_size": 32,  # moe expert width
            "intermediate_size_mlp": 96,  # dense mlp width
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "num_hidden_layers": 4,
            "head_dim": 16,
            "rms_norm_eps": 1e-5,
            "vocab_size": 256,
            "rope_theta": 10000.0,
            "num_experts_per_tok": 1,
            "num_local_experts": 4,
            "use_qk_norm": True,
            "attention_chunk_size": 8,
            "interleave_moe_layer_step": step,
            "attn_temperature_tuning": 4,
            "floor_scale": 8192.0,
            "attn_scale": 0.1,
        },
        "vision_config": {
            "model_type": "llama4_vision_model",
            "hidden_size": 32,
            "image_size": 28,
            "intermediate_size": 64,
            "norm_eps": 1e-5,
            "num_attention_heads": 4,
            "num_channels": 3,
            "num_hidden_layers": 2,
            "patch_size": 14,
            "pixel_shuffle_ratio": 0.5,
            "projector_input_dim": 40,
            "projector_output_dim": 40,
            "rope_theta": 10000.0,
            "vision_feature_layer": -1,
            "vision_feature_select_strategy": "default",
            "vision_output_dim": 40,
        },
    }


def tiny_llama4_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tc, vc = cfg["text_config"], cfg["vision_config"]
    D, V = tc["hidden_size"], tc["vocab_size"]
    nh, nkv, hd = (tc["num_attention_heads"], tc["num_key_value_heads"],
                   tc["head_dim"])
    E, Im = tc["num_local_experts"], tc["intermediate_size"]
    Id = tc["intermediate_size_mlp"]
    step = tc["interleave_moe_layer_step"]
    w = {
        "language_model.model.embed_tokens.weight": rand(V, D),
        "language_model.model.norm.weight": np.ones(D, np.float32),
        "language_model.lm_head.weight": rand(V, D),
    }
    for i in range(tc["num_hidden_layers"]):
        p = f"language_model.model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.q_proj.weight"] = rand(nh * hd, D)
        w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
        f = p + "feed_forward."
        if (i % step) == (step - 1):  # MoE layer
            w[f + "router.weight"] = rand(E, D)
            gate, up = rand(E, Im, D), rand(E, Im, D)
            w[f + "experts.gate_up_proj"] = np.concatenate(
                [gate.transpose(0, 2, 1), up.transpose(0, 2, 1)], axis=-1
            )
            w[f + "experts.down_proj"] = rand(E, D, Im).transpose(0, 2, 1)
            for nm, dims in (("gate_proj", (Id, D)), ("up_proj", (Id, D)),
                             ("down_proj", (D, Id))):
                w[f + f"shared_expert.{nm}.weight"] = rand(*dims)
        else:
            w[f + "gate_proj.weight"] = rand(Id, D)
            w[f + "up_proj.weight"] = rand(Id, D)
            w[f + "down_proj.weight"] = rand(D, Id)
    # vision
    Ev, P = vc["hidden_size"], vc["patch_size"]
    n_pos = (vc["image_size"] // P) ** 2 + 1
    p = "vision_model."
    w[p + "patch_embedding.linear.weight"] = rand(Ev, 3 * P * P)
    w[p + "class_embedding"] = rand(Ev)
    w[p + "positional_embedding_vlm"] = rand(n_pos, Ev)
    for nm in ("layernorm_pre", "layernorm_post"):
        w[p + nm + ".weight"] = np.ones(Ev, np.float32)
        w[p + nm + ".bias"] = np.zeros(Ev, np.float32)
    for i in range(vc["num_hidden_layers"]):
        q = p + f"model.layers.{i}."
        for nm in ("input_layernorm", "post_attention_layernorm"):
            w[q + nm + ".weight"] = np.ones(Ev, np.float32)
            w[q + nm + ".bias"] = np.zeros(Ev, np.float32)
        for nm in ("q_proj", "k_proj", "v_proj", "o_proj"):
            w[q + f"self_attn.{nm}.weight"] = rand(Ev, Ev)
            w[q + f"self_attn.{nm}.bias"] = rand(Ev)
        w[q + "mlp.fc1.weight"] = rand(vc["intermediate_size"], Ev)
        w[q + "mlp.fc1.bias"] = rand(vc["intermediate_size"])
        w[q + "mlp.fc2.weight"] = rand(Ev, vc["intermediate_size"])
        w[q + "mlp.fc2.bias"] = rand(Ev)
    shuf = int(Ev / vc["pixel_shuffle_ratio"] ** 2)
    w[p + "vision_adapter.mlp.fc1.weight"] = rand(vc["projector_input_dim"], shuf)
    w[p + "vision_adapter.mlp.fc2.weight"] = rand(
        vc["projector_output_dim"], vc["projector_output_dim"]
    )
    w["multi_modal_projector.linear_1.weight"] = rand(D, vc["vision_output_dim"])
    return w


def make_tiny_llama4(seed=0, dtype=jnp.float32, step=1):
    cfg = tiny_llama4_config(step)
    return load_model_from_weights(cfg, tiny_llama4_weights(cfg, seed), dtype)


@pytest.fixture(scope="module")
def model():
    return make_tiny_llama4(seed=6)


class TestLlama4:
    def test_role_split(self, model):
        lm = model.params["language_model"]["model"]
        # all-MoE (step 1): every role has experts
        for r in range(4):
            assert "experts" in lm[f"role{r}_layers"]["feed_forward"]
            g = lm[f"role{r}_layers"]["feed_forward"]["experts"]["gate_proj"][
                "weight"]
            assert g.shape == (1, 4, 32, 48)  # [G, E, I, D]

    def test_interleaved_dense_moe(self):
        m = make_tiny_llama4(seed=6, step=2)
        lm = m.params["language_model"]["model"]
        assert "gate_proj" in lm["role0_layers"]["feed_forward"]  # dense
        assert "experts" in lm["role1_layers"]["feed_forward"]  # moe
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=3)]
        assert len(toks) == 3

    def test_generate_and_prefill_consistency(self, model):
        S = 6
        ids = (np.arange(S, dtype=np.int32) * 7 % 200)[None]
        e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S)).copy()
        cache = make_cache(model, 1, 16, jnp.float32)
        logits_full, cache_full = model(model.params, e, cache,
                                        jnp.asarray(pos))
        cache2 = make_cache(model, 1, 16, jnp.float32)
        for t in range(S):
            p = np.full((3, 1, 1), t, np.int32)
            lg, cache2 = model(model.params, e[:, t:t + 1], cache2,
                               jnp.asarray(p))
        np.testing.assert_allclose(
            np.asarray(logits_full[0, -1]), np.asarray(lg[0, 0]),
            atol=2e-4, rtol=1e-3,
        )

    def test_chunked_attention_limits_context(self, model):
        """Tokens in different chunks (size 8) must not attend across on
        rope layers: logits at pos 9 only see chunk [8..9]."""
        S = 10
        rng = np.random.default_rng(3)
        ids_a = rng.integers(1, 200, (1, S)).astype(np.int32)
        ids_b = ids_a.copy()
        ids_b[0, :4] = rng.integers(1, 200, 4)  # change chunk-0 tokens
        la, _ = _full_logits(model, ids_a)
        lb, _ = _full_logits(model, ids_b)
        # NoPE layer (idx 3) is global, so logits DO differ overall...
        assert not np.allclose(la[0, -1], lb[0, -1])

    def test_image_merge(self, model):
        ids = np.asarray([[1, 64, 2]], np.int32)
        pixels = np.random.default_rng(0).standard_normal(
            (1, 3, 28, 28)).astype(np.float32) * 0.1
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), pixel_values=jnp.asarray(pixels)
        )
        # 2x2 patches, shuffle 0.5 -> 1 merged token
        plain = jax.jit(model.get_input_embeddings)(model.params,
                                                    jnp.asarray(ids))
        assert not np.allclose(np.asarray(embeds[0, 1]), np.asarray(plain[0, 1]))
        toks = [int(t[0]) for t, _ in generate_step(embeds, model,
                                                    max_tokens=3)]
        assert len(toks) == 3


def _full_logits(model, ids):
    e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
    cache = make_cache(model, 1, 16, jnp.float32)
    S = ids.shape[1]
    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S)).copy()
    l, c = model(model.params, e, cache, jnp.asarray(pos))
    return np.asarray(l), c
