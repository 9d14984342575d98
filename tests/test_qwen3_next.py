"""Qwen3-Next hybrid: delta-rule state, conv carry, padded-prefill masking.

Parity: reference mlx_vlm/models/qwen3_next + models/gated_delta.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step, make_cache
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_next_config(**overrides) -> dict:
    cfg = {
        "model_type": "qwen3_next",
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
        "num_experts": 4,
        "num_experts_per_tok": 2,
        "decoder_sparse_step": 1,
        "shared_expert_intermediate_size": 32,
        "mlp_only_layers": [],
        "moe_intermediate_size": 32,
        "rms_norm_eps": 1e-6,
        "vocab_size": 256,
        "rope_theta": 10000.0,
        "partial_rotary_factor": 0.25,
        "max_position_embeddings": 1024,
        "norm_topk_prob": True,
        "full_attention_interval": 4,
    }
    cfg.update(overrides)
    return cfg


def tiny_next_weights(cfg, seed=0, scale=0.05, hf_style=True):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    D, V = cfg["hidden_size"], cfg["vocab_size"]
    nh, nkv, hd = (cfg["num_attention_heads"], cfg["num_key_value_heads"],
                   cfg["head_dim"])
    nk, nv = cfg["linear_num_key_heads"], cfg["linear_num_value_heads"]
    dk, dv = cfg["linear_key_head_dim"], cfg["linear_value_head_dim"]
    key_dim, value_dim = nk * dk, nv * dv
    conv_dim = 2 * key_dim + value_dim
    K = cfg["linear_conv_kernel_dim"]
    E, Im, Is = (cfg["num_experts"], cfg["moe_intermediate_size"],
                 cfg["shared_expert_intermediate_size"])
    # zero-centered norms mimic raw HF checkpoints (sanitize adds 1)
    nz = 0.0 if hf_style else 1.0
    w = {
        "model.embed_tokens.weight": rand(V, D),
        "model.norm.weight": np.full(D, nz, np.float32),
        "lm_head.weight": rand(V, D),
    }
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.full(D, nz, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.full(D, nz, np.float32)
        if (i + 1) % cfg["full_attention_interval"] == 0:
            w[p + "self_attn.q_proj.weight"] = rand(nh * hd * 2, D)
            w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
            w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
            w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
            w[p + "self_attn.q_norm.weight"] = np.full(hd, nz, np.float32)
            w[p + "self_attn.k_norm.weight"] = np.full(hd, nz, np.float32)
        else:
            q = p + "linear_attn."
            w[q + "in_proj_qkvz.weight"] = rand(2 * key_dim + 2 * value_dim, D)
            w[q + "in_proj_ba.weight"] = rand(2 * nv, D)
            if hf_style:
                w[q + "conv1d.weight"] = rand(conv_dim, 1, K)
            else:
                w[q + "conv1d.weight"] = rand(conv_dim, K, 1)
            w[q + "dt_bias"] = np.ones(nv, np.float32)
            w[q + "A_log"] = np.log(np.linspace(1, 8, nv)).astype(np.float32)
            w[q + "norm.weight"] = np.ones(dv, np.float32)
            w[q + "out_proj.weight"] = rand(D, value_dim)
        m = p + "mlp."
        w[m + "gate.weight"] = rand(E, D)
        eg, eu, ed = rand(E, Im, D), rand(E, Im, D), rand(E, D, Im)
        if hf_style:
            for e in range(E):
                w[m + f"experts.{e}.gate_proj.weight"] = eg[e]
                w[m + f"experts.{e}.up_proj.weight"] = eu[e]
                w[m + f"experts.{e}.down_proj.weight"] = ed[e]
        else:
            w[m + "switch_mlp.gate_proj.weight"] = eg
            w[m + "switch_mlp.up_proj.weight"] = eu
            w[m + "switch_mlp.down_proj.weight"] = ed
        w[m + "shared_expert.gate_proj.weight"] = rand(Is, D)
        w[m + "shared_expert.up_proj.weight"] = rand(Is, D)
        w[m + "shared_expert.down_proj.weight"] = rand(D, Is)
        w[m + "shared_expert_gate.weight"] = rand(1, D)
    return w


def make_tiny_next(seed=0, dtype=jnp.float32, hf_style=True, cfg=None):
    cfg = cfg or tiny_next_config()
    return load_model_from_weights(
        cfg, tiny_next_weights(cfg, seed, hf_style=hf_style), dtype
    )


@pytest.fixture(scope="module")
def model():
    return make_tiny_next(seed=7)


class TestStructure:
    def test_role_split_shapes(self, model):
        lm = model.params["language_model"]["model"]
        q = lm["linear_layers"]["linear_attn"]["in_proj_qkvz"]["weight"]
        assert q.shape[0] == 3  # 3 linear layers
        a = lm["attn_layers"]["self_attn"]["q_proj"]["weight"]
        assert a.shape[0] == 1  # 1 attention layer
        e = lm["linear_layers"]["mlp"]["experts"]["gate_proj"]["weight"]
        assert e.shape == (3, 4, 32, 48)  # [L_lin, E, I, D]

    def test_generate(self, model):
        ids = (np.arange(9, dtype=np.int32) % 200)[None]
        embeds = jax.jit(model.get_input_embeddings)(model.params,
                                                     jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(embeds, model,
                                                    max_tokens=5)]
        assert len(toks) == 5


class TestRecurrence:
    def test_prefill_matches_stepwise(self, model):
        """One prefill call == feeding tokens one at a time (state carry)."""
        S = 7
        ids = (np.arange(S, dtype=np.int32) * 5 % 200)[None]
        embeds = jax.jit(model.get_input_embeddings)(model.params,
                                                     jnp.asarray(ids))
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S)).copy()
        cache = make_cache(model, 1, 16, jnp.float32)
        logits_full, cache_full = model(
            model.params, embeds, cache, jnp.asarray(pos)
        )

        cache2 = make_cache(model, 1, 16, jnp.float32)
        outs = []
        for t in range(S):
            p = np.full((3, 1, 1), t, np.int32)
            lg, cache2 = model(
                model.params, embeds[:, t:t + 1], cache2, jnp.asarray(p)
            )
            outs.append(np.asarray(lg[0, 0]))
        np.testing.assert_allclose(
            np.asarray(logits_full[0, -1]), outs[-1], atol=2e-4, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(cache_full.state), np.asarray(cache2.state),
            atol=1e-4, rtol=1e-3,
        )

    def test_padded_prefill_matches_exact(self, model):
        """Right-padded prefill (pos==0 sentinel) must equal unpadded."""
        S = 5
        ids = (np.arange(S, dtype=np.int32) * 3 % 200)[None]
        embeds = np.asarray(
            jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        )
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S)).copy()
        cache = make_cache(model, 1, 16, jnp.float32)
        _, c_exact = model(model.params, jnp.asarray(embeds), cache,
                           jnp.asarray(pos))

        pad = 3
        emb_p = np.concatenate(
            [embeds, np.zeros((1, pad, embeds.shape[-1]), embeds.dtype)], 1
        )
        pos_p = np.concatenate([pos, np.zeros((3, 1, pad), np.int32)], -1)
        cache = make_cache(model, 1, 16, jnp.float32)
        _, c_pad = model(model.params, jnp.asarray(emb_p), cache,
                         jnp.asarray(pos_p))
        np.testing.assert_allclose(
            np.asarray(c_exact.state), np.asarray(c_pad.state),
            atol=1e-5, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(c_exact.conv), np.asarray(c_pad.conv), atol=1e-6
        )

    def test_hf_and_mlx_layouts_agree(self):
        m1 = make_tiny_next(seed=7, hf_style=True)
        m2 = make_tiny_next(seed=7, hf_style=False)
        # mlx-style fixture uses weight=1 norms; hf-style uses 0 + sanitize(+1)
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(m1.get_input_embeddings)(m1.params, jnp.asarray(ids))
        pos = np.broadcast_to(np.arange(6, dtype=np.int32), (3, 1, 6)).copy()
        c1 = make_cache(m1, 1, 16, jnp.float32)
        c2 = make_cache(m2, 1, 16, jnp.float32)
        l1, _ = m1(m1.params, e, c1, jnp.asarray(pos))
        l2, _ = m2(m2.params, e, c2, jnp.asarray(pos))
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=1e-5, rtol=1e-4)
