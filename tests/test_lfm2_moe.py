"""LFM2-MoE: hybrid conv/attention decoder with dense-prefix + MoE FFNs
run as four role-split scans."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights

from test_lfm2 import tiny_lfm2_config, tiny_lfm2_weights

IDS = (np.arange(6, dtype=np.int32) * 7 % 200)[None]


def tiny_cfg():
    cfg = tiny_lfm2_config()
    cfg.update({
        "model_type": "lfm2_moe",
        "num_dense_layers": 2,
        "num_experts": 4,
        "num_experts_per_tok": 2,
        "moe_intermediate_size": 32,
        "norm_topk_prob": True,
        "use_expert_bias": True,
    })
    return cfg


def weights(cfg, seed=0):
    rng = np.random.default_rng(seed + 13)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    base = tiny_lfm2_weights(cfg, seed)
    D = cfg["hidden_size"]
    MI, E = cfg["moe_intermediate_size"], cfg["num_experts"]
    w = {}
    for k, v in base.items():
        # layers >= num_dense: drop the dense ffn keys, add MoE keys
        import re

        m = re.match(r"^model\.layers\.(\d+)\.feed_forward\.(w1|w2|w3)\.",
                     k)
        if m and int(m.group(1)) >= cfg["num_dense_layers"]:
            continue
        w[k] = v
    for i in range(cfg["num_dense_layers"], cfg["num_hidden_layers"]):
        p = f"model.layers.{i}.feed_forward."
        w[p + "gate.weight"] = rand(E, D)
        w[p + "expert_bias"] = np.zeros(E, np.float32)
        for e in range(E):
            w[p + f"experts.{e}.w1.weight"] = rand(MI, D)
            w[p + f"experts.{e}.w3.weight"] = rand(MI, D)
            w[p + f"experts.{e}.w2.weight"] = rand(D, MI)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    return load_model_from_weights(cfg, weights(cfg), jnp.float32)


class TestLfm2Moe:
    def test_role_groups(self, model):
        lm = model.language_model
        # pattern M * M * with dense=2: conv_dense, attn_dense,
        # conv_moe, attn_moe — one layer each
        assert lm.labels == ["conv_dense", "attn_dense", "conv_moe",
                             "attn_moe"]
        mp = model.params["language_model"]["model"]
        assert "conv_moe_layers" in mp and "attn_moe_layers" in mp
        ex = mp["conv_moe_layers"]["feed_forward"]["experts"]
        assert ex["gate_proj"]["weight"].shape == (1, 4, 32, 48)

    def test_generate(self, model):
        e = jax.jit(model.get_input_embeddings)(model.params,
                                                jnp.asarray(IDS))
        toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=4)]
        assert len(toks) == 4

    def test_prefill_matches_stepwise(self, model):
        lm = model.language_model
        S = 5
        ids = (np.arange(S, dtype=np.int32) * 3 % 200)[None]
        e = jax.jit(model.get_input_embeddings)(model.params,
                                                jnp.asarray(ids))
        pos = np.arange(S, dtype=np.int32)[None]
        cache = lm.init_cache(1, 16, jnp.float32)
        lf, _ = model(model.params, e, cache, jnp.asarray(pos))
        cache = lm.init_cache(1, 16, jnp.float32)
        for t in range(S):
            lg, cache = model(model.params, e[:, t:t + 1], cache,
                              jnp.asarray(pos[:, t:t + 1]))
        np.testing.assert_allclose(np.asarray(lf[0, -1]),
                                   np.asarray(lg[0, 0]),
                                   atol=2e-4, rtol=1e-3)
