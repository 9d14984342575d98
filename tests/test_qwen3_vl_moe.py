"""Qwen3-VL-MoE: fused-expert import (HF and mlx layouts) + MoE decode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from tests.test_qwen3_vl import tiny_qwen3_vl_config, tiny_qwen3_vl_weights


def tiny_moe_config():
    cfg = tiny_qwen3_vl_config()
    cfg["model_type"] = "qwen3_vl_moe"
    cfg["text_config"].update(
        model_type="qwen3_vl_moe_text",
        num_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=32,
        norm_topk_prob=True,
    )
    return cfg


def tiny_moe_weights(cfg, seed=0, layout="hf"):
    rng = np.random.default_rng(seed)
    w = tiny_qwen3_vl_weights(cfg, seed)
    tc = cfg["text_config"]
    D, E, I = tc["hidden_size"], tc["num_experts"], tc["moe_intermediate_size"]

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    for i in range(tc["num_hidden_layers"]):
        p = f"model.language_model.layers.{i}.mlp."
        for nm in ("gate_proj", "up_proj", "down_proj"):
            w.pop(p + nm + ".weight")
        w[p + "gate.weight"] = rand(E, D)
        gate = rand(E, I, D)
        up = rand(E, I, D)
        down = rand(E, D, I)
        if layout == "hf":
            w[p + "experts.gate_up_proj"] = np.concatenate(
                [gate.transpose(0, 2, 1), up.transpose(0, 2, 1)], axis=-1
            )  # [E, D, 2I]
            w[p + "experts.down_proj"] = down.transpose(0, 2, 1)  # [E, I, D]
        else:  # mlx switch_mlp fused layout
            w[p + "switch_mlp.gate_proj"] = gate
            w[p + "switch_mlp.up_proj"] = up
            w[p + "switch_mlp.down_proj"] = down
    return w


class TestQwen3VLMoE:
    def test_generate(self):
        cfg = tiny_moe_config()
        m = load_model_from_weights(cfg, tiny_moe_weights(cfg), jnp.float32)
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        embeds = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(embeds, m, max_tokens=4)]
        assert len(toks) == 4

    def test_hf_and_mlx_layouts_agree(self):
        cfg = tiny_moe_config()
        m1 = load_model_from_weights(cfg, tiny_moe_weights(cfg, layout="hf"),
                                     jnp.float32)
        m2 = load_model_from_weights(cfg, tiny_moe_weights(cfg, layout="mlx"),
                                     jnp.float32)
        ids = (np.arange(5, dtype=np.int32) % 200)[None]
        e1 = jax.jit(m1.get_input_embeddings)(m1.params, jnp.asarray(ids))
        pos = np.broadcast_to(np.arange(5, dtype=np.int32), (3, 1, 5)).copy()
        l1, _ = m1(m1.params, e1, None, jnp.asarray(pos))
        l2, _ = m2(m2.params, e1, None, jnp.asarray(pos))
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)

    def test_heterogeneous_layers_rejected(self):
        cfg = tiny_moe_config()
        cfg["text_config"]["mlp_only_layers"] = [0]
        from mlx_vlm_tpu.models.qwen3_vl_moe import ModelConfig

        with pytest.raises(ValueError, match="MoE"):
            ModelConfig.from_dict(cfg)

    def test_expert_stack_shape(self):
        cfg = tiny_moe_config()
        m = load_model_from_weights(cfg, tiny_moe_weights(cfg), jnp.float32)
        g = m.params["language_model"]["model"]["layers"]["mlp"]["experts"][
            "gate_proj"]["weight"]
        assert g.shape == (4, 4, 32, 48)  # [L, E, I, D]
