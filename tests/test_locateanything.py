"""LocateAnything: MoonViT tower + qwen2 decoder + LN/MLP projector."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_cfg():
    return {
        "model_type": "locateanything",
        "image_token_index": 64,
        "text_config": {
            "model_type": "qwen2",
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "intermediate_size": 64,
            "vocab_size": 128,
            "rms_norm_eps": 1e-6,
        },
        "vision_config": {
            "model_type": "moonvit",
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "intermediate_size": 64,
            "patch_size": 14,
            "init_pos_emb_height": 8,
            "init_pos_emb_width": 8,
            "merge_kernel_size": [2, 2],
        },
    }


def weights(cfg, seed=0):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    tc = cfg["text_config"]
    D, V = tc["hidden_size"], tc["vocab_size"]
    E = cfg["vision_config"]["hidden_size"]
    w = {"language_model.model.embed_tokens.weight": rand(V, D),
         "language_model.model.norm.weight": np.ones(D, np.float32),
         "language_model.lm_head.weight": rand(V, D)}
    for i in range(2):
        p = f"language_model.model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.q_proj.weight"] = rand(D, D)
        w[p + "self_attn.q_proj.bias"] = rand(D)
        w[p + "self_attn.k_proj.weight"] = rand(16, D)
        w[p + "self_attn.k_proj.bias"] = rand(16)
        w[p + "self_attn.v_proj.weight"] = rand(16, D)
        w[p + "self_attn.v_proj.bias"] = rand(16)
        w[p + "self_attn.o_proj.weight"] = rand(D, D)
        w[p + "mlp.gate_proj.weight"] = rand(64, D)
        w[p + "mlp.up_proj.weight"] = rand(64, D)
        w[p + "mlp.down_proj.weight"] = rand(D, 64)
    P = "vision_model.encoder."
    w[P + "patch_embed.proj.weight"] = rand(E, 3, 14, 14)
    w[P + "patch_embed.proj.bias"] = rand(E)
    w[P + "patch_embed.pos_emb.weight"] = rand(8, 8, E)
    for i in range(2):
        q = P + f"blocks.{i}."
        for nm in ("norm0", "norm1"):
            w[q + nm + ".weight"] = np.ones(E, np.float32)
            w[q + nm + ".bias"] = np.zeros(E, np.float32)
        w[q + "wqkv.weight"] = rand(3 * E, E)
        w[q + "wqkv.bias"] = rand(3 * E)
        w[q + "wo.weight"] = rand(E, E)
        w[q + "wo.bias"] = rand(E)
        w[q + "mlp.fc0.weight"] = rand(64, E)
        w[q + "mlp.fc0.bias"] = rand(64)
        w[q + "mlp.fc1.weight"] = rand(E, 64)
        w[q + "mlp.fc1.bias"] = rand(E)
    w[P + "final_layernorm.weight"] = np.ones(E, np.float32)
    w[P + "final_layernorm.bias"] = np.zeros(E, np.float32)
    merged = E * 4
    w["mlp1.0.weight"] = np.ones(merged, np.float32)
    w["mlp1.0.bias"] = np.zeros(merged, np.float32)
    w["mlp1.1.weight"] = rand(D, merged)
    w["mlp1.1.bias"] = rand(D)
    w["mlp1.3.weight"] = rand(D, D)
    w["mlp1.3.bias"] = rand(D)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    return load_model_from_weights(cfg, weights(cfg), jnp.float32)


class TestLocateAnything:
    def test_image_generate(self, model):
        ids = np.asarray([[1, 64, 64, 64, 64, 5]], np.int32)
        aux = model.vision_aux_inputs(np.asarray([[4, 4]]))
        px = np.random.default_rng(0).standard_normal(
            (16, 3 * 14 * 14)).astype(np.float32) * 0.1
        e = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), pixel_values=jnp.asarray(px),
            **{k: jnp.asarray(v) for k, v in aux.items()})
        plain = jax.jit(model.get_input_embeddings)(model.params,
                                                    jnp.asarray(ids))
        assert not np.allclose(np.asarray(e[0, 1]), np.asarray(plain[0, 1]))
        toks = [int(t[0]) for t, _ in generate_step(e, model,
                                                    max_tokens=3)]
        assert len(toks) == 3
