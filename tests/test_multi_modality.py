"""DeepSeek-VL v1 (multi_modality): timm-SigLIP tower + llama decoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_cfg():
    return {
        "model_type": "multi_modality",
        "image_token_index": 64,
        "num_image_tokens": 4,
        "language_config": {
            "model_type": "llama",
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "intermediate_size": 64,
            "vocab_size": 128,
            "rms_norm_eps": 1e-6,
        },
        "vision_config": {
            "model_type": "vision",
            "params": {"image_size": 28, "patch_size": 14, "width": 32,
                       "layers": 2},
            "num_attention_heads": 4,
            "intermediate_size": 64,
        },
        "aligner_config": {
            "cls": "MlpProjector",
            "params": {"projector_type": "mlp_gelu", "depth": 2},
        },
    }


def weights(cfg, seed=0):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    D, V = 32, 128
    E = 32
    w = {"language_model.model.embed_tokens.weight": rand(V, D),
         "language_model.model.norm.weight": np.ones(D, np.float32),
         "language_model.lm_head.weight": rand(V, D)}
    for i in range(2):
        p = f"language_model.model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.q_proj.weight"] = rand(D, D)
        w[p + "self_attn.k_proj.weight"] = rand(16, D)
        w[p + "self_attn.v_proj.weight"] = rand(16, D)
        w[p + "self_attn.o_proj.weight"] = rand(D, D)
        w[p + "mlp.gate_proj.weight"] = rand(64, D)
        w[p + "mlp.up_proj.weight"] = rand(64, D)
        w[p + "mlp.down_proj.weight"] = rand(D, 64)
    P = "vision_model.vision_tower."
    w[P + "patch_embed.proj.weight"] = rand(E, 3, 14, 14)
    w[P + "patch_embed.proj.bias"] = rand(E)
    w[P + "pos_embed"] = rand(1, 4, E)
    for i in range(2):
        q = P + f"blocks.{i}."
        for nm in ("norm1", "norm2"):
            w[q + nm + ".weight"] = np.ones(E, np.float32)
            w[q + nm + ".bias"] = np.zeros(E, np.float32)
        w[q + "attn.qkv.weight"] = rand(3 * E, E)
        w[q + "attn.qkv.bias"] = rand(3 * E)
        w[q + "attn.proj.weight"] = rand(E, E)
        w[q + "attn.proj.bias"] = rand(E)
        w[q + "mlp.fc1.weight"] = rand(64, E)
        w[q + "mlp.fc1.bias"] = rand(64)
        w[q + "mlp.fc2.weight"] = rand(E, 64)
        w[q + "mlp.fc2.bias"] = rand(E)
    w[P + "norm.weight"] = np.ones(E, np.float32)
    w[P + "norm.bias"] = np.zeros(E, np.float32)
    # pooling head must be ignored
    w[P + "attn_pool.latent"] = rand(1, 1, E)
    w["aligner.layers.0.weight"] = rand(D, E)
    w["aligner.layers.0.bias"] = rand(D)
    w["aligner.layers.2.weight"] = rand(D, D)
    w["aligner.layers.2.bias"] = rand(D)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    return load_model_from_weights(cfg, weights(cfg), jnp.float32)


class TestMultiModality:
    def test_image_generate(self, model):
        ids = np.asarray([[1, 64, 64, 64, 64, 5]], np.int32)
        px = np.random.default_rng(0).standard_normal(
            (1, 28, 28, 3)).astype(np.float32) * 0.1
        e = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), pixel_values=jnp.asarray(px))
        plain = jax.jit(model.get_input_embeddings)(model.params,
                                                    jnp.asarray(ids))
        assert not np.allclose(np.asarray(e[0, 1]), np.asarray(plain[0, 1]))
        toks = [int(t[0]) for t, _ in generate_step(e, model,
                                                    max_tokens=3)]
        assert len(toks) == 3

    def test_hybrid_tower_generate(self):
        """HybridVisionTower (SAM high + SigLIP low, deepseek-vl-7b line):
        loads, embeds an image through BOTH branches and the hybrid-split
        aligner, and decodes (reference vision.py:381,
        multi_modality.py:151)."""
        rng = np.random.default_rng(1)

        def rand(*sh):
            return (rng.standard_normal(sh) * 0.08).astype(np.float32)

        cfg = tiny_cfg()
        cfg["vision_config"] = {
            "model_type": "vision",
            "cls": "HybridVisionTower",
            "num_attention_heads": 4,
            "intermediate_size": 64,
            "params": {
                "high_res_cfg": {
                    "image_size": 32, "output_dim": 32, "embed_dim": 16,
                    "depth": 2, "num_heads": 2, "window_size": 2,
                    "global_attn_indexes": [1], "neck_size": [8, 8],
                },
                "low_res_cfg": {"image_size": 28, "output_dim": 32,
                                "patch_size": 14, "width": 32, "layers": 2},
            },
        }
        cfg["aligner_config"] = {
            "cls": "MlpProjector",
            "params": {"projector_type": "low_high_hybrid_split_mlp_gelu",
                       "depth": 2},
        }
        w = weights(tiny_cfg())  # reuse LM weights
        w = {k: v for k, v in w.items()
             if k.startswith("language_model.")}
        # low branch: SigLIP at width 32, 2x2 grid
        PL = "vision_model.vision_tower_low.vision_tower."
        E = 32
        w[PL + "patch_embed.proj.weight"] = rand(E, 3, 14, 14)
        w[PL + "patch_embed.proj.bias"] = rand(E)
        w[PL + "pos_embed"] = rand(1, 4, E)
        for i in range(2):
            q = PL + f"blocks.{i}."
            for nm in ("norm1", "norm2"):
                w[q + nm + ".weight"] = np.ones(E, np.float32)
                w[q + nm + ".bias"] = np.zeros(E, np.float32)
            w[q + "attn.qkv.weight"] = rand(3 * E, E)
            w[q + "attn.qkv.bias"] = rand(3 * E)
            w[q + "attn.proj.weight"] = rand(E, E)
            w[q + "attn.proj.bias"] = rand(E)
            w[q + "mlp.fc1.weight"] = rand(64, E)
            w[q + "mlp.fc1.bias"] = rand(64)
            w[q + "mlp.fc2.weight"] = rand(E, 64)
            w[q + "mlp.fc2.bias"] = rand(E)
        w[PL + "norm.weight"] = np.ones(E, np.float32)
        w[PL + "norm.bias"] = np.zeros(E, np.float32)
        # high branch: tiny SAM (2x2 grid, window 2, global at block 1)
        PH = "vision_model.vision_tower_high.vision_tower."
        SE = 16
        w[PH + "patch_embed.proj.weight"] = rand(SE, 3, 16, 16)
        w[PH + "patch_embed.proj.bias"] = rand(SE)
        w[PH + "pos_embed"] = rand(1, 2, 2, SE)
        for i in range(2):
            q = PH + f"blocks.{i}."
            for nm in ("norm1", "norm2"):
                w[q + nm + ".weight"] = np.ones(SE, np.float32)
                w[q + nm + ".bias"] = np.zeros(SE, np.float32)
            w[q + "attn.qkv.weight"] = rand(3 * SE, SE)
            w[q + "attn.qkv.bias"] = rand(3 * SE)
            w[q + "attn.proj.weight"] = rand(SE, SE)
            w[q + "attn.proj.bias"] = rand(SE)
            # window block grid = ws = 2; global block grid = 2
            w[q + "attn.rel_pos_h"] = rand(3, SE // 2)
            w[q + "attn.rel_pos_w"] = rand(3, SE // 2)
            w[q + "mlp.lin1.weight"] = rand(32, SE)
            w[q + "mlp.lin1.bias"] = rand(32)
            w[q + "mlp.lin2.weight"] = rand(SE, 32)
            w[q + "mlp.lin2.bias"] = rand(SE)
        for neck in ("neck", "neck_hd"):
            w[PH + neck + ".0.weight"] = rand(8, SE, 1, 1)
            w[PH + neck + ".1.weight"] = np.ones(8, np.float32)
            w[PH + neck + ".1.bias"] = np.zeros(8, np.float32)
            w[PH + neck + ".2.weight"] = rand(8, 8, 3, 3)
            w[PH + neck + ".3.weight"] = np.ones(8, np.float32)
            w[PH + neck + ".3.bias"] = np.zeros(8, np.float32)
        w[PH + "downsamples.0.weight"] = rand(24, 8, 3, 3)
        w[PH + "downsamples.1.weight"] = rand(32, 24, 3, 3)
        w[PH + "hd_alpha_downsamples"] = np.asarray([0.3], np.float32)
        # dead hybrid norms must be ignored by sanitize
        w["vision_model.high_layer_norm.weight"] = np.ones(32, np.float32)
        w["vision_model.low_layer_norm.weight"] = np.ones(32, np.float32)
        # hybrid-split aligner
        w["aligner.high_up_proj.weight"] = rand(16, 32)
        w["aligner.high_up_proj.bias"] = rand(16)
        w["aligner.low_up_proj.weight"] = rand(16, 32)
        w["aligner.low_up_proj.bias"] = rand(16)
        w["aligner.layers.1.weight"] = rand(32, 32)
        w["aligner.layers.1.bias"] = rand(32)

        model = load_model_from_weights(cfg, w, jnp.float32)
        ids = np.asarray([[1, 64, 64, 64, 64, 5]], np.int32)
        px = rng.standard_normal((1, 32, 32, 3)).astype(np.float32) * 0.1
        e = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), pixel_values=jnp.asarray(px))
        plain = jax.jit(model.get_input_embeddings)(model.params,
                                                    jnp.asarray(ids))
        assert not np.allclose(np.asarray(e[0, 1]), np.asarray(plain[0, 1]))
        assert np.isfinite(np.asarray(e)).all()
        toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=3)]
        assert len(toks) == 3
