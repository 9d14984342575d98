"""GLM-OCR: rope-only glm4v tower (no pos table) + plain-norm decoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step, make_cache
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_cfg():
    return {
        "model_type": "glm_ocr",
        "image_token_id": 64,
        "video_token_id": 65,
        "text_config": {
            "model_type": "glm_ocr_text",
            "vocab_size": 256,
            "hidden_size": 48,
            "intermediate_size": 96,
            "num_attention_heads": 4,
            "num_hidden_layers": 2,
            "num_key_value_heads": 2,
            "head_dim": 16,
            "rms_norm_eps": 1e-5,
            "attention_bias": True,
            "rope_parameters": {"rope_type": "default",
                                "mrope_section": [4, 2, 2],
                                "partial_rotary_factor": 1.0,
                                "rope_theta": 10000},
        },
        "vision_config": {
            "model_type": "glm_ocr_vision",
            "depth": 2,
            "hidden_size": 32,
            "intermediate_size": 64,
            "out_hidden_size": 48,
            "num_heads": 4,
            "patch_size": 14,
            "image_size": 56,
            "spatial_merge_size": 2,
            "temporal_patch_size": 2,
        },
    }


def weights(cfg, seed=0):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.05).astype(np.float32)

    tc, vc = cfg["text_config"], cfg["vision_config"]
    D, V, I = tc["hidden_size"], tc["vocab_size"], tc["intermediate_size"]
    nh, nkv, hd = (tc["num_attention_heads"], tc["num_key_value_heads"],
                   tc["head_dim"])
    w = {
        "model.language_model.embed_tokens.weight": rand(V, D),
        "model.language_model.norm.weight": np.ones(D, np.float32),
        "lm_head.weight": rand(V, D),
    }
    for i in range(tc["num_hidden_layers"]):
        p = f"model.language_model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.q_proj.weight"] = rand(nh * hd, D)
        w[p + "self_attn.q_proj.bias"] = rand(nh * hd)
        w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.k_proj.bias"] = rand(nkv * hd)
        w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.v_proj.bias"] = rand(nkv * hd)
        w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
        w[p + "mlp.gate_up_proj.weight"] = rand(2 * I, D)
        w[p + "mlp.down_proj.weight"] = rand(D, I)
    E, P, T = vc["hidden_size"], vc["patch_size"], vc["temporal_patch_size"]
    p = "model.visual."
    w[p + "patch_embed.proj.weight"] = rand(E, 3, T, P, P)
    w[p + "patch_embed.proj.bias"] = rand(E)
    w[p + "post_layernorm.weight"] = np.ones(E, np.float32)
    for i in range(vc["depth"]):
        q = p + f"blocks.{i}."
        w[q + "norm1.weight"] = np.ones(E, np.float32)
        w[q + "norm2.weight"] = np.ones(E, np.float32)
        w[q + "attn.qkv.weight"] = rand(3 * E, E)
        w[q + "attn.proj.weight"] = rand(E, E)
        w[q + "mlp.gate_proj.weight"] = rand(vc["intermediate_size"], E)
        w[q + "mlp.up_proj.weight"] = rand(vc["intermediate_size"], E)
        w[q + "mlp.down_proj.weight"] = rand(E, vc["intermediate_size"])
    O = vc["out_hidden_size"]
    w[p + "downsample.weight"] = rand(O, E, 2, 2)
    w[p + "downsample.bias"] = rand(O)
    ctx = O * 3
    w[p + "merger.proj.weight"] = rand(O, O)
    w[p + "merger.post_projection_norm.weight"] = np.ones(O, np.float32)
    w[p + "merger.post_projection_norm.bias"] = np.zeros(O, np.float32)
    w[p + "merger.gate_proj.weight"] = rand(ctx, O)
    w[p + "merger.up_proj.weight"] = rand(ctx, O)
    w[p + "merger.down_proj.weight"] = rand(O, ctx)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    return load_model_from_weights(cfg, weights(cfg, 3), jnp.float32)


class TestGlmOcr:
    def test_image_generate(self, model):
        ids = np.asarray([[1, 64, 64, 64, 64, 2]], np.int32)
        grid = np.asarray([[1, 4, 4]])
        aux = model.vision_aux_inputs(grid)
        vc = model.config.vision_config
        dim = 3 * vc.temporal_patch_size * vc.patch_size**2
        rng = np.random.default_rng(0)
        px = rng.standard_normal((16, dim)).astype(np.float32) * 0.05
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), pixel_values=jnp.asarray(px),
            **{k: jnp.asarray(v) for k, v in aux.items()})
        plain = jax.jit(model.get_input_embeddings)(model.params,
                                                    jnp.asarray(ids))
        assert not np.allclose(np.asarray(embeds[0, 1]),
                               np.asarray(plain[0, 1]))
        toks = [int(t[0]) for t, _ in generate_step(embeds, model,
                                                    max_tokens=3)]
        assert len(toks) == 3

    def test_prefill_matches_stepwise(self, model):
        S = 5
        ids = (np.arange(S, dtype=np.int32) * 13 % 200)[None]
        e = jax.jit(model.get_input_embeddings)(model.params,
                                                jnp.asarray(ids))
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S)).copy()
        cache = make_cache(model, 1, 16, jnp.float32)
        lf, _ = model(model.params, e, cache, jnp.asarray(pos))
        cache2 = make_cache(model, 1, 16, jnp.float32)
        for t in range(S):
            p = np.full((3, 1, 1), t, np.int32)
            lg, cache2 = model(model.params, e[:, t:t + 1], cache2,
                               jnp.asarray(p))
        np.testing.assert_allclose(np.asarray(lf[0, -1]),
                                   np.asarray(lg[0, 0]),
                                   atol=2e-4, rtol=1e-3)

    def test_no_sandwich_norms(self, model):
        assert model.language_model.sandwich is False
        lp = model.params["language_model"]["model"]["layers"]
        assert "post_self_attn_layernorm" not in lp
