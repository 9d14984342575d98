"""GLM-4.5V: glm4v tower + glm4_moe decoder with sectioned-half-split
mrope on partial rotary dims."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step, make_cache
from mlx_vlm_tpu.utils.loader import load_model_from_weights

from test_glm4_moe import hf_weights as moe_text_weights
from test_glm4_moe import tiny_cfg as tiny_moe_text_cfg
from test_glm4v import tiny_glm4v_config, tiny_glm4v_weights


def tiny_cfg():
    cfg = tiny_glm4v_config()
    text = tiny_moe_text_cfg()
    text["model_type"] = "glm4v_moe_text"
    text["head_dim"] = 16  # rot dim 8 -> 4 angle slots for [2,1,1]
    text["rope_scaling"] = {"rope_type": "default",
                            "mrope_section": [2, 1, 1]}
    vis = cfg["vision_config"]
    vis["out_hidden_size"] = text["hidden_size"]
    return {
        "model_type": "glm4v_moe",
        "image_token_id": 64,
        "video_token_id": 65,
        "text_config": text,
        "vision_config": vis,
    }


def weights(cfg, seed=0):
    # text side: glm4_moe HF keys under model.language_model.*
    w = {}
    for k, v in moe_text_weights(cfg["text_config"], seed).items():
        if k.startswith("model."):
            k = "model.language_model." + k[len("model."):]
        w[k] = v
    # vision side: reuse the glm4v tower keys
    gcfg = tiny_glm4v_config()
    gcfg["vision_config"] = cfg["vision_config"]
    for k, v in tiny_glm4v_weights(gcfg, seed + 1).items():
        if k.startswith("model.visual."):
            w[k] = v
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    return load_model_from_weights(cfg, weights(cfg), jnp.float32)


class TestGlm4vMoe:
    def test_image_generate(self, model):
        ids = np.asarray([[1, 64, 64, 64, 64, 2]], np.int32)
        grid = np.asarray([[1, 4, 4]])
        aux = model.vision_aux_inputs(grid)
        vc = model.config.vision_config
        dim = 3 * vc.temporal_patch_size * vc.patch_size**2
        rng = np.random.default_rng(0)
        pixels = rng.standard_normal((16, dim)).astype(np.float32) * 0.05
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids),
            pixel_values=jnp.asarray(pixels),
            **{k: jnp.asarray(v) for k, v in aux.items()},
        )
        plain = jax.jit(model.get_input_embeddings)(model.params,
                                                    jnp.asarray(ids))
        assert not np.allclose(np.asarray(embeds[0, 1]),
                               np.asarray(plain[0, 1]))
        toks = [int(t[0]) for t, _ in generate_step(embeds, model,
                                                    max_tokens=3)]
        assert len(toks) == 3

    def test_prefill_matches_stepwise(self, model):
        S = 5
        ids = (np.arange(S, dtype=np.int32) * 13 % 140)[None]
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

    def test_section_normalisation(self):
        # rotary-dim-unit sections (sum == rot_dim) normalise to angle
        # slots preserving ratios
        from mlx_vlm_tpu.models.glm4v_moe.config import TextConfig

        tc = TextConfig.from_dict(dict(
            tiny_moe_text_cfg(), head_dim=16,
            rope_scaling={"mrope_section": [4, 2, 2]}))  # sum 8 = rot dim
        assert tc.mrope_section == [2, 1, 1]

    def test_moe_layers_present(self, model):
        lm = model.params["language_model"]["model"]
        assert "moe_layers" in lm and "dense_layers" in lm
