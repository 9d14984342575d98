import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_pixtral_config():
    return {
        "model_type": "pixtral",
        "image_token_id": 10,
        "vision_feature_layer": -1,
        "vision_feature_select_strategy": "full",
        "text_config": {
            "model_type": "mistral",
            "hidden_size": 64,
            "num_hidden_layers": 2,
            "intermediate_size": 128,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "rms_norm_eps": 1e-5,
            "vocab_size": 256,
            "rope_theta": 10000.0,
            "head_dim": 16,
        },
        "vision_config": {
            "model_type": "pixtral",
            "num_hidden_layers": 2,
            "hidden_size": 32,
            "head_dim": 8,
            "intermediate_size": 64,
            "num_attention_heads": 4,
            "image_size": 64,
            "patch_size": 16,
            "rope_theta": 10000.0,
        },
    }


def tiny_pixtral_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    from mlx_vlm_tpu.utils.testing import llama_hf_weights

    tc, vc = cfg["text_config"], cfg["vision_config"]
    w = {
        "language_model." + k: v
        for k, v in llama_hf_weights(tc, seed, scale).items()
    }
    E, P, I = vc["hidden_size"], vc["patch_size"], vc["intermediate_size"]
    w["vision_tower.patch_conv.weight"] = rand(E, 3, P, P)
    w["vision_tower.ln_pre.weight"] = np.ones(E, np.float32)
    for i in range(vc["num_hidden_layers"]):
        q = f"vision_tower.transformer.layers.{i}."
        w[q + "attention_norm.weight"] = np.ones(E, np.float32)
        w[q + "ffn_norm.weight"] = np.ones(E, np.float32)
        for nm in ("q_proj", "k_proj", "v_proj", "o_proj"):
            w[q + f"attention.{nm}.weight"] = rand(
                vc["num_attention_heads"] * vc["head_dim"], E
            ) if nm != "o_proj" else rand(E, vc["num_attention_heads"] * vc["head_dim"])
        w[q + "feed_forward.gate_proj.weight"] = rand(I, E)
        w[q + "feed_forward.up_proj.weight"] = rand(I, E)
        w[q + "feed_forward.down_proj.weight"] = rand(E, I)
    D = tc["hidden_size"]
    w["multi_modal_projector.linear_1.weight"] = rand(D, E)
    w["multi_modal_projector.linear_1.bias"] = rand(D)
    w["multi_modal_projector.linear_2.weight"] = rand(D, D)
    w["multi_modal_projector.linear_2.bias"] = rand(D)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_pixtral_config()
    return load_model_from_weights(cfg, tiny_pixtral_weights(cfg), jnp.float32)


class TestPixtral:
    def test_variable_size_images(self, model):
        """Two differently-sized images in one flattened sequence."""
        vc = model.config.vision_config
        grids = np.asarray([[2, 3], [4, 2]])  # (h, w) patch grids
        aux = model.vision_aux_inputs(grids)
        N = 2 * 3 + 4 * 2
        assert aux["rotary_freqs"].shape == (N, vc.head_dim // 2)
        assert aux["segment_ids"].tolist() == [0] * 6 + [1] * 8
        pv = np.random.default_rng(0).standard_normal(
            (N, 3 * vc.patch_size**2)
        ).astype(np.float32)
        feats = model.vision_features(
            model.params, jnp.asarray(pv),
            jnp.asarray(aux["rotary_freqs"]), jnp.asarray(aux["segment_ids"]),
        )
        assert feats.shape == (N, model.config.text_config.hidden_size)

    def test_full_pipeline(self, model):
        cfg = model.config
        vc = cfg.vision_config
        grids = np.asarray([[2, 2]])
        aux = model.vision_aux_inputs(grids)
        ids = np.asarray([[1] + [cfg.image_token_index] * 4 + [2]])
        pv = np.random.default_rng(1).standard_normal(
            (4, 3 * vc.patch_size**2)
        ).astype(np.float32)
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), jnp.asarray(pv),
            **{k: jnp.asarray(v) for k, v in aux.items()},
        )
        toks = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=4)]
        assert len(toks) == 4

    def test_image_isolation(self, model):
        """Second image's pixels must not affect the first image's features."""
        vc = model.config.vision_config
        grids = np.asarray([[2, 2], [2, 2]])
        aux = model.vision_aux_inputs(grids)
        rng = np.random.default_rng(2)
        pv1 = rng.standard_normal((8, 3 * vc.patch_size**2)).astype(np.float32)
        pv2 = pv1.copy()
        pv2[4:] = rng.standard_normal((4, 3 * vc.patch_size**2))
        f1 = model.vision_features(
            model.params, jnp.asarray(pv1),
            jnp.asarray(aux["rotary_freqs"]), jnp.asarray(aux["segment_ids"]),
        )
        f2 = model.vision_features(
            model.params, jnp.asarray(pv2),
            jnp.asarray(aux["rotary_freqs"]), jnp.asarray(aux["segment_ids"]),
        )
        np.testing.assert_allclose(np.asarray(f1[:4]), np.asarray(f2[:4]), atol=1e-5)
