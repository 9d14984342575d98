import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.models.idefics3.idefics3 import pixel_shuffle
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_idefics3_config():
    return {
        "model_type": "idefics3",
        "image_token_id": 77,
        "scale_factor": 2,
        "text_config": {
            "model_type": "llama",
            "hidden_size": 64,
            "num_hidden_layers": 2,
            "intermediate_size": 128,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "rms_norm_eps": 1e-5,
            "vocab_size": 256,
            "rope_theta": 10000.0,
        },
        "vision_config": {
            "model_type": "idefics3_vision",
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "intermediate_size": 64,
            "num_attention_heads": 4,
            "image_size": 56,  # 4x4 patches -> pixel shuffle -> 4 tokens
            "patch_size": 14,
        },
    }


def tiny_idefics3_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    from mlx_vlm_tpu.utils.testing import llama_hf_weights

    tc, vc = cfg["text_config"], cfg["vision_config"]
    w = {}
    for k, v in llama_hf_weights(tc, seed, scale).items():
        if k.startswith("model."):
            w["model.text_model." + k[len("model."):]] = v
        else:
            w[k] = v
    E, P, C, I = vc["hidden_size"], vc["patch_size"], 3, vc["intermediate_size"]
    n_pos = (vc["image_size"] // P) ** 2
    p = "model.vision_model."
    w[p + "embeddings.patch_embedding.weight"] = rand(E, C, P, P)
    w[p + "embeddings.patch_embedding.bias"] = rand(E)
    w[p + "embeddings.position_embedding.weight"] = rand(n_pos, E)
    w[p + "post_layernorm.weight"] = np.ones(E, np.float32)
    w[p + "post_layernorm.bias"] = np.zeros(E, np.float32)
    for i in range(vc["num_hidden_layers"]):
        q = p + f"encoder.layers.{i}."
        for nm in ("layer_norm1", "layer_norm2"):
            w[q + nm + ".weight"] = np.ones(E, np.float32)
            w[q + nm + ".bias"] = np.zeros(E, np.float32)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            w[q + f"self_attn.{nm}.weight"] = rand(E, E)
            w[q + f"self_attn.{nm}.bias"] = rand(E)
        w[q + "mlp.fc1.weight"] = rand(I, E)
        w[q + "mlp.fc1.bias"] = rand(I)
        w[q + "mlp.fc2.weight"] = rand(E, I)
        w[q + "mlp.fc2.bias"] = rand(E)
    sf = cfg["scale_factor"]
    w["model.connector.modality_projection.proj.weight"] = rand(
        tc["hidden_size"], E * sf * sf
    )
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_idefics3_config()
    return load_model_from_weights(cfg, tiny_idefics3_weights(cfg), jnp.float32)


class TestPixelShuffle:
    def test_shapes_and_content(self):
        B, g, E, sf = 1, 4, 8, 2
        x = jnp.arange(B * g * g * E, dtype=jnp.float32).reshape(B, g * g, E)
        y = pixel_shuffle(x, sf)
        assert y.shape == (B, (g // sf) ** 2, E * sf * sf)
        # every input element appears exactly once
        assert sorted(np.asarray(y).ravel().tolist()) == sorted(
            np.asarray(x).ravel().tolist()
        )


class TestIdefics3:
    def test_full_pipeline(self, model):
        cfg = model.config
        vc = cfg.vision_config
        n_img_tokens = ((vc.image_size // vc.patch_size) ** 2) // (
            cfg.scale_factor**2
        )
        ids = np.asarray([[1] + [cfg.image_token_id] * n_img_tokens + [2, 3]])
        pv = np.random.default_rng(1).standard_normal(
            (1, 3, vc.image_size, vc.image_size)
        ).astype(np.float32)
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), jnp.asarray(pv)
        )
        assert embeds.shape == (1, ids.shape[1], cfg.text_config.hidden_size)
        toks = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=4)]
        assert len(toks) == 4

    def test_smolvlm_model_type_alias(self):
        cfg = tiny_idefics3_config()
        cfg["model_type"] = "smolvlm"
        from mlx_vlm_tpu.utils.loader import MODEL_REMAPPING

        assert MODEL_REMAPPING.get("smolvlm") == "idefics3"
