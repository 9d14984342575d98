"""dots.ocr: RMSNorm NaViT + qwen2 decoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from mlx_vlm_tpu.utils.testing import llama_hf_weights, tiny_llama_config


def tiny_dots_config():
    text = tiny_llama_config()
    text["model_type"] = "qwen2"
    return {
        "model_type": "dots_ocr",
        "image_token_id": 64,
        "text_config": text,
        "vision_config": {
            "model_type": "dots_vit",
            "embed_dim": 32,
            "hidden_size": 64,  # = text hidden
            "intermediate_size": 64,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "patch_size": 14,
            "spatial_merge_size": 2,
            "temporal_patch_size": 1,
            "use_bias": False,
            "post_norm": True,
        },
    }


def tiny_dots_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    w = {"" + k: v for k, v in llama_hf_weights(cfg["text_config"], seed).items()}
    vc = cfg["vision_config"]
    E, P = vc["embed_dim"], vc["patch_size"]
    p = "vision_tower."
    w[p + "patch_embed.patchifier.proj.weight"] = rand(E, 3, P, P)
    w[p + "patch_embed.patchifier.proj.bias"] = rand(E)
    w[p + "patch_embed.patchifier.norm.weight"] = np.ones(E, np.float32)
    for i in range(vc["num_hidden_layers"]):
        q = p + f"blocks.{i}."
        w[q + "norm1.weight"] = np.ones(E, np.float32)
        w[q + "norm2.weight"] = np.ones(E, np.float32)
        w[q + "attn.qkv.weight"] = rand(3 * E, E)
        w[q + "attn.proj.weight"] = rand(E, E)
        w[q + "mlp.fc1.weight"] = rand(vc["intermediate_size"], E)
        w[q + "mlp.fc3.weight"] = rand(vc["intermediate_size"], E)
        w[q + "mlp.fc2.weight"] = rand(E, vc["intermediate_size"])
    w[p + "post_trunk_norm.weight"] = np.ones(E, np.float32)
    mu = vc["spatial_merge_size"] ** 2
    w[p + "merger.ln_q.weight"] = np.ones(E, np.float32)
    w[p + "merger.ln_q.bias"] = np.zeros(E, np.float32)
    w[p + "merger.mlp.0.weight"] = rand(mu * E, mu * E)
    w[p + "merger.mlp.0.bias"] = rand(mu * E)
    w[p + "merger.mlp.2.weight"] = rand(vc["hidden_size"], mu * E)
    w[p + "merger.mlp.2.bias"] = rand(vc["hidden_size"])
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_dots_config()
    return load_model_from_weights(cfg, tiny_dots_weights(cfg, 2), jnp.float32)


class TestDotsOCR:
    def test_image_generate(self, model):
        ids = np.asarray([[1, 64, 64, 64, 64, 2]], np.int32)
        grid = np.asarray([[1, 4, 4]])
        aux = model.vision_aux_inputs(grid)
        vc = model.config.vision_config
        dim = 3 * vc.temporal_patch_size * vc.patch_size**2
        rng = np.random.default_rng(0)
        pixels = rng.standard_normal((16, dim)).astype(np.float32) * 0.05
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), pixel_values=jnp.asarray(pixels),
            **{k: jnp.asarray(v) for k, v in aux.items()},
        )
        plain = jax.jit(model.get_input_embeddings)(model.params,
                                                    jnp.asarray(ids))
        assert not np.allclose(np.asarray(embeds[0, 1]), np.asarray(plain[0, 1]))
        toks = [int(t[0]) for t, _ in generate_step(embeds, model,
                                                    max_tokens=3)]
        assert len(toks) == 3

    def test_text_only(self, model):
        ids = (np.arange(5, dtype=np.int32) % 200)[None]
        e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=3)]
        assert len(toks) == 3
