"""Bunny (llava-qwen2) family: checkpoint-format load + image decode.

Reference: mlx_vlm/models/llava_bunny/ — text config at config.json root,
SigLIP tower under model.vision_tower.vision_tower.*, projector at
model.mm_projector.{0,2}, image token -200 spliced with 729 patches (here
the builtin processor pre-expands to (image_size/patch)^2 tokens)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_bunny_config():
    return {
        "model_type": "llava-qwen2",
        "hidden_size": 48,
        "intermediate_size": 96,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "rms_norm_eps": 1e-6,
        "vocab_size": 256,
        "tie_word_embeddings": True,
        "mm_hidden_size": 32,
        "image_token_index": -200,
        "vision_config": {
            "model_type": "siglip_vision_model",
            "num_hidden_layers": 2,
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_attention_heads": 4,
            "image_size": 28,
            "patch_size": 14,
            "layer_norm_eps": 1e-6,
        },
    }


def bunny_hf_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    vc = cfg["vision_config"]
    D, I = cfg["hidden_size"], cfg["intermediate_size"]
    E, VI = vc["hidden_size"], vc["intermediate_size"]
    P = vc["patch_size"]
    kvd = cfg["num_key_value_heads"] * (D // cfg["num_attention_heads"])
    n_pos = (vc["image_size"] // P) ** 2
    w = {}
    p = "model.vision_tower.vision_tower.vision_model."
    w[p + "embeddings.patch_embedding.weight"] = rand(E, 3, P, P)
    w[p + "embeddings.patch_embedding.bias"] = rand(E)
    w[p + "embeddings.position_embedding.weight"] = rand(n_pos, E)
    w[p + "post_layernorm.weight"] = np.ones(E, np.float32)
    w[p + "post_layernorm.bias"] = np.zeros(E, np.float32)
    # SigLIP probe head — must be dropped by sanitize
    w[p + "head.attention.in_proj_weight"] = rand(3 * E, E)
    w[p + "head.attention.in_proj_bias"] = rand(3 * E)
    for i in range(vc["num_hidden_layers"]):
        q = p + f"encoder.layers.{i}."
        for nm in ("layer_norm1", "layer_norm2"):
            w[q + nm + ".weight"] = np.ones(E, np.float32)
            w[q + nm + ".bias"] = np.zeros(E, np.float32)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            w[q + f"self_attn.{nm}.weight"] = rand(E, E)
            w[q + f"self_attn.{nm}.bias"] = rand(E)
        w[q + "mlp.fc1.weight"] = rand(VI, E)
        w[q + "mlp.fc1.bias"] = rand(VI)
        w[q + "mlp.fc2.weight"] = rand(E, VI)
        w[q + "mlp.fc2.bias"] = rand(E)
    w["model.mm_projector.0.weight"] = rand(D, E)
    w["model.mm_projector.0.bias"] = rand(D)
    w["model.mm_projector.2.weight"] = rand(D, D)
    w["model.mm_projector.2.bias"] = rand(D)
    w["model.embed_tokens.weight"] = rand(cfg["vocab_size"], D)
    w["model.norm.weight"] = np.ones(D, np.float32)
    for i in range(cfg["num_hidden_layers"]):
        q = f"model.layers.{i}."
        w[q + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[q + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        for nm, n in (("q_proj", D), ("k_proj", kvd), ("v_proj", kvd)):
            w[q + f"self_attn.{nm}.weight"] = rand(n, D)
            w[q + f"self_attn.{nm}.bias"] = rand(n)
        w[q + "self_attn.o_proj.weight"] = rand(D, D)
        w[q + "mlp.gate_proj.weight"] = rand(I, D)
        w[q + "mlp.up_proj.weight"] = rand(I, D)
        w[q + "mlp.down_proj.weight"] = rand(D, I)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_bunny_config()
    return load_model_from_weights(cfg, bunny_hf_weights(cfg), jnp.float32)


class TestLlavaBunny:
    def test_remap_resolves(self, model):
        assert type(model).__module__.endswith("llava_bunny.llava_bunny")
        assert model.config.text_config.attention_bias is True

    def test_image_decode(self, model):
        n_patches = 4  # (28/14)^2
        ids = np.concatenate([
            np.arange(4, dtype=np.int64) + 5,
            np.full(n_patches, -200, np.int64),
            np.arange(3, dtype=np.int64) + 40,
        ])[None]
        pix = np.random.default_rng(3).standard_normal(
            (1, 3, 28, 28)).astype(np.float32)
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), jnp.asarray(pix))
        assert embeds.shape == (1, ids.shape[1],
                                model.config.text_config.hidden_size)
        toks = [int(t[0]) for t, _ in generate_step(embeds, model,
                                                    max_tokens=4)]
        assert len(toks) == 4

    def test_image_changes_logits(self, model):
        ids = np.concatenate([
            np.arange(4, dtype=np.int64) + 5,
            np.full(4, -200, np.int64),
        ])[None]
        rng = np.random.default_rng(3)
        p1 = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
        p2 = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
        f = jax.jit(model.get_input_embeddings)
        e1 = f(model.params, jnp.asarray(ids), jnp.asarray(p1))
        e2 = f(model.params, jnp.asarray(ids), jnp.asarray(p2))
        assert not np.allclose(np.asarray(e1), np.asarray(e2))
        # text rows identical, image rows differ
        np.testing.assert_allclose(
            np.asarray(e1[:, :4]), np.asarray(e2[:, :4]))

    def test_processor_expands_image_token(self):
        from mlx_vlm_tpu.models.llava_bunny.processing import BunnyProcessor

        class Tok:
            pad_token_id = 0

            def __call__(self, text, add_special_tokens=False):
                return {"input_ids": [ord(c) % 100 for c in text]}

        proc = BunnyProcessor(Tok(), image_size=28, patch_size=14)
        from PIL import Image

        img = Image.new("RGB", (40, 40), (128, 60, 10))
        out = proc(text="hi <image> there", images=[img])
        assert (out["input_ids"] == -200).sum() == 4
        assert out["pixel_values"].shape == (1, 3, 28, 28)
