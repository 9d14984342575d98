"""Image-gen model discovery (model_index.json protocol) + bonsai import."""

import json

import numpy as np

import jax.numpy as jnp

from mlx_vlm_tpu.imagegen.discovery import (image_model_loader,
                                            is_image_generation_model,
                                            model_index_class)


def test_id_aliases():
    assert is_image_generation_model("black-forest/flux2-klein-4b")
    assert is_image_generation_model("acme/bonsai-ternary")
    assert not is_image_generation_model("meta-llama/Llama-3-8B")
    assert not is_image_generation_model(None)


def test_model_index_discovery(tmp_path):
    d = tmp_path / "ckpt"
    d.mkdir()
    (d / "model_index.json").write_text(
        json.dumps({"_class_name": "Flux2Pipeline"}))
    assert model_index_class(d) == "Flux2Pipeline"
    assert image_model_loader(str(d)) is not None


def test_flux2_layout_discovery(tmp_path):
    d = tmp_path / "mystery-model"
    (d / "transformer").mkdir(parents=True)
    (d / "vae").mkdir()
    assert is_image_generation_model(str(d))


def test_bonsai_mlx_triple_dequant():
    """MLX affine 4-bit triples expand bit-exactly to dense weights."""
    from mlx_vlm_tpu.core.quant import dequantize, quantize
    from mlx_vlm_tpu.models.bonsai import _dequantize_mlx_triples

    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 128)).astype(np.float32)
    qt = quantize(jnp.asarray(w), bits=4, group_size=64)
    dense = np.asarray(dequantize(qt))
    # repack to the mlx uint32 little-endian word layout
    q_u8 = np.asarray(qt.q)  # [8, 64] two nibbles per byte, low-first
    words = q_u8.view(np.uint32)
    raw = {"blocks.0.ff.weight": words,
           "blocks.0.ff.weight.scales": np.asarray(qt.scales)[..., 0],
           "blocks.0.ff.weight.biases": np.asarray(qt.biases)[..., 0],
           "blocks.0.norm.weight": np.ones(8, np.float32)}
    # scales stored [out, groups] in mlx
    raw["blocks.0.ff.weight.scales"] = np.asarray(qt.scales).reshape(8, -1)
    raw["blocks.0.ff.weight.biases"] = np.asarray(qt.biases).reshape(8, -1)
    out = _dequantize_mlx_triples(raw, jnp.float32)
    assert set(out) == {"blocks.0.ff.weight", "blocks.0.norm.weight"}
    np.testing.assert_allclose(out["blocks.0.ff.weight"], dense, atol=1e-6)
