import json
import tempfile
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from mlx_vlm_tpu.utils.testing import (
    build_tiny_checkpoint,
    qwen2_vl_hf_weights,
    tiny_qwen2_vl_config,
)


class TestConvert:
    def test_convert_quantize_roundtrip(self):
        """convert -q output must load and run through the framework."""
        from safetensors.numpy import save_file

        from mlx_vlm_tpu.convert import convert
        from mlx_vlm_tpu.core.quant import QuantizedTensor
        from mlx_vlm_tpu.utils.loader import load_model

        with tempfile.TemporaryDirectory() as src, tempfile.TemporaryDirectory() as dst:
            cfg = tiny_qwen2_vl_config(
                hidden_size=64, intermediate_size=128, vocab_size=256
            )
            save_file(qwen2_vl_hf_weights(cfg, 3), f"{src}/model.safetensors")
            with open(f"{src}/config.json", "w") as f:
                json.dump(cfg, f)
            convert(src, dst, quantize=True, q_bits=4, q_group_size=32)
            out_cfg = json.load(open(f"{dst}/config.json"))
            assert out_cfg["quantization"] == {"bits": 4, "group_size": 32}

            model = load_model(dst, dtype=jnp.float32)
            from mlx_vlm_tpu.core.quant import (ChannelQuantizedTensor,
                                                Int4GroupedTensor)
            from mlx_vlm_tpu.utils.loader import ensure_layer_params

            # 4-bit checkpoints default to the pack-only fused w4grp
            # layout: the pack is the sole copy of the layer linears
            lp = model.params["language_model"]
            assert "fused_decode" in lp
            assert "layers" not in lp["model"]
            # per-linear consumers (shard/LoRA/convert) rematerialize
            ensure_layer_params(model)
            qt = lp["model"]["layers"]["self_attn"]["q_proj"]["weight"]
            assert isinstance(qt, Int4GroupedTensor)
            assert qt.qp.ndim == 3  # stacked [L, K, N2p]
            # vision tower must NOT be quantized (skip_vision default)
            vt = model.params["vision_tower"]["blocks"]["attn"]["qkv"]["weight"]
            assert not isinstance(vt, (QuantizedTensor, ChannelQuantizedTensor))
            del lp["model"]["layers"]  # back to pack-only for generation

            # quantized model generates
            import jax

            from mlx_vlm_tpu.generate.ar import generate_step

            ids = (np.arange(8, dtype=np.int32) % 200)[None]
            embeds = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
            toks = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=3)]
            assert len(toks) == 3

    def test_convert_mixed_recipe_roundtrip(self):
        """--quant-predicate mixed_2_8: per-path bit overrides land in
        config.quantization and the output loads + generates (reference
        convert.py:74 mixed_quant_predicate_builder)."""
        from safetensors.numpy import save_file

        from mlx_vlm_tpu.convert import convert, mixed_quant_predicate_builder
        from mlx_vlm_tpu.utils.loader import load_model

        with tempfile.TemporaryDirectory() as src, \
                tempfile.TemporaryDirectory() as dst:
            cfg = tiny_qwen2_vl_config(
                hidden_size=64, intermediate_size=128, vocab_size=256,
                num_hidden_layers=2,
            )
            save_file(qwen2_vl_hf_weights(cfg, 3), f"{src}/model.safetensors")
            with open(f"{src}/config.json", "w") as f:
                json.dump(cfg, f)
            pred = mixed_quant_predicate_builder("mixed_2_8", cfg,
                                                 group_size=32)
            convert(src, dst, quantize=True, q_bits=2, q_group_size=32,
                    quant_predicate=pred)
            out_cfg = json.load(open(f"{dst}/config.json"))
            q = out_cfg["quantization"]
            assert q["bits"] == 2
            # last-eighth rule: layer 1 (of 2) v_proj gets the high width
            assert q["model.layers.1.self_attn.v_proj"]["bits"] == 8
            assert q["model.layers.1.mlp.down_proj"]["bits"] == 8
            # lm_head / embed_tokens always high
            assert q["lm_head"]["bits"] == 8
            assert q["model.embed_tokens"]["bits"] == 8
            # plain low-bit paths carry no per-path override
            assert "model.layers.0.self_attn.q_proj" not in q

            import jax

            from mlx_vlm_tpu.generate.ar import generate_step

            model = load_model(dst, dtype=jnp.float32)
            ids = (np.arange(8, dtype=np.int32) % 200)[None]
            embeds = jax.jit(model.get_input_embeddings)(
                model.params, jnp.asarray(ids))
            toks = [int(t[0]) for t, _ in generate_step(embeds, model,
                                                        max_tokens=3)]
            assert len(toks) == 3

    def test_mixed_recipe_names(self):
        from mlx_vlm_tpu.convert import MIXED_RECIPES, \
            mixed_quant_predicate_builder

        assert MIXED_RECIPES["mixed_3_6"] == (4, 8)  # rounded up for TPU
        with pytest.raises(ValueError, match="recipe"):
            mixed_quant_predicate_builder("mixed_9_9", {})

    def test_quantized_close_to_original(self):
        from mlx_vlm_tpu.convert import _quantize_affine_packed
        from mlx_vlm_tpu.core.quant import dequantize, from_mlx_packed

        w = np.random.default_rng(0).standard_normal((16, 64)).astype(np.float32)
        packed, scales, biases = _quantize_affine_packed(w, 4, 32)
        t = from_mlx_packed(packed, scales, biases, 4, 32)
        err = np.abs(np.asarray(dequantize(t), np.float32) - w).max()
        assert err < 0.3


class TestDeviceImageOps:
    def test_qwen2vl_device_matches_numpy(self):
        """Device pipeline == numpy pipeline when no resize is needed."""
        from mlx_vlm_tpu.ops.image import preprocess_qwen2vl
        from mlx_vlm_tpu.utils.processing import Qwen2VLImageProcessor

        rng = np.random.default_rng(0)
        img = (rng.random((56, 56, 3)) * 255).astype(np.uint8)
        proc = Qwen2VLImageProcessor()
        ref = proc({"dummy": None} and img)  # numpy/PIL path
        dev = preprocess_qwen2vl(jnp.asarray(img), (56, 56))
        assert dev.shape == ref["pixel_values"].shape
        np.testing.assert_allclose(
            np.asarray(dev), ref["pixel_values"], atol=1e-4, rtol=1e-4
        )

    def test_resize_shapes(self):
        from mlx_vlm_tpu.ops.image import preprocess_qwen2vl, preprocess_square

        img = jnp.zeros((100, 130, 3), jnp.uint8)
        out = preprocess_qwen2vl(img, (84, 112))
        assert out.shape == ((84 // 14) * (112 // 14), 3 * 2 * 14 * 14)
        sq = preprocess_square(img, 56)
        assert sq.shape == (3, 56, 56)
