import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.core.quant import QuantizedTensor
from mlx_vlm_tpu.quant_utils import (
    dequantize_model,
    mixed_quant_predicate_builder,
    quantize_model,
)
from mlx_vlm_tpu.utils.testing import make_tiny_qwen2_vl


class TestQuantizeModel:
    def test_quantize_and_run(self):
        model = make_tiny_qwen2_vl(seed=8, dtype=jnp.float32)
        from mlx_vlm_tpu.generate.ar import generate_step

        ids = (np.arange(10, dtype=np.int32) % 200)[None]
        embeds = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        ref = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=5)]

        report = quantize_model(model, bits=8, group_size=32)
        assert report["quantized_layers"] > 0
        assert report["bits_per_weight"] < 32
        qt = model.params["language_model"]["model"]["layers"]["self_attn"]["q_proj"]["weight"]
        assert isinstance(qt, QuantizedTensor)
        # vision tower untouched
        vt = model.params["vision_tower"]["blocks"]["attn"]["qkv"]["weight"]
        assert not isinstance(vt, QuantizedTensor)

        # 8-bit model still greedy-decodes mostly identically (tiny model)
        from mlx_vlm_tpu.generate.ar import _ENGINES

        _ENGINES.clear()  # params structure changed; drop cached programs
        e2 = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        q8 = [int(t[0]) for t, _ in generate_step(e2, model, max_tokens=5)]
        assert sum(a == b for a, b in zip(ref, q8)) >= 3

        n = dequantize_model(model)
        assert n == report["quantized_layers"]
        qt2 = model.params["language_model"]["model"]["layers"]["self_attn"]["q_proj"]["weight"]
        assert not isinstance(qt2, QuantizedTensor)

    def test_mixed_predicate(self):
        pred = mixed_quant_predicate_builder(low_bits=4, high_bits=8)
        w = jnp.zeros((8, 64))
        assert pred("language_model.lm_head", w)["bits"] == 8
        assert pred("language_model.model.layers.mlp.gate_proj", w)["bits"] == 4
        assert pred("vision_tower.blocks.attn.qkv", w) is None
