import numpy as np
import pytest

import jax.numpy as jnp

from mlx_vlm_tpu.core.quant import dequantize, quantize
from mlx_vlm_tpu.ops.qmatmul import quantized_matmul_pallas


class TestPallasQMM:
    @pytest.mark.parametrize("bits", [4, 8])
    def test_matches_dequant_matmul(self, bits):
        rng = np.random.default_rng(0)
        M, K, N = 4, 256, 512
        x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32))
        t = quantize(w, bits=bits, group_size=64)
        ref = x @ dequantize(t).T
        out = quantized_matmul_pallas(x, t, tile_n=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_batched_lead_dims(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 3, 128)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32))
        t = quantize(w, bits=8, group_size=64)
        ref = x @ dequantize(t).T
        out = quantized_matmul_pallas(x, t, tile_n=128, interpret=True)
        assert out.shape == (2, 3, 256)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)
