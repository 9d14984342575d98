"""Quantized-checkpoint import breadth: compressed-tensors nvfp4/int4,
1-bit affine, dynamic int8 activation quantization.

Contract parity: reference mlx_vlm/utils.py:86-291
(_transform_compressed_tensors_*), quantization/one_bit.py
(dequantize_one_bit semantics), utils.py:294 (quantize_activations).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.core.quant import (ChannelQuantizedTensor, NVFP4Tensor,
                                    channel_quantized_matmul,
                                    channel_quantized_matmul_int8,
                                    dequantize, e4m3_decode_table,
                                    from_compressed_nvfp4, nvfp4_dequantize,
                                    quantize, set_activation_quant,
                                    to_channel_quantized)
from mlx_vlm_tpu.utils.loader import _transform_compressed_tensors


def _encode_e4m3(x: float) -> int:
    """Brute-force nearest-byte E4M3 encode for test fixtures."""
    lut = e4m3_decode_table()
    finite = np.where(np.isnan(lut), np.inf, np.abs(lut - x))
    return int(np.argmin(finite))


class TestE4M3:
    def test_table_known_values(self):
        lut = e4m3_decode_table()
        assert lut[0x00] == 0.0
        assert lut[0x38] == 1.0  # e=7, m=0
        assert lut[0x40] == 2.0  # e=8
        assert lut[0x7E] == 448.0  # max finite
        assert np.isnan(lut[0x7F])
        assert lut[0xB8] == -1.0

    def test_subnormals(self):
        lut = e4m3_decode_table()
        assert lut[0x01] == pytest.approx(2.0**-9)
        assert lut[0x07] == pytest.approx(7 / 8 * 2.0**-6)


class TestNVFP4:
    def _fixture(self, out=4, inp=32, seed=0):
        """Build packed E2M1 codes whose decode we know exactly."""
        rng = np.random.default_rng(seed)
        codes = rng.integers(0, 16, (out, inp)).astype(np.uint8)
        codes[codes == 8] = 0  # avoid -0 ambiguity
        packed = (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(np.uint8)
        scale_bytes = np.full((out, inp // 16), 0x38, np.uint8)  # 1.0
        gscale = np.asarray([2.0], np.float32)
        lut = np.concatenate([
            np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0]),
            -np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0])])
        expect = lut[codes] * (1.0 / 2.0)
        return packed, scale_bytes, gscale, expect

    def test_decode_exact(self):
        packed, sb, gs, expect = self._fixture()
        t = from_compressed_nvfp4(packed, sb, gs)
        got = np.asarray(nvfp4_dequantize(t, jnp.float32))
        np.testing.assert_allclose(got, expect, rtol=1e-6)

    def test_matmul_matches_dense(self):
        from mlx_vlm_tpu.core.layers import linear

        packed, sb, gs, expect = self._fixture(out=8, inp=64, seed=1)
        t = from_compressed_nvfp4(packed, sb, gs, out_dtype="float32")
        x = jnp.asarray(np.random.default_rng(2).standard_normal((3, 64)),
                        jnp.float32)
        y = linear({"weight": t}, x)
        ref = np.asarray(x) @ expect.T
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)

    def test_loader_transform_nvfp4(self):
        packed, sb, gs, _ = self._fixture()
        weights = {
            "model.l.weight_packed": packed,
            "model.l.weight_scale": sb,
            "model.l.weight_global_scale": gs,
            "model.norm.weight": np.ones(4, np.float32),
        }
        qc = {"quant_method": "compressed-tensors",
              "format": "nvfp4-pack-quantized",
              "config_groups": {"group_0": {"weights": {"num_bits": 4}}}}
        out, folded = _transform_compressed_tensors(weights, qc)
        assert folded["mode"] == "nvfp4"
        assert isinstance(out["model.l.weight"], NVFP4Tensor)
        assert "model.l.weight_scale" not in out
        assert "model.norm.weight" in out


class TestCompressedInt4:
    def test_transform_matches_affine_semantics(self):
        rng = np.random.default_rng(3)
        out_d, in_d, gs = 4, 64, 32
        codes = rng.integers(0, 16, (out_d, in_d)).astype(np.uint32)
        packed = np.zeros((out_d, in_d // 8), np.uint32)
        for j in range(8):
            packed |= codes[:, j::8] << (4 * j)
        scale = rng.uniform(0.01, 0.1, (out_d, in_d // gs)).astype(np.float32)
        weights = {
            "model.l.weight_packed": packed.view(np.int32),
            "model.l.weight_scale": scale,
            "model.l.weight_shape": np.asarray([out_d, in_d], np.int64),
        }
        qc = {"quant_method": "compressed-tensors", "format": "pack-quantized",
              "config_groups": {"group_0": {"weights": {
                  "type": "int", "num_bits": 4, "group_size": gs}}}}
        out, folded = _transform_compressed_tensors(weights, qc)
        assert folded == {"mode": "affine", "bits": 4, "group_size": gs}
        assert "model.l.weight_shape" not in out
        # fold through the affine path and check dequant == symmetric int4
        from mlx_vlm_tpu.core.quant import from_mlx_packed

        qt = from_mlx_packed(out["model.l.weight"], out["model.l.scales"],
                             out["model.l.biases"], 4, gs)
        w = np.asarray(dequantize(qt, jnp.float32))
        expect = (codes.astype(np.float32) - 8.0) * np.repeat(scale, gs,
                                                              axis=1)
        np.testing.assert_allclose(w, expect, rtol=1e-5, atol=1e-6)


class TestOneBit:
    def test_roundtrip_binary_codes(self):
        """bits=1 affine: quantize->dequantize recovers a two-level signal."""
        rng = np.random.default_rng(4)
        sign = rng.choice([-1.0, 1.0], size=(8, 128)).astype(np.float32)
        w = jnp.asarray(sign * 0.5)
        t = quantize(w, bits=1, group_size=64)
        assert t.q.shape[-1] == 128 // 8  # 8 codes per byte
        back = np.asarray(dequantize(t, jnp.float32))
        np.testing.assert_allclose(back, np.asarray(w), atol=1e-3)

    def test_one_bit_checkpoint_fold(self, tmp_path):
        """A 1-bit mlx-affine checkpoint loads through the standard fold."""
        from mlx_vlm_tpu.utils.loader import _fold_quantized

        rng = np.random.default_rng(5)
        w = rng.choice([-0.3, 0.7], size=(4, 64)).astype(np.float32)
        t = quantize(jnp.asarray(w), bits=1, group_size=32)
        # re-pack our u8 layout into mlx u32 words
        u32 = np.asarray(t.q).view(np.uint32)
        flat = {"l.weight": u32, "l.scales": np.asarray(t.scales),
                "l.biases": np.asarray(t.biases)}
        import os

        os.environ["MLX_VLM_TPU_RUNTIME_QUANT"] = "exact"
        try:
            out = _fold_quantized(flat, {"bits": 1, "group_size": 32})
        finally:
            os.environ.pop("MLX_VLM_TPU_RUNTIME_QUANT")
        qt = out["l.weight"]
        assert qt.bits == 1
        np.testing.assert_allclose(np.asarray(dequantize(qt, jnp.float32)),
                                   w, atol=1e-3)


class TestActivationQuant:
    def _channel_tensor(self, seed=0, out_d=16, in_d=64):
        rng = np.random.default_rng(seed)
        w = jnp.asarray(rng.standard_normal((out_d, in_d)) * 0.1, jnp.float32)
        return to_channel_quantized(quantize(w, bits=8, group_size=32)), w

    def test_int8_matmul_close_to_float(self):
        t, w = self._channel_tensor()
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((5, 64)), jnp.float32)
        y_f = channel_quantized_matmul(x, t)
        y_q = channel_quantized_matmul_int8(x, t)
        err = np.abs(np.asarray(y_f) - np.asarray(y_q)).max()
        mag = np.abs(np.asarray(y_f)).max()
        assert err < 0.02 * mag + 1e-3

    def test_linear_dispatch_flag(self):
        from mlx_vlm_tpu.core.layers import linear

        t, w = self._channel_tensor(seed=2)
        x = jnp.asarray(
            np.random.default_rng(3).standard_normal((2, 64)), jnp.float32)
        base = np.asarray(linear({"weight": t}, x))
        set_activation_quant(True)
        try:
            quant = np.asarray(linear({"weight": t}, x))
        finally:
            set_activation_quant(False)
        # different kernel, close result
        assert not np.array_equal(base, quant)
        np.testing.assert_allclose(base, quant, rtol=0.1, atol=0.05)

    def test_quantize_activations_api(self):
        from mlx_vlm_tpu.core.quant import quantize_activations

        class M:
            params = {"language_model": {"q_proj": {
                "weight": self._channel_tensor()[0]}}}

        try:
            quantize_activations(M())
            from mlx_vlm_tpu.core.quant import activation_quant_enabled

            assert activation_quant_enabled()
        finally:
            set_activation_quant(False)

        class Empty:
            params = {"a": {"weight": jnp.ones((2, 2))}}

        with pytest.raises(ValueError):
            quantize_activations(Empty())
