"""Per-channel int8 runtime weight layout (ChannelQuantizedTensor)."""

import numpy as np

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.core.quant import (
    ChannelQuantizedTensor,
    channel_dequantize,
    channel_quantized_matmul,
    dequantize,
    quantize,
    to_channel_quantized,
)


def _rand_qt(n=96, k=128, bits=4, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    return w, quantize(w, bits=bits, group_size=32)


class TestConversion:
    def test_roundtrip_error_much_smaller_than_source_quant(self):
        w, t = _rand_qt()
        ct = to_channel_quantized(t)
        assert ct.q8.shape == (128, 96)
        assert ct.scales.shape == (1, 96)
        w_group = np.asarray(dequantize(t, jnp.float32))
        w_chan = np.asarray(channel_dequantize(ct, jnp.float32))
        # channel requant error is small relative to the int4 error itself
        src_err = np.abs(w_group - np.asarray(w)).max()
        requant_err = np.abs(w_chan - w_group).max()
        assert requant_err < 0.15 * src_err

    def test_constant_row(self):
        w = jnp.ones((4, 64), jnp.float32) * 0.5
        t = quantize(w, bits=4, group_size=32)
        ct = to_channel_quantized(t)
        np.testing.assert_allclose(
            np.asarray(channel_dequantize(ct, jnp.float32)), 0.5, atol=1e-3
        )

    def test_8bit_source(self):
        w, t = _rand_qt(bits=8)
        ct = to_channel_quantized(t)
        assert ct.src_bits == 8
        w_group = np.asarray(dequantize(t, jnp.float32))
        w_chan = np.asarray(channel_dequantize(ct, jnp.float32))
        assert np.abs(w_chan - w_group).max() < 0.02


class TestMatmul:
    def test_matches_dequantized_matmul(self):
        rng = np.random.default_rng(1)
        w, t = _rand_qt()
        ct = to_channel_quantized(t)
        x = jnp.asarray(rng.standard_normal((3, 128)), jnp.float32)
        got = channel_quantized_matmul(x, ct)
        want = x @ channel_dequantize(ct, jnp.float32).T
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )

    def test_linear_dispatch(self):
        from mlx_vlm_tpu.core.layers import linear

        rng = np.random.default_rng(2)
        w, t = _rand_qt()
        ct = to_channel_quantized(t)
        x = jnp.asarray(rng.standard_normal((2, 128)), jnp.float32)
        got = linear({"weight": ct}, x)
        want = x @ channel_dequantize(ct, jnp.float32).T
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )

    def test_embedding_gather(self):
        from mlx_vlm_tpu.core.layers import embedding

        w, t = _rand_qt(n=50, k=64)  # vocab 50, dim 64
        ct = to_channel_quantized(t)
        ids = jnp.asarray([[0, 7, 49]])
        got = embedding({"weight": ct}, ids)
        want = jnp.take(channel_dequantize(ct, jnp.float32), ids, axis=0)
        assert got.shape == (1, 3, 64)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_stacked_scan_slice(self):
        """[L, K, N] stacks slice per layer inside lax.scan bodies."""
        rng = np.random.default_rng(3)
        tensors = [to_channel_quantized(_rand_qt(seed=s)[1]) for s in range(3)]
        stacked = ChannelQuantizedTensor(
            q8=jnp.stack([t.q8 for t in tensors]),
            scales=jnp.stack([t.scales for t in tensors]),
            biases=jnp.stack([t.biases for t in tensors]),
            src_bits=4,
            out_dtype="float32",
        )
        x = jnp.asarray(rng.standard_normal((1, 128)), jnp.float32)

        def body(c, wt):
            t = ChannelQuantizedTensor(
                q8=wt[0], scales=wt[1], biases=wt[2],
                src_bits=4, out_dtype="float32",
            )
            return c, channel_quantized_matmul(x, t)

        _, ys = jax.lax.scan(
            body, 0, (stacked.q8, stacked.scales, stacked.biases)
        )
        for i, t in enumerate(tensors):
            want = channel_quantized_matmul(x, t)
            np.testing.assert_allclose(
                np.asarray(ys[i]), np.asarray(want), rtol=1e-4, atol=1e-4
            )


class TestEndToEnd:
    def test_quantized_model_generates_close_logits(self):
        """w8chan and exact modes agree to within quantization noise."""
        import os

        from mlx_vlm_tpu.utils.loader import load_model_from_weights
        from mlx_vlm_tpu.utils.testing import (
            qwen2_vl_hf_weights,
            tiny_qwen2_vl_config,
        )

        cfg = tiny_qwen2_vl_config()
        cfg["quantization"] = {"bits": 4, "group_size": 32}
        weights = qwen2_vl_hf_weights(cfg, seed=11)
        g = 32
        for i in range(cfg["num_hidden_layers"]):
            for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
                key = f"model.layers.{i}.self_attn.{proj}.weight"
                w = weights[key]
                out_d, in_d = w.shape
                wg = w.reshape(out_d, in_d // g, g)
                mn, mxv = wg.min(-1), wg.max(-1)
                scale = (mxv - mn) / 15.0
                scale[scale == 0] = 1.0
                q = np.clip(
                    np.round((wg - mn[..., None]) / scale[..., None]), 0, 15
                ).astype(np.uint32).reshape(out_d, in_d)
                packed = np.zeros((out_d, in_d // 8), np.uint32)
                for j in range(8):
                    packed |= q[:, j::8] << (4 * j)
                weights[key] = packed
                weights[key[: -len(".weight")] + ".scales"] = scale.astype(
                    np.float32
                )
                weights[key[: -len(".weight")] + ".biases"] = mn.astype(
                    np.float32
                )

        def logits_for(mode):
            os.environ["MLX_VLM_TPU_RUNTIME_QUANT"] = mode
            try:
                m = load_model_from_weights(cfg, weights, jnp.float32)
            finally:
                del os.environ["MLX_VLM_TPU_RUNTIME_QUANT"]
            ids = jnp.asarray(np.arange(8, dtype=np.int32)[None] % 50)
            emb = m.language_model.embed(m.params["language_model"], ids)
            cache = m.language_model.init_cache(1, 16, jnp.float32)
            pos = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (3, 1, 8))
            lg, _ = m(m.params, emb, cache, pos)
            return np.asarray(lg)

        l_chan = logits_for("w8chan")
        l_exact = logits_for("exact")
        # small deviation from requantization, far below logit scale
        denom = np.abs(l_exact).max()
        assert np.abs(l_chan - l_exact).max() / denom < 0.05


class TestInt4Grouped:
    def _src(self, N=24, K=128, gs=32, seed=0):
        from mlx_vlm_tpu.core.quant import quantize

        rng = np.random.default_rng(seed)
        w = jnp.asarray(rng.standard_normal((N, K)) * 0.1, jnp.float32)
        return quantize(w, bits=4, group_size=gs)

    def test_bit_exact_dequant(self):
        from mlx_vlm_tpu.core.quant import (dequantize,
                                            int4_grouped_dequantize,
                                            to_int4_grouped)

        t = self._src()
        g = to_int4_grouped(t)
        ref = np.asarray(dequantize(t, jnp.float32))
        got = np.asarray(int4_grouped_dequantize(g, jnp.float32))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_matmul_matches_dequant(self):
        from mlx_vlm_tpu.core.quant import (dequantize, int4_grouped_matmul,
                                            to_int4_grouped)

        t = self._src(seed=2)
        g = to_int4_grouped(t)
        x = jnp.asarray(np.random.default_rng(1).standard_normal((3, 128)),
                        jnp.float32)
        ref = np.asarray(x) @ np.asarray(dequantize(t, jnp.float32)).T
        got = np.asarray(int4_grouped_matmul(x, g))
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    def test_linear_dispatch(self):
        from mlx_vlm_tpu.core.layers import linear
        from mlx_vlm_tpu.core.quant import dequantize, to_int4_grouped

        t = self._src(seed=3)
        g = to_int4_grouped(t)
        x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 128)),
                        jnp.float32)
        ref = np.asarray(x) @ np.asarray(dequantize(t, jnp.float32)).T
        got = np.asarray(linear({"weight": g}, x))
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    def test_loader_folds_w4grp(self, monkeypatch):
        from mlx_vlm_tpu.core.quant import Int4GroupedTensor, quantize
        from mlx_vlm_tpu.utils.loader import _fold_quantized

        monkeypatch.setenv("MLX_VLM_TPU_RUNTIME_QUANT", "w4grp")
        t = self._src()
        u32 = np.asarray(t.q).view(np.uint32)
        flat = {"l.weight": u32, "l.scales": np.asarray(t.scales),
                "l.biases": np.asarray(t.biases),
                "model.embed_tokens.weight": u32,
                "model.embed_tokens.scales": np.asarray(t.scales),
                "model.embed_tokens.biases": np.asarray(t.biases)}
        out = _fold_quantized(flat, {"bits": 4, "group_size": 32})
        assert isinstance(out["l.weight"], Int4GroupedTensor)
        # embedding tables stay gatherable (channel layout)
        from mlx_vlm_tpu.core.quant import ChannelQuantizedTensor

        assert isinstance(out["model.embed_tokens.weight"],
                          ChannelQuantizedTensor)

    def test_generation_with_w4grp_model(self, monkeypatch):
        """End-to-end: a 4-bit checkpoint loads into the grouped layout and
        greedy generation matches the exact dequant path."""
        import os

        from mlx_vlm_tpu.generate.ar import generate_step
        from mlx_vlm_tpu.utils.loader import load_model_from_weights
        from mlx_vlm_tpu.utils.testing import (llama_hf_weights,
                                               tiny_llama_config)
        from mlx_vlm_tpu.core.quant import quantize

        cfg = tiny_llama_config()
        cfg = dict(cfg, quantization={"bits": 4, "group_size": 32})
        base = llama_hf_weights(dict(cfg), 0)
        w = {}
        for k, v in base.items():
            if (k.startswith("model.layers") and v.ndim == 2
                    and "norm" not in k):
                t = quantize(jnp.asarray(v), 4, 32)
                w[k.replace(".weight", "") + ".weight"] = np.asarray(
                    t.q).view(np.uint32)
                w[k.replace(".weight", "") + ".scales"] = np.asarray(
                    t.scales)
                w[k.replace(".weight", "") + ".biases"] = np.asarray(
                    t.biases)
            else:
                w[k] = v

        def toks(mode):
            monkeypatch.setenv("MLX_VLM_TPU_RUNTIME_QUANT", mode)
            m = load_model_from_weights(dict(cfg), dict(w), jnp.float32)
            ids = (np.arange(8, dtype=np.int32) * 3 % 200)[None]
            import jax as _jax

            e = _jax.jit(m.get_input_embeddings)(m.params,
                                                 jnp.asarray(ids))
            return [int(t[0]) for t, _ in generate_step(e, m,
                                                        max_tokens=6)]

        assert toks("w4grp") == toks("exact")


class TestAutoQuantMode:
    """Default runtime layout selection (no env override): int4
    checkpoints whose LM supports the whole-stack fused decode kernel
    fold to the bit-exact w4grp layout; others keep w8chan."""

    def _pack_layers(self, weights, bits=4, g=64):
        from mlx_vlm_tpu.core.quant import quantize

        rng = np.random.default_rng(5)
        out = {}
        for k, v in weights.items():
            if (k.startswith("model.layers.") and k.endswith(".weight")
                    and "norm" not in k and v.ndim == 2
                    and v.shape[1] % g == 0):
                w = rng.standard_normal(v.shape).astype(np.float32) * 0.1
                t = quantize(jnp.asarray(w), bits=bits, group_size=g)
                p = k[: -len(".weight")]
                out[f"{p}.weight"] = np.asarray(t.q).view(np.uint32)
                out[f"{p}.scales"] = np.asarray(t.scales)
                out[f"{p}.biases"] = np.asarray(t.biases)
            else:
                out[k] = v
        return out

    def test_qwen2_vl_int4_defaults_to_fused_w4grp(self, monkeypatch):
        from mlx_vlm_tpu.core.quant import Int4GroupedTensor
        from mlx_vlm_tpu.utils.loader import load_model_from_weights
        from mlx_vlm_tpu.utils.testing import (qwen2_vl_hf_weights,
                                               tiny_qwen2_vl_config)

        monkeypatch.delenv("MLX_VLM_TPU_RUNTIME_QUANT", raising=False)
        cfg = tiny_qwen2_vl_config()
        cfg["hidden_size"] = 128
        cfg["intermediate_size"] = 256
        cfg["num_attention_heads"] = 4
        cfg["num_key_value_heads"] = 2
        cfg["num_hidden_layers"] = 2
        cfg["rope_scaling"] = {"type": "mrope", "mrope_section": [4, 6, 6]}
        cfg["vision_config"]["hidden_size"] = 32
        cfg["quantization"] = {"bits": 4, "group_size": 64}
        w = self._pack_layers(qwen2_vl_hf_weights(cfg, seed=2))
        m = load_model_from_weights(cfg, w, jnp.float32)
        lp = m.params["language_model"]
        assert "fused_decode" in lp
        # pack-only residency: the per-linear Int4GroupedTensor copies are
        # dropped (the pack carries every layer tensor); forwards rebuild
        # them from pack slices (ops/fused_decode.py layer_params_from_pack)
        assert "layers" not in lp["model"]
        assert Int4GroupedTensor is not None

    def test_llama_int4_defaults_to_w8chan(self, monkeypatch):
        from mlx_vlm_tpu.core.quant import ChannelQuantizedTensor
        from mlx_vlm_tpu.utils.loader import load_model_from_weights
        from mlx_vlm_tpu.utils.testing import (llama_hf_weights,
                                               tiny_llama_config)

        monkeypatch.delenv("MLX_VLM_TPU_RUNTIME_QUANT", raising=False)
        cfg = tiny_llama_config()
        cfg = dict(cfg, quantization={"bits": 4, "group_size": 64})
        w = self._pack_layers(llama_hf_weights(dict(cfg), 0))
        m = load_model_from_weights(dict(cfg), w, jnp.float32)
        lp = m.params["language_model"]
        assert "fused_decode" not in lp
        assert isinstance(
            lp["model"]["layers"]["mlp"]["gate_proj"]["weight"],
            ChannelQuantizedTensor)
