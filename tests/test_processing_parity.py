import numpy as np
import pytest


class TestQwen2VLProcessorParity:
    """Our numpy image pipeline vs the HF implementation (when available)."""

    @pytest.fixture(scope="class")
    def hf_proc(self):
        try:
            from transformers import Qwen2VLImageProcessor

            return Qwen2VLImageProcessor()
        except Exception:
            pytest.skip("transformers Qwen2VLImageProcessor unavailable")

    def test_pixel_values_match_hf(self, hf_proc):
        from PIL import Image

        from mlx_vlm_tpu.utils.processing import Qwen2VLImageProcessor

        rng = np.random.default_rng(0)
        img = Image.fromarray((rng.random((300, 400, 3)) * 255).astype(np.uint8))
        ours = Qwen2VLImageProcessor()(img)
        theirs = hf_proc(images=img, return_tensors="np")
        np.testing.assert_array_equal(
            ours["image_grid_thw"], np.asarray(theirs["image_grid_thw"])
        )
        np.testing.assert_allclose(
            ours["pixel_values"], np.asarray(theirs["pixel_values"]),
            atol=2e-2, rtol=1e-2,  # PIL vs HF resample rounding
        )

    def test_smart_resize_matches_hf(self):
        from mlx_vlm_tpu.utils.processing import smart_resize

        try:
            from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
                smart_resize as hf_smart_resize,
            )
        except Exception:
            pytest.skip("hf smart_resize unavailable")
        for h, w in [(300, 400), (56, 56), (1024, 333), (130, 2000)]:
            assert smart_resize(h, w) == hf_smart_resize(h, w)


class TestLogMelParity:
    def test_matches_whisper_feature_extractor(self):
        from mlx_vlm_tpu.utils.processing import log_mel_spectrogram

        try:
            from transformers import WhisperFeatureExtractor
        except Exception:
            pytest.skip("transformers WhisperFeatureExtractor unavailable")
        rng = np.random.default_rng(0)
        wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        ours = log_mel_spectrogram(wav, 80)
        fe = WhisperFeatureExtractor(feature_size=80)
        theirs = fe(wav, sampling_rate=16000, return_tensors="np",
                    padding=False)["input_features"][0]
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_processor_emits_audio_features(self):
        from mlx_vlm_tpu.utils.processing import (
            Qwen2VLImageProcessor, Qwen2VLProcessor,
        )

        class _Tok:
            def __call__(self, text, **kw):
                return {"input_ids": np.asarray([[1, 2]]),
                        "attention_mask": np.asarray([[1, 1]])}

        p = Qwen2VLProcessor(_Tok(), Qwen2VLImageProcessor(), num_mel_bins=32)
        out = p(text="hi", audio=np.zeros(3200, np.float32))
        assert out["input_features"].shape[1] == 32
        assert out["feature_attention_mask"].sum() == out[
            "input_features"].shape[2]


class TestAdversarialMaskShapes:
    """Reference test_quant_sdpa_mask* analogue: masks at odd shapes."""

    def test_capacity_one(self):
        import jax.numpy as jnp

        from mlx_vlm_tpu.core.mask import causal_cache_mask

        m = causal_cache_mask(jnp.asarray(0, jnp.int32), jnp.zeros(1, jnp.int32), 1, 1)
        assert np.asarray(m).shape == (1, 1, 1, 1) and np.asarray(m)[0, 0, 0, 0]

    def test_offset_at_capacity_edge(self):
        import jax.numpy as jnp

        from mlx_vlm_tpu.core.mask import causal_cache_mask

        m = causal_cache_mask(jnp.asarray(7, jnp.int32), jnp.zeros(1, jnp.int32), 1, 8)
        assert np.asarray(m)[0, 0, 0].all()  # every slot visible

    def test_window_larger_than_capacity(self):
        import jax.numpy as jnp

        from mlx_vlm_tpu.core.mask import causal_cache_mask

        m = causal_cache_mask(
            jnp.asarray(3, jnp.int32), jnp.zeros(1, jnp.int32), 2, 8, window=100
        )
        ref = causal_cache_mask(
            jnp.asarray(3, jnp.int32), jnp.zeros(1, jnp.int32), 2, 8
        )
        np.testing.assert_array_equal(np.asarray(m), np.asarray(ref))

    def test_all_rows_left_padded(self):
        import jax.numpy as jnp

        from mlx_vlm_tpu.core.mask import causal_cache_mask

        m = causal_cache_mask(
            jnp.asarray([5, 5], jnp.int32), jnp.asarray([5, 3], jnp.int32), 1, 8
        )
        m = np.asarray(m)
        assert m[0, 0, 0, 5] and not m[0, 0, 0, 4]
        assert m[1, 0, 0, 3] and not m[1, 0, 0, 2]
