"""Ideogram 4 family: single-stream DiT, logit-normal schedule, JSON
caption prompting, latent-norm decode.

Parity: reference mlx_vlm/models/ideogram4/*."""

import json
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.models.ideogram4 import (
    PRESETS,
    Ideogram4Config,
    Ideogram4Pipeline,
    build_inputs,
    get_preset,
    ideogram_transformer_forward,
    init_ideogram_params,
    latent_norm,
    logit_normal_schedule,
    normalize_prompt,
    schedule_for_resolution,
    validate_dimensions,
)
from mlx_vlm_tpu.models.ideogram4 import _mrope_tables

TINY = Ideogram4Config(emb_dim=32, num_layers=2, num_heads=2,
                       intermediate_size=64, adanln_dim=16, in_channels=8,
                       llm_features_dim=12, mrope_section=(3, 2, 2))


class TestScheduleAndPresets:
    def test_logit_normal_endpoints(self):
        """t<=0 / t>=1 clamp to the logsnr window (reference scheduler)."""
        lo = 1.0 / (1.0 + math.exp(0.5 * 18.0))
        hi = 1.0 / (1.0 + math.exp(0.5 * -15.0))
        assert logit_normal_schedule(0.0, mean=0.0) == pytest.approx(hi)
        assert logit_normal_schedule(1.0, mean=0.0) == pytest.approx(lo)
        # mean 0, std 1 at the median: sigmoid(0) = 0.5
        assert logit_normal_schedule(0.5, mean=0.0) == pytest.approx(0.5)

    def test_resolution_shift(self):
        """mean shifts by 0.5*log(pixels/512^2) (reference
        get_schedule_for_resolution)."""
        base = schedule_for_resolution(512, 512, mean=1.0)(0.5)
        big = schedule_for_resolution(1024, 1024, mean=1.0)(0.5)
        expected = 1.0 + 0.5 * math.log(4.0)
        assert big == pytest.approx(1.0 - 1.0 / (1.0 + math.exp(-expected)))
        assert big < base  # larger canvas -> more noise weight

    def test_presets(self):
        p = get_preset(None)
        assert p.num_steps == 20 and len(p.guidance_schedule) == 20
        assert PRESETS["V4_TURBO_12"].guidance_schedule[0] == 3.0
        with pytest.raises(ValueError):
            get_preset("nope")


class TestPrompting:
    def test_plain_text_wraps_to_json_caption(self):
        text, wrapped = normalize_prompt("a red fox")
        assert wrapped and json.loads(text) == {"caption": "a red fox"}

    def test_json_passthrough(self):
        src = '{"caption":"x","style":"photo"}'
        text, wrapped = normalize_prompt(src)
        assert not wrapped and text == src

    def test_invalid_json_raises(self):
        with pytest.raises(ValueError):
            normalize_prompt("{not json")

    def test_no_wrap_mode(self):
        text, wrapped = normalize_prompt("plain", auto_json_caption=False)
        assert text == "plain" and not wrapped


class TestGeometry:
    def test_build_inputs(self):
        inp = build_inputs(5, height=64, width=32)
        assert inp["grid_h"] == 4 and inp["grid_w"] == 2
        assert inp["position_ids"].shape == (1, 5 + 8, 3)
        # text positions are 1D triplets; image positions offset by 65536
        assert (inp["position_ids"][0, :5, 0]
                == np.arange(5, dtype=np.int32)).all()
        assert inp["position_ids"][0, 5, 0] == 65536
        assert inp["indicator"][0, 4] == 3 and inp["indicator"][0, 5] == 2

    def test_mrope_axis_selector(self):
        """axis pattern 0,1,2,0,1,2 over the interleaved sections
        (reference Ideogram4MRoPE selector)."""
        inp = build_inputs(2, height=32, width=32)
        cos, sin = _mrope_tables(TINY, inp["position_ids"])
        assert cos.shape == (1, 2 + 4, TINY.head_dim)
        assert np.isfinite(cos).all() and np.isfinite(sin).all()
        # for text tokens all 3 axes share the position -> rows vary only
        # with position, and cos(0 * f) == 1 at position 0
        assert np.allclose(cos[0, 0], 1.0)

    def test_latent_norm_constants(self):
        shift, scale = latent_norm()
        assert shift.shape == (128,) and scale.shape == (128,)
        # spot values from the reference table
        assert shift[0] == pytest.approx(0.01984364, abs=1e-6)
        assert scale[0] == pytest.approx(1.63933691, abs=1e-6)
        assert (scale > 0.5).all()

    def test_validate_dimensions(self):
        validate_dimensions(1024, 512)
        with pytest.raises(ValueError):
            validate_dimensions(100, 512)
        with pytest.raises(ValueError):
            validate_dimensions(2048, 256)  # 8:1 aspect


class TestTransformer:
    def _inputs(self, n_text=3, h=32, w=32):
        inp = build_inputs(n_text, height=h, width=w)
        cos, sin = _mrope_tables(TINY, inp["position_ids"])
        return inp, jnp.asarray(cos), jnp.asarray(sin)

    def test_cond_uncond_shapes(self):
        params = init_ideogram_params(TINY, jax.random.PRNGKey(0))
        inp, cos, sin = self._inputs()
        S = 3 + 4
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, S, 8)), jnp.float32)
        llm = jnp.asarray(np.random.default_rng(1).standard_normal(
            (1, S, 12)), jnp.float32)
        t = jnp.full((1,), 0.6, jnp.float32)
        seg = jnp.asarray(inp["segment_ids"])
        ind = jnp.asarray(inp["indicator"])
        v = ideogram_transformer_forward(params, TINY, llm, x, t,
                                         cos, sin, seg, ind)
        assert v.shape == (1, S, 8) and v.dtype == jnp.float32
        vu = ideogram_transformer_forward(
            params, TINY, None, x[:, 3:], t, cos[:, 3:], sin[:, 3:],
            seg[:, 3:], ind[:, 3:])
        assert vu.shape == (1, 4, 8)

    def test_text_conditioning_matters(self):
        params = init_ideogram_params(TINY, jax.random.PRNGKey(0))
        inp, cos, sin = self._inputs()
        S = 7
        x = jnp.ones((1, S, 8), jnp.float32)
        t = jnp.full((1,), 0.5, jnp.float32)
        seg = jnp.asarray(inp["segment_ids"])
        ind = jnp.asarray(inp["indicator"])
        va = ideogram_transformer_forward(
            params, TINY, jnp.ones((1, S, 12)), x, t, cos, sin, seg, ind)
        vb = ideogram_transformer_forward(
            params, TINY, -jnp.ones((1, S, 12)), x, t, cos, sin, seg, ind)
        # image-tail rows respond to the text condition through attention
        assert not np.allclose(np.asarray(va[:, 3:]), np.asarray(vb[:, 3:]))

    def test_segment_mask_blocks_attention(self):
        """Tokens in different segments must not attend to each other."""
        params = init_ideogram_params(TINY, jax.random.PRNGKey(0))
        inp, cos, sin = self._inputs()
        S = 7
        x = jnp.asarray(np.random.default_rng(2).standard_normal(
            (1, S, 8)), jnp.float32)
        t = jnp.full((1,), 0.5, jnp.float32)
        ind = jnp.asarray(inp["indicator"])
        seg_one = jnp.ones((1, S), jnp.int32)
        seg_split = seg_one.at[0, :3].set(9)
        va = ideogram_transformer_forward(params, TINY, None, x, t,
                                          cos, sin, seg_one, ind)
        vb = ideogram_transformer_forward(params, TINY, None, x, t,
                                          cos, sin, seg_split, ind)
        # splitting the text rows into another segment changes image rows
        assert not np.allclose(np.asarray(va[:, 3:]), np.asarray(vb[:, 3:]))


class TestPipeline:
    def test_generate_latents_tiny(self):
        """Denoise loop over both transformers produces finite latents and
        is seed-reproducible (no VAE on the shell -> spatial latents)."""
        cond = init_ideogram_params(TINY, jax.random.PRNGKey(0))
        uncond = init_ideogram_params(TINY, jax.random.PRNGKey(1))
        pipe = Ideogram4Pipeline(cond, uncond, TINY)
        feats = jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, 3, 12)) * 0.1, jnp.float32)
        out = pipe.generate_array(llm_features=feats, seed=0, steps=2,
                                  width=256, height=256, guidance_scale=4.0)
        gh = 256 // 16
        assert out.shape == (1, gh * 2, gh * 2, 8 // 4)
        assert np.isfinite(out).all()
        out2 = pipe.generate_array(llm_features=feats, seed=0, steps=2,
                                   width=256, height=256, guidance_scale=4.0)
        assert np.allclose(out, out2)

    def test_guidance_schedule_length_check(self):
        cond = init_ideogram_params(TINY, jax.random.PRNGKey(0))
        pipe = Ideogram4Pipeline(cond, cond, TINY)
        feats = jnp.zeros((1, 2, 12), jnp.float32)
        with pytest.raises(ValueError):
            pipe.generate_array(llm_features=feats, steps=3,
                                width=256, height=256,
                                guidance_schedule=(1.0, 2.0))


class TestFp8Import:
    def test_weight_only_dequant(self):
        from mlx_vlm_tpu.core.quant import e4m3_decode_table
        from mlx_vlm_tpu.models.ideogram4 import _dequantize_fp8

        lut = e4m3_decode_table()
        codes = np.asarray([[0x38, 0x40], [0x08, 0xB8]], np.uint8)  # e4m3
        raw = {"w.weight": codes, "w.weight_scale": np.asarray([2.0, 0.5])}
        out = _dequantize_fp8(raw)
        assert "w.weight_scale" not in out
        exp = lut[codes.astype(np.int32)] * np.asarray([[2.0], [0.5]])
        assert np.allclose(out["w.weight"], exp)


class TestDiscovery:
    def test_model_index_routes_to_ideogram4(self, tmp_path):
        from mlx_vlm_tpu.imagegen.discovery import (image_model_loader,
                                                    is_image_generation_model)

        d = tmp_path / "ideo"
        d.mkdir()
        (d / "model_index.json").write_text(
            json.dumps({"_class_name": "Ideogram4Pipeline"}))
        loader = image_model_loader(str(d))
        assert loader is not None and "ideogram" in loader.__name__
        assert is_image_generation_model("ideogram-ai/ideogram-4-fp8")
