"""Mage-Flow family: dual-stream MMDiT, DiCo VAE, flow-match schedule.

Parity: reference mlx_vlm/models/mage_flow/*."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.models.mage_flow import (
    EDIT_TEMPLATE,
    GENERATION_TEMPLATE,
    MageFlowConfig,
    MageFlowPipeline,
    flow_match_sigmas,
    get_variant,
    image_rope,
    init_mage_transformer_params,
    mage_transformer_forward,
    validate_dimensions,
)
from mlx_vlm_tpu.models.mage_flow.vae import (
    MageVAEConfig,
    init_mage_vae_params,
    mage_vae_decode,
    mage_vae_encode,
)

TINY = MageFlowConfig(in_channels=8, out_channels=8, context_in_dim=12,
                      hidden_size=32, num_heads=2, depth=2,
                      axes_dim=(4, 6, 6))
TINY_VAE = MageVAEConfig(latent_channels=8, hidden_size=16, head_size=16,
                         patch_size=4, num_blocks=2, gn_groups=4,
                         nerf_channels=32, nerf_max_freqs=8)


class TestConfigAndSchedule:
    def test_variants(self):
        assert get_variant("mage-flow-turbo").default_steps == 4
        assert get_variant("microsoft/Mage-Flow-Edit").task == "edit"
        assert get_variant("Mage-Flow-Edit-Turbo").task == "edit"
        assert get_variant("some/dir-mage-flow-base").name == "mage-flow-base"

    def test_sigmas(self):
        """shift*b/(1+(shift-1)b) with terminal zero (reference scheduler)."""
        s = flow_match_sigmas(4, shift=6.0)
        assert s.shape == (5,) and s[0] == pytest.approx(1.0) and s[-1] == 0.0
        b = 0.5
        assert s[2] == pytest.approx(6 * b / (1 + 5 * b))

    def test_dimension_validation(self):
        validate_dimensions(width=1024, height=512)
        with pytest.raises(ValueError):
            validate_dimensions(width=100, height=512)
        with pytest.raises(ValueError):
            validate_dimensions(width=520, height=513)

    def test_templates_match_reference_shapes(self):
        assert "{}" in GENERATION_TEMPLATE and "{}" in EDIT_TEMPLATE


class TestRope:
    def test_centered_grid(self):
        cos, sin = image_rope([(1, 2, 4)], axes_dim=(4, 6, 6))
        assert cos.shape == (8, 8)
        # centered positions: h in {-1, 0}, w in {-2, -1, 0, 1}
        # token (h=0, w=2) has wpos 0 -> its w-axis freqs are cos(0)=1
        assert np.allclose(cos[4 + 2, 5:], 1.0)

    def test_multi_frame_offset(self):
        """edit shapes offset the frame axis per reference image."""
        cos1, _ = image_rope([(1, 2, 2)], axes_dim=(4, 6, 6))
        cos2, _ = image_rope([(1, 2, 2), (1, 2, 2)], axes_dim=(4, 6, 6))
        assert cos2.shape == (8, 8)
        assert np.allclose(cos2[:4], cos1)
        assert not np.allclose(cos2[4:, :2], cos1[:, :2])  # frame freq moved


class TestTransformer:
    def test_forward_shape_and_determinism(self):
        params = init_mage_transformer_params(TINY, jax.random.PRNGKey(0))
        img = jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, 8, 8)), jnp.float32)
        txt = jnp.asarray(np.random.default_rng(1).standard_normal(
            (1, 5, 12)), jnp.float32)
        cos, sin = image_rope([(1, 2, 4)], TINY.axes_dim)
        t = jnp.full((1,), 0.7, jnp.float32)
        v = mage_transformer_forward(params, TINY, img, txt, t,
                                     jnp.asarray(cos), jnp.asarray(sin))
        assert v.shape == (1, 8, 8)
        v2 = mage_transformer_forward(params, TINY, img, txt, t,
                                      jnp.asarray(cos), jnp.asarray(sin))
        assert np.allclose(np.asarray(v), np.asarray(v2))

    def test_text_conditioning_matters(self):
        params = init_mage_transformer_params(TINY, jax.random.PRNGKey(0))
        img = jnp.ones((1, 8, 8), jnp.float32)
        cos, sin = image_rope([(1, 2, 4)], TINY.axes_dim)
        t = jnp.full((1,), 0.5, jnp.float32)
        va = mage_transformer_forward(
            params, TINY, img, jnp.ones((1, 5, 12)), t,
            jnp.asarray(cos), jnp.asarray(sin))
        vb = mage_transformer_forward(
            params, TINY, img, -jnp.ones((1, 5, 12)), t,
            jnp.asarray(cos), jnp.asarray(sin))
        assert not np.allclose(np.asarray(va), np.asarray(vb))


class TestVAE:
    def test_encode_decode_shapes(self):
        params = init_mage_vae_params(TINY_VAE, jax.random.PRNGKey(1))
        img = jnp.asarray(np.random.default_rng(2).uniform(
            -1, 1, (1, 16, 16, 3)), jnp.float32)
        mean = mage_vae_encode(params, TINY_VAE, img)
        assert mean.shape == (1, 4, 4, 8)
        sampled = mage_vae_encode(params, TINY_VAE, img,
                                  sample_key=jax.random.PRNGKey(3))
        assert sampled.shape == mean.shape
        assert not np.allclose(np.asarray(sampled), np.asarray(mean))
        out = mage_vae_decode(params, TINY_VAE,
                              jnp.zeros((1, 4, 4, 8), jnp.float32))
        assert out.shape == (1, 16, 16, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestPipeline:
    def _pipe(self, variant="mage-flow-turbo"):
        return MageFlowPipeline(
            init_mage_transformer_params(TINY, jax.random.PRNGKey(0)),
            TINY,
            init_mage_vae_params(TINY_VAE, jax.random.PRNGKey(1)),
            TINY_VAE,
            variant=get_variant(variant),
        )

    def test_generate_tiny(self):
        """End-to-end denoise + decode produces a uint8 image tensor.

        TINY_VAE has patch_size 4, so the pipeline's /16 grid math is
        driven with a 512-multiple resolution and we check the latent
        grid's decode instead of exact pixel dims."""
        pipe = self._pipe()
        embeds = jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, 5, 12)) * 0.1, jnp.float32)
        img = pipe.generate_array(text_embeds=embeds, seed=0, steps=2,
                                  width=512, height=512, guidance=1.0)
        gh = 512 // 16
        assert img.dtype == np.uint8
        assert img.shape == (gh * TINY_VAE.patch_size,
                             gh * TINY_VAE.patch_size, 3)

    def test_generate_cfg_and_seed_repro(self):
        pipe = self._pipe()
        pos = jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, 5, 12)) * 0.1, jnp.float32)
        neg = jnp.asarray(np.random.default_rng(1).standard_normal(
            (1, 3, 12)) * 0.1, jnp.float32)
        a = pipe.generate_array(text_embeds=pos, negative_embeds=neg,
                                seed=7, steps=2, width=512, height=512,
                                guidance=3.0)
        b = pipe.generate_array(text_embeds=pos, negative_embeds=neg,
                                seed=7, steps=2, width=512, height=512,
                                guidance=3.0)
        assert np.array_equal(a, b)
        c = pipe.generate_array(text_embeds=pos, negative_embeds=neg,
                                seed=8, steps=2, width=512, height=512,
                                guidance=3.0)
        assert not np.array_equal(a, c)

    def test_edit_tiny(self):
        """Reference latents ride behind the target tokens (edit path)."""
        pipe = self._pipe("mage-flow-edit-turbo")
        embeds = jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, 4, 12)) * 0.1, jnp.float32)
        ref = jnp.asarray(np.random.default_rng(3).standard_normal(
            (1, 8, 8, 8)) * 0.1, jnp.float32)
        img = pipe.edit_array(text_embeds=embeds, ref_latents=ref, seed=0,
                              steps=2, width=512, height=512, guidance=1.0)
        assert img.dtype == np.uint8 and img.ndim == 3


class TestDiscovery:
    def test_model_index_routes_to_mage_flow(self, tmp_path):
        import json

        from mlx_vlm_tpu.imagegen.discovery import (image_model_loader,
                                                    is_image_generation_model)

        d = tmp_path / "mage"
        d.mkdir()
        (d / "model_index.json").write_text(
            json.dumps({"_class_name": "MageFlowPipeline"}))
        loader = image_model_loader(str(d))
        assert loader is not None and "mage" in loader.__name__
        assert is_image_generation_model("microsoft/Mage-Flow-Turbo")
