"""Image-generation stack tests (imagegen/*).

Mirrors the reference contract surface: scheduler schedule values
(flux2/scheduler.py), latent packing round-trips (flux2/latent.py), DiT
forward shapes incl. CFG and guidance-distilled variants
(flux2/transformer/), VAE encode/decode (flux2/vae/), text-encoder
multi-layer embeds (flux2/qwen/), and the end-to-end generate/edit
pipelines (flux2/pipeline.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.imagegen import (DiT, DiTConfig, Flux2Pipeline,
                                  FlowMatchEulerScheduler, TextEncoderConfig,
                                  VAEConfig, decode_packed_latents,
                                  encode_text, get_variant, init_dit_params,
                                  init_text_encoder_params, init_vae_params,
                                  vae_decode, vae_encode,
                                  validate_dimensions)
from mlx_vlm_tpu.imagegen.dit import pos_rope
from mlx_vlm_tpu.imagegen.latent import (grid_ids, pack, patchify,
                                         prepare_packed_latents, text_ids,
                                         unpack, unpatchify)
from mlx_vlm_tpu.imagegen.pipeline import pick_bucket


def tiny_dit_config(**over):
    base = dict(patch_size=1, in_channels=16, num_layers=2,
                num_single_layers=2, attention_head_dim=8,
                num_attention_heads=4, joint_attention_dim=24,
                timestep_guidance_channels=16, mlp_ratio=2.0,
                axes_dims_rope=(2, 2, 2, 2), rope_theta=2000.0)
    base.update(over)
    return DiTConfig(**base)


def tiny_vae_config():
    return VAEConfig(latent_channels=4, block_out_channels=(8, 8, 8, 8),
                     layers_per_block=1, norm_num_groups=4)


def tiny_text_config():
    return TextEncoderConfig(vocab_size=64, hidden_size=8,
                             num_hidden_layers=3, num_attention_heads=2,
                             num_key_value_heads=1, intermediate_size=16,
                             head_dim=4, hidden_state_layers=(1, 2, 3))


# ----------------------------------------------------------------- scheduler
def test_scheduler_schedule():
    s = FlowMatchEulerScheduler(image_seq_len=1024, num_inference_steps=4)
    assert s.sigmas.shape == (5,)
    assert s.timesteps.shape == (4,)
    assert s.sigmas[-1] == 0.0
    assert np.all(np.diff(s.sigmas) < 0)  # strictly decreasing
    assert s.sigmas[0] == pytest.approx(1.0, abs=1e-6)
    np.testing.assert_allclose(s.timesteps, s.sigmas[:-1] * 1000, rtol=1e-6)


def test_scheduler_step_euler():
    s = FlowMatchEulerScheduler(image_seq_len=256, num_inference_steps=2)
    x = jnp.ones((1, 4, 8))
    v = jnp.full((1, 4, 8), 2.0)
    out = s.step(v, 0, x)
    dt = float(s.sigmas[1] - s.sigmas[0])
    np.testing.assert_allclose(np.asarray(out), 1.0 + 2.0 * dt, rtol=1e-5)


# -------------------------------------------------------------------- latent
def test_patchify_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 6, 4)),
                    jnp.float32)
    p = patchify(x)
    assert p.shape == (2, 4, 3, 16)
    np.testing.assert_array_equal(np.asarray(unpatchify(p)), np.asarray(x))


def test_patchify_channel_order_matches_nchw_reference():
    # out channel = c*4 + (dy*2 + dx), the reference's NCHW convention
    x = np.zeros((1, 2, 2, 2), np.float32)
    x[0, 0, 1, 1] = 7.0  # dy=0, dx=1, c=1
    p = np.asarray(patchify(jnp.asarray(x)))
    assert p[0, 0, 0, 1 * 4 + 0 * 2 + 1] == 7.0
    assert p.sum() == 7.0


def test_pack_unpack_roundtrip():
    x = jnp.arange(2 * 3 * 4 * 5, dtype=jnp.float32).reshape(2, 3, 4, 5)
    np.testing.assert_array_equal(np.asarray(unpack(pack(x), 3, 4)),
                                  np.asarray(x))


def test_grid_and_text_ids():
    g = grid_ids(2, 3, t_coord=10)
    assert g.shape == (6, 4)
    assert (g[:, 0] == 10).all()
    assert g[4].tolist() == [10, 1, 1, 0]
    t = text_ids(4)
    assert t.shape == (4, 4)
    assert t[2].tolist() == [0, 0, 0, 2]


def test_prepare_packed_latents_shapes_and_determinism():
    lat, ids, lh, lw = prepare_packed_latents(
        jax.random.PRNGKey(3), height=256, width=320,
        num_latent_channels=4, dtype=jnp.float32)
    assert (lh, lw) == (16, 20)
    assert lat.shape == (1, 16 * 20, 16)
    assert ids.shape == (16 * 20, 4)
    lat2, *_ = prepare_packed_latents(jax.random.PRNGKey(3), height=256,
                                      width=320, num_latent_channels=4,
                                      dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(lat), np.asarray(lat2))


# ----------------------------------------------------------------------- DiT
def test_dit_forward_shape_and_finiteness():
    cfg = tiny_dit_config()
    params = init_dit_params(cfg, jax.random.PRNGKey(0))
    model = DiT(cfg)
    n_img, n_txt = 12, 6
    img_rope = pos_rope(grid_ids(3, 4, 0), cfg.axes_dims_rope, cfg.rope_theta)
    txt_rope = pos_rope(text_ids(n_txt), cfg.axes_dims_rope, cfg.rope_theta)
    x = jnp.ones((2, n_img, cfg.in_channels)) * 0.1
    ctx = jnp.ones((2, n_txt, cfg.joint_attention_dim)) * 0.1
    t = jnp.array([500.0, 500.0])
    out = model(params, x, ctx, t,
                rope_img=tuple(map(jnp.asarray, img_rope)),
                rope_txt=tuple(map(jnp.asarray, txt_rope)))
    assert out.shape == (2, n_img, cfg.in_channels)
    assert bool(jnp.isfinite(out).all())


def test_dit_guidance_embeds_variant():
    cfg = tiny_dit_config(guidance_embeds=True)
    params = init_dit_params(cfg, jax.random.PRNGKey(1))
    model = DiT(cfg)
    img_rope = pos_rope(grid_ids(2, 2, 0), cfg.axes_dims_rope, cfg.rope_theta)
    txt_rope = pos_rope(text_ids(3), cfg.axes_dims_rope, cfg.rope_theta)
    x = jnp.ones((1, 4, cfg.in_channels)) * 0.1
    ctx = jnp.ones((1, 3, cfg.joint_attention_dim)) * 0.1
    out_g1 = model(params, x, ctx, jnp.array([500.0]),
                   tuple(map(jnp.asarray, img_rope)),
                   tuple(map(jnp.asarray, txt_rope)),
                   guidance=jnp.array([1000.0]))
    out_g2 = model(params, x, ctx, jnp.array([500.0]),
                   tuple(map(jnp.asarray, img_rope)),
                   tuple(map(jnp.asarray, txt_rope)),
                   guidance=jnp.array([4000.0]))
    assert not np.allclose(np.asarray(out_g1), np.asarray(out_g2))


def test_dit_timestep_unit_rescale():
    # t in [0,1] must behave like t*1000 (reference transformer.py:104)
    cfg = tiny_dit_config()
    params = init_dit_params(cfg, jax.random.PRNGKey(2))
    model = DiT(cfg)
    img_rope = tuple(map(jnp.asarray, pos_rope(grid_ids(2, 2, 0),
                                               cfg.axes_dims_rope,
                                               cfg.rope_theta)))
    txt_rope = tuple(map(jnp.asarray, pos_rope(text_ids(3),
                                               cfg.axes_dims_rope,
                                               cfg.rope_theta)))
    x = jnp.ones((1, 4, cfg.in_channels)) * 0.1
    ctx = jnp.ones((1, 3, cfg.joint_attention_dim)) * 0.1
    a = model(params, x, ctx, jnp.array([0.5]), img_rope, txt_rope)
    b = model(params, x, ctx, jnp.array([500.0]), img_rope, txt_rope)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


# ----------------------------------------------------------------------- VAE
def test_vae_decode_shape():
    cfg = tiny_vae_config()
    params = init_vae_params(cfg, jax.random.PRNGKey(0))
    lat = jnp.ones((1, 4, 6, cfg.latent_channels)) * 0.1
    img = vae_decode(params, lat, cfg)
    assert img.shape == (1, 32, 48, 3)
    assert bool(jnp.isfinite(img).all())


def test_vae_encode_shape_and_spatial_scale():
    cfg = tiny_vae_config()
    params = init_vae_params(cfg, jax.random.PRNGKey(1), include_encoder=True)
    img = jnp.ones((1, 64, 32, 3)) * 0.5
    lat = vae_encode(params, img, cfg)
    assert lat.shape == (1, 8, 4, cfg.latent_channels)


def test_decode_packed_latents_shape():
    cfg = tiny_vae_config()
    params = init_vae_params(cfg, jax.random.PRNGKey(2))
    packed = jnp.ones((1, 4, 4, cfg.latent_channels * 4)) * 0.1
    img = decode_packed_latents(params, packed, cfg)
    assert img.shape == (1, 64, 64, 3)


def test_bn_denormalize_uses_stats():
    from mlx_vlm_tpu.imagegen.vae import bn_denormalize, bn_normalize

    cfg = tiny_vae_config()
    params = init_vae_params(cfg, jax.random.PRNGKey(3))
    params["bn"]["running_mean"] = jnp.arange(16, dtype=jnp.float32)
    params["bn"]["running_var"] = jnp.full(16, 4.0, jnp.float32)
    x = jnp.ones((1, 2, 2, 16))
    d = bn_denormalize(params, x, cfg.bn_eps)
    np.testing.assert_allclose(
        np.asarray(d)[0, 0, 0],
        np.sqrt(4.0 + cfg.bn_eps) + np.arange(16), rtol=1e-5)
    rt = bn_normalize(params, d, cfg.bn_eps)
    np.testing.assert_allclose(np.asarray(rt), np.asarray(x), rtol=1e-5)


# -------------------------------------------------------------- text encoder
def test_text_encoder_embeds_shape():
    cfg = tiny_text_config()
    params = init_text_encoder_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray([[1, 2, 3, 4, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.int32)
    emb = encode_text(params, cfg, ids, mask)
    assert emb.shape == (1, 6, 3 * cfg.hidden_size)
    assert bool(jnp.isfinite(emb).all())


def test_text_encoder_padding_invariance():
    # with right padding + causal masking, pad token CONTENT must not leak
    # into real positions
    cfg = tiny_text_config()
    params = init_text_encoder_params(cfg, jax.random.PRNGKey(1))
    mask = jnp.asarray([[1, 1, 1, 0, 0]], jnp.int32)
    a = encode_text(params, cfg, jnp.asarray([[5, 6, 7, 0, 0]], jnp.int32),
                    mask)
    b = encode_text(params, cfg, jnp.asarray([[5, 6, 7, 9, 9]], jnp.int32),
                    mask)
    np.testing.assert_allclose(np.asarray(a[:, :3]), np.asarray(b[:, :3]),
                               rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------------ pipeline
def make_tiny_pipeline(include_encoder=False):
    dcfg = tiny_dit_config()
    vcfg = tiny_vae_config()
    return Flux2Pipeline(
        init_dit_params(dcfg, jax.random.PRNGKey(0)), dcfg,
        init_vae_params(vcfg, jax.random.PRNGKey(1),
                        include_encoder=include_encoder), vcfg)


def test_pipeline_generate_end_to_end():
    pipe = make_tiny_pipeline()
    emb = jnp.ones((1, 8, 24)) * 0.1
    img = pipe.generate(prompt_embeds=emb, seed=7, steps=2,
                        width=256, height=256)
    assert img.shape == (256, 256, 3)
    assert img.dtype == np.uint8
    img2 = pipe.generate(prompt_embeds=emb, seed=7, steps=2,
                         width=256, height=256)
    np.testing.assert_array_equal(img, img2)  # deterministic per seed


def test_pipeline_generate_cfg_batched():
    pipe = make_tiny_pipeline()
    emb = jnp.concatenate([jnp.ones((1, 8, 24)) * 0.1,
                           jnp.zeros((1, 8, 24))], axis=0)
    img = pipe.generate(prompt_embeds=emb, seed=7, steps=2,
                        width=256, height=256, guidance=2.5)
    assert img.shape == (256, 256, 3)
    base = pipe.generate(prompt_embeds=emb[:1], seed=7, steps=2,
                         width=256, height=256, guidance=1.0)
    assert not np.array_equal(img, base)


def test_pipeline_edit_end_to_end():
    pipe = make_tiny_pipeline(include_encoder=True)
    emb = jnp.ones((1, 8, 24)) * 0.1
    ref = (np.random.default_rng(0).uniform(0, 255, (256, 256, 3))
           .astype(np.uint8))
    img = pipe.edit(prompt_embeds=emb, images=[ref], seed=3, steps=2,
                    width=256, height=256)
    assert img.shape == (256, 256, 3)
    assert img.dtype == np.uint8


def test_pipeline_validation():
    pipe = make_tiny_pipeline()
    with pytest.raises(ValueError):
        validate_dimensions(width=100, height=256)
    with pytest.raises(ValueError):
        validate_dimensions(width=256, height=250)
    with pytest.raises(ValueError):
        pipe.generate(prompt_embeds=jnp.ones((1, 8, 24)), steps=0,
                      width=256, height=256)
    with pytest.raises(ValueError):
        pipe.generate(width=256, height=256)  # no prompt, no embeds
    with pytest.raises(RuntimeError):
        pipe.edit(prompt_embeds=jnp.ones((1, 8, 24)),
                  images=[np.zeros((256, 256, 3), np.uint8)],
                  width=256, height=256)  # loaded without encoder


def test_pick_bucket_and_variants():
    assert pick_bucket(10, 512) == 32
    assert pick_bucket(100, 512) == 128
    assert pick_bucket(600, 512) == 512
    assert pick_bucket(40, 64) == 64
    v = get_variant("klein-9b")
    assert v.supports_edit and v.transformer["num_layers"] == 8
    with pytest.raises(ValueError):
        get_variant("nonexistent")
