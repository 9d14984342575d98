import dataclasses
import json
import tempfile

import numpy as np
import pytest

import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.testing import (
    make_tiny_qwen2_vl,
    qwen2_vl_hf_weights,
    tiny_qwen2_vl_config,
)


@pytest.fixture(scope="module")
def model():
    return make_tiny_qwen2_vl(seed=0, dtype=jnp.float32)


def _text_embeds(model, ids):
    import jax

    return jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))


class TestLanguageModel:
    def test_logits_shape(self, model):
        """Contract of reference tests/test_models.py:language_test_runner."""
        B, S = 1, 6
        ids = np.arange(S, dtype=np.int32)[None]
        embeds = _text_embeds(model, ids)
        cache = model.language_model.init_cache(B, 16, jnp.float32)
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, B, S))
        logits, cache = model(model.params, embeds, cache, jnp.asarray(pos))
        assert logits.shape == (B, S, model.config.text_config.vocab_size)
        assert int(cache.offset) == S
        # one decode step
        ids2 = np.asarray([[3]], np.int32)
        e2 = _text_embeds(model, ids2)
        pos2 = np.full((3, B, 1), S, np.int32)
        logits2, cache = model(model.params, e2, cache, jnp.asarray(pos2))
        assert logits2.shape == (B, 1, model.config.text_config.vocab_size)

    def test_incremental_matches_full(self, model):
        """KV-cached decode must reproduce full-sequence logits."""
        S = 8
        ids = (np.arange(S, dtype=np.int32) * 7 % 200)[None]
        embeds = _text_embeds(model, ids)
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S))

        cache_full = model.language_model.init_cache(1, 16, jnp.float32)
        logits_full, _ = model(model.params, embeds, cache_full, jnp.asarray(pos))

        cache = model.language_model.init_cache(1, 16, jnp.float32)
        outs = []
        for t in range(S):
            lt, cache = model(
                model.params,
                embeds[:, t : t + 1],
                cache,
                jnp.asarray(pos[:, :, t : t + 1]),
            )
            outs.append(np.asarray(lt)[:, 0])
        inc = np.stack(outs, axis=1)
        np.testing.assert_allclose(np.asarray(logits_full), inc, atol=2e-4, rtol=1e-3)

    def test_chunked_prefill_matches_full(self, model):
        S, chunk = 8, 4
        ids = (np.arange(S, dtype=np.int32) * 5 % 200)[None]
        embeds = _text_embeds(model, ids)
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S))

        cache_full = model.language_model.init_cache(1, 16, jnp.float32)
        logits_full, _ = model(model.params, embeds, cache_full, jnp.asarray(pos))

        cache = model.language_model.init_cache(1, 16, jnp.float32)
        chunks = []
        for c in range(0, S, chunk):
            lc, cache = model(
                model.params,
                embeds[:, c : c + chunk],
                cache,
                jnp.asarray(pos[:, :, c : c + chunk]),
            )
            chunks.append(np.asarray(lc))
        np.testing.assert_allclose(
            np.asarray(logits_full), np.concatenate(chunks, 1), atol=2e-4, rtol=1e-3
        )

    def test_left_padding_invariance(self, model):
        """A left-padded row must produce the same last-token logits."""
        S, pad = 6, 3
        ids = (np.arange(S, dtype=np.int32) + 1)[None]
        embeds = _text_embeds(model, ids)
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S))
        cache = model.language_model.init_cache(1, 16, jnp.float32)
        ref, _ = model(model.params, embeds, cache, jnp.asarray(pos))

        ids_p = np.concatenate([np.zeros((1, pad), np.int32), ids], 1)
        embeds_p = _text_embeds(model, ids_p)
        pos_p = np.concatenate(
            [np.ones((3, 1, pad), np.int32), pos + 0], axis=2
        )  # pad positions arbitrary
        cache_p = model.language_model.init_cache(
            1, 16, jnp.float32, left_pad=jnp.asarray([pad], jnp.int32)
        )
        out, _ = model(model.params, embeds_p, cache_p, jnp.asarray(pos_p))
        np.testing.assert_allclose(
            np.asarray(ref[0, -1]), np.asarray(out[0, -1]), atol=2e-4, rtol=1e-3
        )


class TestVision:
    def test_tower_shapes(self, model):
        vc = model.config.vision_config
        grid = np.asarray([[1, 4, 4]])  # 16 patches -> 4 merged tokens
        aux = model.vision_aux_inputs(grid)
        freqs, segs = aux["rotary_freqs"], aux["segment_ids"]
        N = 16
        pv = np.random.default_rng(0).standard_normal(
            (N, vc.in_channels * vc.temporal_patch_size * vc.patch_size**2)
        ).astype(np.float32)
        feats = model.vision_tower(
            model.params["vision_tower"], jnp.asarray(pv), jnp.asarray(freqs), jnp.asarray(segs)
        )
        assert feats.shape == (4, model.config.text_config.hidden_size)

    def test_segments_isolate_images(self, model):
        """Features of image 1 must not change when image 2 changes."""
        vc = model.config.vision_config
        grid = np.asarray([[1, 2, 2], [1, 2, 2]])
        aux = model.vision_aux_inputs(grid)
        freqs, segs = aux["rotary_freqs"], aux["segment_ids"]
        D = vc.in_channels * vc.temporal_patch_size * vc.patch_size**2
        rng = np.random.default_rng(1)
        pv1 = rng.standard_normal((8, D)).astype(np.float32)
        pv2 = pv1.copy()
        pv2[4:] = rng.standard_normal((4, D))
        f1 = model.vision_tower(
            model.params["vision_tower"], jnp.asarray(pv1), jnp.asarray(freqs), jnp.asarray(segs)
        )
        f2 = model.vision_tower(
            model.params["vision_tower"], jnp.asarray(pv2), jnp.asarray(freqs), jnp.asarray(segs)
        )
        np.testing.assert_allclose(np.asarray(f1[:1]), np.asarray(f2[:1]), atol=1e-5)
        assert not np.allclose(np.asarray(f1[1:]), np.asarray(f2[1:]))


class TestMRoPE:
    def test_rope_index_text_only(self, model):
        ids = np.arange(10, dtype=np.int64)[None]
        pos, deltas = model.prepare_position_ids(ids)
        assert pos.shape == (3, 1, 10)
        np.testing.assert_array_equal(pos[0, 0], np.arange(10))
        assert deltas[0, 0] == 0

    def test_rope_index_with_image(self, model):
        cfg = model.config
        # prompt: [t, t, vision_start, img*4, t] with grid (1, 4, 4) -> 4 merged
        ids = np.asarray(
            [[5, 6, cfg.vision_start_token_id] + [cfg.image_token_id] * 4 + [7]]
        )
        grid = np.asarray([[1, 4, 4]])
        pos, deltas = model.prepare_position_ids(ids, grid)
        p = pos[:, 0, :]
        # text 0..2 sequential on all streams
        np.testing.assert_array_equal(p[:, :3], np.tile(np.arange(3), (3, 1)))
        # image block: t=3 constant, h in {3,3,4,4}? grid_h=4//2=2, gw=2
        np.testing.assert_array_equal(p[0, 3:7], [3, 3, 3, 3])
        np.testing.assert_array_equal(p[1, 3:7], [3, 3, 4, 4])
        np.testing.assert_array_equal(p[2, 3:7], [3, 4, 3, 4])
        # trailing text continues at 5
        np.testing.assert_array_equal(p[:, 7], [5, 5, 5])
        assert deltas[0, 0] == 6 - 8  # max+1 - len

    def test_rope_index_left_padded(self, model):
        cfg = model.config
        ids = np.asarray([[0, 0, 5, 6, 7]])
        mask = np.asarray([[0, 0, 1, 1, 1]])
        pos, deltas = model.prepare_position_ids(ids, None, None, mask)
        np.testing.assert_array_equal(pos[0, 0, 2:], np.arange(3))


class TestMergeFeatures:
    def test_scatter(self, model):
        from mlx_vlm_tpu.models.qwen2_vl.qwen2_vl import (
            merge_input_ids_with_image_features,
        )

        cfg = model.config
        D = 4
        ids = jnp.asarray([[1, cfg.image_token_id, cfg.image_token_id, 2]])
        embeds = jnp.zeros((1, 4, D))
        feats = jnp.asarray([[1.0] * D, [2.0] * D])
        out = np.asarray(
            merge_input_ids_with_image_features(
                cfg.image_token_id, cfg.video_token_id, feats, embeds, ids
            )
        )
        assert out[0, 0, 0] == 0 and out[0, 3, 0] == 0
        assert out[0, 1, 0] == 1.0 and out[0, 2, 0] == 2.0


class TestEndToEnd:
    def test_generate_step_greedy_deterministic(self, model):
        ids = (np.arange(12, dtype=np.int32) % 200)[None]
        embeds = _text_embeds(model, ids)
        toks1 = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=8, prefill_step_size=8)]
        toks2 = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=8, prefill_step_size=4)]
        assert len(toks1) == 8
        assert toks1 == toks2, "greedy decode must not depend on prefill chunking"

    def test_full_vlm_forward(self, model):
        cfg = model.config
        vc = cfg.vision_config
        grid = np.asarray([[1, 4, 4]])
        n_img_tokens = 4
        ids = np.asarray(
            [[5, cfg.vision_start_token_id]
             + [cfg.image_token_id] * n_img_tokens
             + [9, 10]]
        )
        D_patch = vc.in_channels * vc.temporal_patch_size * vc.patch_size**2
        pv = np.random.default_rng(3).standard_normal((16, D_patch)).astype(np.float32)
        aux = model.vision_aux_inputs(grid)
        freqs, segs = aux["rotary_freqs"], aux["segment_ids"]
        import jax

        embeds = jax.jit(model.get_input_embeddings)(
            model.params,
            jnp.asarray(ids),
            jnp.asarray(pv),
            jnp.asarray(freqs),
            jnp.asarray(segs),
        )
        pos, deltas = model.prepare_position_ids(ids, grid)
        toks = [
            int(t[0])
            for t, _ in generate_step(
                embeds, model, position_ids=pos, rope_deltas=deltas, max_tokens=5
            )
        ]
        assert len(toks) == 5


class TestLoader:
    def test_safetensors_roundtrip(self):
        from safetensors.numpy import save_file

        from mlx_vlm_tpu.utils.loader import load_model

        cfg = tiny_qwen2_vl_config()
        weights = qwen2_vl_hf_weights(cfg, seed=7)
        with tempfile.TemporaryDirectory() as d:
            save_file(weights, f"{d}/model.safetensors")
            with open(f"{d}/config.json", "w") as f:
                json.dump(cfg, f)
            model = load_model(d, dtype=jnp.float32)
        ref = make_tiny_qwen2_vl(seed=7, dtype=jnp.float32)
        ids = np.arange(6, dtype=np.int32)[None]
        e1 = _text_embeds(model, ids)
        e2 = _text_embeds(ref, ids)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)

    def test_quantized_load(self):
        """mlx-style packed-uint32 quantized checkpoints import correctly."""
        from mlx_vlm_tpu.core.quant import QuantizedTensor, dequantize
        from mlx_vlm_tpu.utils.loader import load_model_from_weights

        cfg = tiny_qwen2_vl_config()
        cfg["quantization"] = {"bits": 4, "group_size": 32}
        weights = qwen2_vl_hf_weights(cfg, seed=3)
        g = 32
        originals = {}
        # quantize q_proj in every layer the mlx way: 4-bit codes packed in u32
        for i in range(cfg["num_hidden_layers"]):
            key = f"model.layers.{i}.self_attn.q_proj.weight"
            w = weights[key]
            out_d, in_d = w.shape
            wg = w.reshape(out_d, in_d // g, g)
            mn, mxv = wg.min(-1), wg.max(-1)
            scale = (mxv - mn) / 15.0
            scale[scale == 0] = 1.0
            q = np.clip(
                np.round((wg - mn[..., None]) / scale[..., None]), 0, 15
            ).astype(np.uint32)
            q = q.reshape(out_d, in_d)
            packed = np.zeros((out_d, in_d // 8), np.uint32)
            for j in range(8):
                packed |= q[:, j::8] << (4 * j)
            weights[key] = packed
            weights[key[: -len(".weight")] + ".scales"] = scale.astype(np.float32)
            weights[key[: -len(".weight")] + ".biases"] = mn.astype(np.float32)
            originals[i] = w

        # default runtime mode for fused-capable int4 checkpoints: the
        # bit-exact grouped layout (w4grp) + attached fused-decode pack
        model = load_model_from_weights(cfg, weights, jnp.float32)
        qt = model.params["language_model"]["model"]["layers"]["self_attn"]["q_proj"]["weight"]
        from mlx_vlm_tpu.core.quant import (
            Int4GroupedTensor,
            int4_grouped_dequantize,
        )

        assert isinstance(qt, Int4GroupedTensor)
        wd = np.asarray(int4_grouped_dequantize(
            Int4GroupedTensor(
                qp=qt.qp[0], sl=qt.sl[0], sh=qt.sh[0], bl=qt.bl[0],
                bh=qt.bh[0], n=qt.n, group_size=qt.group_size,
                out_dtype=qt.out_dtype,
            ), jnp.float32))
        assert np.abs(wd - originals[0]).max() < 0.2

        # exact mode keeps the group-affine codes bit-identical
        import os

        os.environ["MLX_VLM_TPU_RUNTIME_QUANT"] = "exact"
        try:
            model = load_model_from_weights(cfg, weights, jnp.float32)
        finally:
            del os.environ["MLX_VLM_TPU_RUNTIME_QUANT"]
        qt = model.params["language_model"]["model"]["layers"]["self_attn"]["q_proj"]["weight"]
        assert isinstance(qt, QuantizedTensor)
        wd = np.asarray(dequantize(qt))
        for i, w in originals.items():
            assert np.abs(wd[i] - w).max() < 0.2
