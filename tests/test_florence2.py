"""Florence-2: DaViT tower + BART encoder-decoder generation.

Contract parity: reference mlx_vlm/models/florence2/ — DaViT stage/window
shapes (vision.py:450), post-norm enc/dec blocks with offset-2 learned
positions (language.py:218/264), image-first merge (florence2.py:238),
cached greedy decode equals uncached full re-decode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_florence2_config():
    return {
        "model_type": "florence2",
        "image_token_id": 60,
        "image_feature_source": ["temporal_avg_pool", "spatial_avg_pool"],
        "image_pos_embed": {"type": "learned_abs_2d",
                            "max_pos_embeddings": 8},
        "visual_temporal_embedding": {"type": "COSINE",
                                      "max_temporal_embeddings": 4},
        "vision_config": {
            "model_type": "davit",
            "depths": [1, 1],
            "dim_embed": [8, 16],
            "num_heads": [2, 4],
            "num_groups": [2, 4],
            "window_size": 2,
            "mlp_ratio": 2.0,
            "patch_size": [3, 3],
            "patch_stride": [2, 2],
            "patch_padding": [1, 1],
            "patch_prenorm": [False, True],
        },
        "text_config": {
            "model_type": "florence2",
            "d_model": 16,
            "encoder_attention_heads": 2,
            "decoder_attention_heads": 2,
            "encoder_ffn_dim": 32,
            "decoder_ffn_dim": 32,
            "encoder_layers": 2,
            "decoder_layers": 2,
            "max_position_embeddings": 64,
            "vocab_size": 64,
            "eos_token_id": 2,
            "decoder_start_token_id": 2,
        },
    }


def tiny_florence2_weights(cfg, seed=0, scale=0.08):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def ln(d):
        return {"weight": np.ones(d, np.float32),
                "bias": np.zeros(d, np.float32)}

    w = {}
    vc = cfg["vision_config"]
    tc = cfg["text_config"]
    D = tc["d_model"]

    # ---- DaViT
    in_ch = 3
    for i, dim in enumerate(vc["dim_embed"]):
        p = f"vision_tower.convs.{i}"
        k = vc["patch_size"][i]
        w[f"{p}.proj.weight"] = rand(dim, in_ch, k, k)  # torch OIHW
        w[f"{p}.proj.bias"] = rand(dim)
        nd = in_ch if vc["patch_prenorm"][i] else dim
        for kk, vv in ln(nd).items():
            w[f"{p}.norm.{kk}"] = vv
        for j in range(vc["depths"][i]):
            for blk, attn in (("spatial_block", "window_attn"),
                              ("channel_block", "channel_attn")):
                b = f"vision_tower.blocks.{i}.{j}.{blk}"
                for conv in ("conv1", "conv2"):
                    w[f"{b}.{conv}.fn.dw.weight"] = rand(dim, 1, 3, 3)
                    w[f"{b}.{conv}.fn.dw.bias"] = rand(dim)
                for kk, vv in ln(dim).items():
                    w[f"{b}.{attn}.norm.{kk}"] = vv
                w[f"{b}.{attn}.fn.qkv.weight"] = rand(3 * dim, dim)
                w[f"{b}.{attn}.fn.qkv.bias"] = rand(3 * dim)
                w[f"{b}.{attn}.fn.proj.weight"] = rand(dim, dim)
                w[f"{b}.{attn}.fn.proj.bias"] = rand(dim)
                for kk, vv in ln(dim).items():
                    w[f"{b}.ffn.norm.{kk}"] = vv
                hid = int(dim * vc["mlp_ratio"])
                w[f"{b}.ffn.fn.net.fc1.weight"] = rand(hid, dim)
                w[f"{b}.ffn.fn.net.fc1.bias"] = rand(hid)
                w[f"{b}.ffn.fn.net.fc2.weight"] = rand(dim, hid)
                w[f"{b}.ffn.fn.net.fc2.bias"] = rand(dim)
        in_ch = dim

    # ---- projection + position embeds
    vdim = vc["dim_embed"][-1]
    w["image_projection"] = rand(vdim, D)
    for kk, vv in ln(D).items():
        w[f"image_proj_norm.{kk}"] = vv
    w["image_pos_embed.row_embeddings.weight"] = rand(8, vdim // 2)
    w["image_pos_embed.column_embeddings.weight"] = rand(8, vdim - vdim // 2)

    # ---- BART
    V = tc["vocab_size"]
    w["language_model.model.shared.weight"] = rand(V, D)
    for side, n in (("encoder", tc["encoder_layers"]),
                    ("decoder", tc["decoder_layers"])):
        base = f"language_model.model.{side}"
        w[f"{base}.embed_positions.weight"] = rand(
            tc["max_position_embeddings"] + 2, D)
        for kk, vv in ln(D).items():
            w[f"{base}.layernorm_embedding.{kk}"] = vv
        for i in range(n):
            lp = f"{base}.layers.{i}"
            attns = ["self_attn"] + (["encoder_attn"] if side == "decoder"
                                     else [])
            for a in attns:
                for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                    w[f"{lp}.{a}.{proj}.weight"] = rand(D, D)
                    w[f"{lp}.{a}.{proj}.bias"] = rand(D)
                for kk, vv in ln(D).items():
                    w[f"{lp}.{a}_layer_norm.{kk}"] = vv
            ffn = tc["encoder_ffn_dim"]
            w[f"{lp}.fc1.weight"] = rand(ffn, D)
            w[f"{lp}.fc1.bias"] = rand(ffn)
            w[f"{lp}.fc2.weight"] = rand(D, ffn)
            w[f"{lp}.fc2.bias"] = rand(D)
            for kk, vv in ln(D).items():
                w[f"{lp}.final_layer_norm.{kk}"] = vv
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_florence2_config()
    return load_model_from_weights(cfg, tiny_florence2_weights(cfg),
                                   jnp.float32)


class TestVision:
    def test_tower_shapes(self, model):
        px = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (1, 16, 16, 3)), jnp.float32)
        out = model.vision_tower(model.params["vision_tower"], px)
        # stride 2 twice: 16 -> 8 -> 4 => 16 tokens at dim 16
        assert out.shape == (1, 16, 16)
        assert np.isfinite(np.asarray(out)).all()

    def test_encode_image_merge(self, model):
        px = jnp.ones((1, 16, 16, 3), jnp.float32)
        feats = model._encode_image(model.params, px)
        # temporal_avg_pool (16 tokens) + spatial_avg_pool (1 token)
        assert feats.shape == (1, 17, 16)

    def test_image_plus_text_embeddings(self, model):
        ids = jnp.asarray([[4, 5, 6]], jnp.int32)
        px = jnp.ones((1, 16, 16, 3), jnp.float32)
        emb = model.get_input_embeddings(model.params, ids, px)
        assert emb.shape == (1, 17 + 3, 16)


class TestEncDec:
    def test_cached_decode_matches_full_redecode(self, model):
        """The incremental cache must be exact: decoding token-by-token
        equals a single full decoder forward over the same tokens."""
        ids = jnp.asarray([[3, 9, 4, 7]], jnp.int32)
        emb = model.get_input_embeddings(model.params, ids)
        enc = model.encode(model.params, emb)
        dec_ids = [2, 11, 5, 8]

        cache = model.init_decode_cache(model.params, enc, None, 32,
                                        jnp.float32)
        step_logits = []
        for t in dec_ids:
            lg, cache = model.decode(model.params, cache,
                                     jnp.asarray([[t]], jnp.int32))
            step_logits.append(np.asarray(lg[0, -1]))

        cache2 = model.init_decode_cache(model.params, enc, None, 32,
                                         jnp.float32)
        full, _ = model.decode(model.params, cache2,
                               jnp.asarray([dec_ids], jnp.int32))
        for i, sl in enumerate(step_logits):
            np.testing.assert_allclose(sl, np.asarray(full[0, i]),
                                       rtol=2e-4, atol=2e-5)

    def test_encoder_mask_blocks_padding(self, model):
        ids = jnp.asarray([[3, 9, 4, 0, 0]], jnp.int32)
        emb = model.get_input_embeddings(model.params, ids)
        m1 = jnp.asarray([[1, 1, 1, 0, 0]], bool)
        enc_a = model.encode(model.params, emb, m1)
        emb2 = emb.at[:, 3:].set(99.0)
        enc_b = model.encode(model.params, emb2, m1)
        np.testing.assert_allclose(np.asarray(enc_a[:, :3]),
                                   np.asarray(enc_b[:, :3]), rtol=1e-4,
                                   atol=1e-5)


class TestGenerate:
    def test_stream_generate_end_to_end(self, model):
        from mlx_vlm_tpu.generate.dispatch import stream_generate
        from mlx_vlm_tpu.generate.encdec import is_encdec_model

        assert is_encdec_model(model)

        class _FakeTok:
            eos_token_id = 2
            vocab = {}

            def decode(self, ids, **kw):
                return "".join(chr(97 + (i % 26)) for i in ids)

            def __call__(self, text, **kw):
                ids = [(ord(c) * 7) % 60 for c in str(text)][:8]
                return {"input_ids": np.asarray([ids]),
                        "attention_mask": np.ones((1, len(ids)), np.int64)}

        class _Proc:
            tokenizer = _FakeTok()

            def __call__(self, text=None, images=None, videos=None, **kw):
                out = dict(self.tokenizer(
                    text[0] if isinstance(text, list) else text))
                if images:
                    arr = np.stack([np.asarray(im, np.float32) / 255.0
                                    for im in images])
                    out["pixel_values"] = arr.transpose(0, 3, 1, 2)  # NCHW
                return out

        img = np.random.default_rng(0).integers(
            0, 255, (16, 16, 3)).astype(np.uint8)
        results = list(stream_generate(model, _Proc(), "<OCR>", image=[img],
                                       max_tokens=6))
        assert 1 <= len(results) <= 6
        assert results[-1].finish_reason in ("stop", "length")
        assert results[0].prompt_tokens == 17 + len("<OCR>")

    def test_greedy_deterministic(self, model):
        from mlx_vlm_tpu.generate.encdec import encdec_generate_step

        ids = jnp.asarray([[3, 9, 4]], jnp.int32)
        emb = model.get_input_embeddings(model.params, ids)
        a = [int(t[0]) for t in encdec_generate_step(model, emb,
                                                     max_tokens=5)]
        b = [int(t[0]) for t in encdec_generate_step(model, emb,
                                                     max_tokens=5)]
        assert a == b and len(a) == 5


class TestBuiltinProcessor:
    def test_florence2_processor(self):
        from mlx_vlm_tpu.models.florence2.processing import \
            Florence2Processor

        class _Tok:
            def __call__(self, text, **kw):
                ids = [ord(c) % 50 for c in text]
                return {"input_ids": np.asarray([ids])}

        proc = Florence2Processor(_Tok(), image_size=32)
        img = np.random.default_rng(0).integers(
            0, 255, (20, 30, 3)).astype(np.uint8)
        out = proc(text="<OCR>", images=[img])
        assert out["input_ids"].shape[1] == 5
        assert out["pixel_values"].shape == (1, 3, 32, 32)
        # bare-prompt passthrough
        assert proc.apply_chat_template("<CAPTION>") == "<CAPTION>"


class TestMoondreamProcessor:
    def test_layout(self):
        from mlx_vlm_tpu.models.moondream2.processing import \
            MoondreamProcessor

        class _Tok:
            bos_token_id = 7

            def __call__(self, text, **kw):
                return {"input_ids": np.asarray([[10, 11, 12]])}

        proc = MoondreamProcessor(_Tok(), crop_size=28, patch_size=14)
        img = np.zeros((28, 28, 3), np.uint8)
        out = proc(text="hi", images=[img])
        n_vis = (28 // 14) ** 2
        ids = out["input_ids"][0]
        assert ids[0] == 7
        assert (ids[1:1 + n_vis] == 0).all()
        assert list(ids[1 + n_vis:]) == [10, 11, 12]
        assert out["pixel_values"].shape == (1, 28, 28, 3)
