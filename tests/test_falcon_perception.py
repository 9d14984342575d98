"""falcon_perception: fused-wqkv decoder w/ golden 2D rope + image block
mask, Fourier coord/size codecs, AnyUp segmentation upsampler.

Parity: reference mlx_vlm/models/falcon_perception (language.py Attention
:148 wqkv/sinks/_norm_w, falcon_perception.py FourierEncoder:15,
BboxDecoder:27, generate_perception:521, anyup.py AnyUp:313).  Weights
use RAW llama-lab checkpoint keys (tok_embeddings, layers.N.attention,
w13 interleave, torch conv layouts) so sanitize is exercised.
"""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step, make_cache
from mlx_vlm_tpu.utils.loader import load_model_from_weights

D, L, NQ, NKV, HD = 32, 2, 4, 2, 16
V, FFN, PS = 300, 48, 4
ENC, DEC, OUT, SEG = 8, 16, 8, 8
IMG, EOS, CLS, END = 227, 11, 244, 230
COORD, SIZE, SEGTOK = 240, 241, 262


def _cfg(**over):
    cfg = {
        "model_type": "falcon_perception",
        "dim": D, "n_layers": L, "n_heads": NQ, "n_kv_heads": NKV,
        "head_dim": HD, "vocab_size": V, "ffn_dim": FFN,
        "norm_eps": 1e-5, "max_seq_len": 512,
        "spatial_patch_size": PS,
        "coord_enc_dim": ENC, "coord_dec_dim": DEC, "coord_out_dim": OUT,
        "size_enc_dim": ENC, "size_dec_dim": DEC, "size_out_dim": OUT,
        "segm_out_dim": SEG, "num_segm_layers": 3,
    }
    cfg.update(over)
    return cfg


def _weights(seed=0):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    w = {
        "tok_embeddings.weight": rand(V, D),
        "output.weight": rand(V, D),
        "norm.weight": np.ones(D, np.float32),
        "img_projector.weight": rand(D, PS * PS * 3),
        "freqs_cis_golden": 0.3 * rand(NQ, HD // 4, 2),
        "coord_encoder.embed.weight": rand(ENC // 2, 2),
        "coord_encoder.transform.weight": rand(D, ENC),
        "coord_decoder.w1.weight": rand(DEC, D),
        "coord_decoder.w2.weight": rand(OUT, DEC),
        "size_encoder.embed.weight": rand(ENC // 2, 2),
        "size_encoder.transform.weight": rand(D, ENC),
        "size_decoder.w1.weight": rand(DEC, D),
        "size_decoder.w2.weight": rand(OUT, DEC),
        "proj_segm.layers.0.weight": rand(D, D),
        "proj_segm.layers.0.bias": 0.02 * rand(D),
        "proj_segm.layers.1.weight": rand(D, D),
        "proj_segm.layers.1.bias": 0.02 * rand(D),
        "proj_segm.pixel_layer.weight": rand(SEG, D),
        "conv_segm.weight": rand(SEG, D, 3, 3),  # torch OIHW
        "conv_segm.bias": 0.02 * rand(SEG),
    }
    C = (NQ + 2 * NKV) * HD
    for i in range(L):
        p = f"layers.{i}."
        w[p + "attention.wqkv.weight"] = rand(C, D)
        w[p + "attention.wo.weight"] = rand(D, NQ * HD)
        w[p + "attention._norm_w_in"] = 1 + 0.05 * rand(D)
        w[p + "attention._norm_w_qk"] = 1 + 0.05 * rand(HD)
        w[p + "attention.sinks"] = 0.1 * rand(NQ)
        w[p + "feed_forward.w13.weight"] = rand(2 * FFN, D)
        w[p + "feed_forward.w2.weight"] = rand(D, FFN)
        w[p + "feed_forward._norm_w"] = 1 + 0.05 * rand(D)
    return w


@pytest.fixture(scope="module")
def model():
    return load_model_from_weights(_cfg(), _weights(), jnp.float32)


def _image_prompt(gh, gw):
    """prompt with the expanded cls/reg prefix + img grid + end token."""
    prefix = [CLS, 245, 246, 247, 248]
    return np.array([[3, 4] + prefix + [IMG] * (gh * gw) + [END, 5]],
                    np.int32)


def test_text_generate(model):
    ids = (np.arange(6, dtype=np.int32) % 200 + 1)[None]
    pos, _ = model.prepare_position_ids(ids)
    e = model.get_input_embeddings(model.params, jnp.asarray(ids))
    toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=4,
                                                position_ids=pos)]
    assert len(toks) == 4


def test_image_embed_and_generate(model):
    gh = gw = 2
    ids = _image_prompt(gh, gw)
    grid = np.asarray([[gh, gw]])
    rng = np.random.default_rng(1)
    pv = (rng.standard_normal((1, gh * PS, gw * PS, 3)) * 0.2).astype(
        np.float32)
    pos, _ = model.prepare_position_ids(ids, grid)
    e = model.get_input_embeddings(model.params, jnp.asarray(ids),
                                   jnp.asarray(pv))
    assert e.shape == (1, ids.shape[1], D)
    toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=3,
                                                position_ids=pos)]
    assert len(toks) == 3


def test_position_collapse_and_block_ids(model):
    """Image tokens share one collapsed position; block ids mark the
    bidirectional span (reference _precompute_positions:168)."""
    ids = _image_prompt(2, 2)
    pos, deltas = model.prepare_position_ids(ids, np.asarray([[2, 2]]))
    p = pos[0, 0]
    S = ids.shape[1]
    # text prefix advances, whole image span holds one position
    assert p[0] == 0 and p[1] == 1
    span = p[2:2 + 5 + 4 + 1]  # cls+regs+img*4+end
    assert (span == span[0]).all()
    # suffix resumes +1 after the image (reference falcon_perception.py:180)
    assert p[-1] == span[0] + 1
    assert deltas[0, 0] == p.max() + 1 - S
    lm = model.language_model
    blk = lm.pending_blk[0]
    assert (blk[2:2 + 10] == 1).all() and blk[0] == 0 and blk[-1] == 0
    hw = lm.pending_hw[0]
    # golden coords populated exactly at the 4 img slots
    img_slots = np.nonzero(ids[0] == IMG)[0]
    assert (np.abs(hw[img_slots]).sum(-1) > 0).all()


def test_prefill_matches_stepwise_text(model):
    S = 5
    ids = (np.arange(S, dtype=np.int32) * 7 % 200 + 1)[None]
    pos, _ = model.prepare_position_ids(ids)
    e = model.get_input_embeddings(model.params, jnp.asarray(ids))
    cache = make_cache(model, 1, 16, jnp.float32)
    logits_full, _ = model(model.params, e, cache, jnp.asarray(pos))

    model.prepare_position_ids(ids)
    cache2 = make_cache(model, 1, 16, jnp.float32)
    last = None
    for t in range(S):
        p = np.full((3, 1, 1), t, np.int32)
        lg, cache2 = model(model.params, e[:, t:t + 1], cache2,
                           jnp.asarray(p))
        last = np.asarray(lg[0, 0])
    np.testing.assert_allclose(np.asarray(logits_full[0, -1]), last,
                               atol=2e-4, rtol=1e-3)


def test_image_block_mask_is_bidirectional(model):
    """An image token's logits must depend on LATER image tokens in the
    same block (causal-only would make them invisible)."""
    gh = gw = 2
    ids = _image_prompt(gh, gw)
    grid = np.asarray([[gh, gw]])
    rng = np.random.default_rng(2)
    pv = (rng.standard_normal((1, gh * PS, gw * PS, 3)) * 0.2).astype(
        np.float32)
    pos, _ = model.prepare_position_ids(ids, grid)
    e = model.get_input_embeddings(model.params, jnp.asarray(ids),
                                   jnp.asarray(pv))
    cache = make_cache(model, 1, 32, jnp.float32)
    h1, _ = model.language_model(model.params["language_model"], e, cache,
                                 jnp.asarray(pos))
    # perturb the LAST image token's embedding; the FIRST image token's
    # hidden state must change
    img_slots = np.nonzero(ids[0] == IMG)[0]
    e2 = np.asarray(e).copy()
    e2[0, img_slots[-1]] += 0.5
    model.prepare_position_ids(ids, grid)
    cache = make_cache(model, 1, 32, jnp.float32)
    h2, _ = model.language_model(model.params["language_model"],
                                 jnp.asarray(e2), cache, jnp.asarray(pos))
    d_first = np.abs(np.asarray(h1[0, img_slots[0]])
                     - np.asarray(h2[0, img_slots[0]])).max()
    assert d_first > 1e-6
    # ...but a text token BEFORE the image must not see it
    d_text = np.abs(np.asarray(h1[0, 0]) - np.asarray(h2[0, 0])).max()
    assert d_text < 1e-6


def test_perception_heads(model):
    rng = np.random.default_rng(3)
    hidden = jnp.asarray(rng.standard_normal((1, D)).astype(np.float32))
    cl = model.decode_coords(model.params, hidden)
    assert cl.shape == (1, 2, OUT // 2)
    sl = model.decode_sizes(model.params, hidden)
    assert sl.shape == (1, 2, OUT // 2)
    sizes = model.process_sizes(np.asarray(sl))
    nb = OUT // 2
    assert sizes.shape == (1, 2)
    assert (sizes >= 2.0 ** np.log2(1.0 / nb) - 1e-6).all()
    assert (sizes <= 1.0 + 1e-6).all()


def test_segm_features_lowres(model):
    """Without itok_upsampler weights the segm path yields the conv_segm
    low-res map; decode_segm_mask resizes to the pixel grid."""
    gh = gw = 2
    ids = _image_prompt(gh, gw)
    grid = np.asarray([[gh, gw]])
    rng = np.random.default_rng(4)
    pv = (rng.standard_normal((1, gh * PS, gw * PS, 3)) * 0.2).astype(
        np.float32)
    pos, _ = model.prepare_position_ids(ids, grid)
    e = model.get_input_embeddings(model.params, jnp.asarray(ids),
                                   jnp.asarray(pv))
    cache = make_cache(model, 1, 32, jnp.float32)
    hidden, _ = model.language_model(model.params["language_model"], e,
                                     cache, jnp.asarray(pos))
    feats = model.compute_segm_features(model.params, hidden, ids,
                                        jnp.asarray(pv), gh, gw)
    assert feats.shape == (1, gh, gw, SEG)
    mask = model.decode_segm_mask(model.params,
                                  jnp.asarray(hidden[0, -1]), feats,
                                  gh * PS, gw * PS)
    assert mask.shape == (gh * PS, gw * PS)
    assert mask.dtype == bool


class _FakeTokenizer:
    pad_token_id = 0
    eos_token_id = EOS

    def encode(self, text, add_special_tokens=False):
        # one image placeholder then a few query ids
        ids = []
        if "<|image|>" in text:
            ids.append(IMG)
        ids += [7, 8, 9]
        return ids

    def __call__(self, text, padding=False):
        enc = [self.encode(t) for t in text]
        return {"input_ids": enc,
                "attention_mask": [[1] * len(e) for e in enc]}

    def decode(self, ids, **kw):
        return " ".join(str(i) for i in ids)


def test_processor_expansion():
    from mlx_vlm_tpu.models.falcon_perception.processing import (
        FalconPerceptionProcessor,
    )

    proc = FalconPerceptionProcessor(_FakeTokenizer(),
                                     {"spatial_patch_size": 16})
    img = Image.fromarray(
        (np.random.default_rng(5).random((300, 280, 3)) * 255).astype(
            np.uint8))
    out = proc(text=["find the cat"], images=[img])
    ids = out["input_ids"][0]
    gh, gw = out["image_grid_hw"][0]
    assert out["pixel_values"].shape[1] == gh * 16
    assert out["pixel_values"].shape[2] == gw * 16
    assert (ids == IMG).sum() == gh * gw
    assert ids[np.argmax(ids == CLS)] == CLS  # cls/reg prefix present
    assert (ids == END).sum() == 1


def test_generate_perception_loop(model):
    """Host-driven detection loop runs and terminates (random weights:
    shape/termination contract only)."""

    class _StubProc:
        tokenizer = _FakeTokenizer()

        def __call__(self, text, images, padding=False):
            gh = gw = 2
            ids = _image_prompt(gh, gw)
            rng = np.random.default_rng(6)
            pv = (rng.standard_normal(
                (1, gh * PS, gw * PS, 3)) * 0.2).astype(np.float32)
            return {"input_ids": ids,
                    "pixel_values": pv,
                    "image_grid_hw": np.asarray([[gh, gw]], np.int32)}

    img = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
    dets = model.generate_perception(_StubProc(), image=img,
                                     query="the cat", max_new_tokens=4)
    assert isinstance(dets, list)


def _anyup_params(seed=7, qk=8):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.3).astype(np.float32)

    def enc(in_ch, k):
        blocks = {}
        for i in range(2):
            blocks[str(i)] = {
                "norm1": {"weight": np.ones(qk, np.float32),
                          "bias": np.zeros(qk, np.float32)},
                "conv1": {"weight": rand(1, 1, qk, qk)},
                "norm2": {"weight": np.ones(qk, np.float32),
                          "bias": np.zeros(qk, np.float32)},
                "conv2": {"weight": rand(1, 1, qk, qk)},
            }
        return {"conv": {"weight": rand(k, k, in_ch, qk)}, "blocks": blocks}

    p = {
        "image_encoder": enc(3, 1),
        "key_encoder": enc(qk, 1),
        "query_encoder": enc(qk, 1),
        "aggregation": enc(2 * qk, 3),
        "key_features_encoder": {
            "lfu": {"basis": rand(5, 5, 1, qk)},
            "blocks": enc(qk, 1)["blocks"],
        },
        "cross_decode": {
            "conv": {"weight": rand(3, 3, qk, qk)},
            "cross_attn": {
                "norm_q": {"weight": np.ones(qk, np.float32)},
                "norm_k": {"weight": np.ones(qk, np.float32)},
                "q_proj": {"weight": rand(qk, qk),
                           "bias": np.zeros(qk, np.float32)},
                "k_proj": {"weight": rand(qk, qk),
                           "bias": np.zeros(qk, np.float32)},
            },
        },
        "rope": {"freqs": rand(2, qk)},
    }
    return jax.tree_util.tree_map(jnp.asarray, p)


def test_anyup_upsamples():
    from mlx_vlm_tpu.models.falcon_perception.anyup import anyup

    rng = np.random.default_rng(8)
    images = jnp.asarray(
        (rng.random((1, 8, 8, 3)) * 2 - 1).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((1, 2, 2, SEG)).astype(
        np.float32))
    out = anyup(_anyup_params(), images, feats)
    assert out.shape == (1, 8, 8, SEG)
    assert np.isfinite(np.asarray(out)).all()
    # windowed attention: outputs are convex mixes of the 4 feature rows
    fmin = np.asarray(feats).reshape(4, SEG).min(0) - 1e-4
    fmax = np.asarray(feats).reshape(4, SEG).max(0) + 1e-4
    o = np.asarray(out).reshape(-1, SEG)
    assert (o >= fmin).all() and (o <= fmax).all()


def test_sanitize_anyup_remap():
    """Torch Sequential keys -> named AnyUp tree; in_proj split to q/k."""
    from mlx_vlm_tpu.models.falcon_perception import Model, ModelConfig

    m = Model(ModelConfig.from_dict(_cfg()))
    w = _weights()
    w["itok_upsampler.image_encoder.0.weight"] = np.zeros(
        (8, 3, 1, 1), np.float32)
    w["itok_upsampler.image_encoder.1.block.2.weight"] = np.zeros(
        (8, 8, 1, 1), np.float32)
    w["itok_upsampler.key_features_encoder.0.basis"] = np.zeros(
        (8, 1, 5, 5), np.float32)  # torch (out, 1, k, k)
    w["itok_upsampler.cross_decode.cross_attn.attention.in_proj_weight"] = \
        np.concatenate([np.full((8, 8), i, np.float32) for i in range(3)])
    w["itok_upsampler.cross_decode.cross_attn.attention.in_proj_bias"] = \
        np.concatenate([np.full((8,), i, np.float32) for i in range(3)])
    out = m.sanitize(w)
    assert out["itok_upsampler.image_encoder.conv.weight"].shape == \
        (1, 1, 3, 8)
    assert out["itok_upsampler.image_encoder.blocks.0.conv1.weight"].shape \
        == (1, 1, 8, 8)
    assert out["itok_upsampler.key_features_encoder.lfu.basis"].shape == \
        (5, 5, 1, 8)
    assert (out["itok_upsampler.cross_decode.cross_attn.q_proj.weight"]
            == 0).all()
    assert (out["itok_upsampler.cross_decode.cross_attn.k_proj.weight"]
            == 1).all()
    assert "itok_upsampler.cross_decode.cross_attn.v_proj.weight" not in out
