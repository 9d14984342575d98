"""molmo_point: 3-stage point predictor over the molmo2 decoder.

Parity: reference mlx_vlm/models/molmo_point (PointPredictor:174,
grammar MolmoPointLogitProcessor:233, extended vocab bounds:208,
extract_points point_utils.py:15).  Weights use RAW checkpoint keys
(model.transformer.*, split lm_head, model.vit.transformer.resblocks)
to exercise sanitize.
"""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.models.molmo_point import (
    GeneratedTokenBounds,
    extract_points_from_text,
    grammar_mask,
)
from mlx_vlm_tpu.utils.loader import load_model_from_weights

D, V, AV = 32, 200, 8  # llm width / vocab / additional vocab
E, VL = 16, 3  # vit width / layers
PD = 8  # patch_embed_dim
POOL_DIM = E * 2  # two vit taps
IMG_ID, LOW_ID = 190, 191
PATCH_TOK, SUB_TOK, LOC_TOK = 195, 196, 197


def _cfg(**over):
    cfg = {
        "model_type": "molmo_point",
        "text_config": {
            "hidden_size": D, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 2, "head_dim": 8, "vocab_size": V,
            "additional_vocab_size": AV, "rope_theta": 10000.0,
        },
        "vit_config": {
            "hidden_size": E, "intermediate_size": 32,
            "num_hidden_layers": VL, "num_attention_heads": 2,
            "num_key_value_heads": 2, "head_dim": 8,
            "image_patch_size": 2, "image_num_pos": 16,
        },
        "adapter_config": {
            "vit_layers": [-1, -2], "hidden_size": E,
            "num_attention_heads": 2, "num_key_value_heads": 2,
            "head_dim": 8, "intermediate_size": 24, "text_hidden_size": D,
        },
        "image_patch_id": IMG_ID,
        "image_non_indexable_patch_id": LOW_ID,
        "image_start_token_id": 192, "image_end_token_id": 193,
        "image_col_id": 194,
        "patch_token_id": PATCH_TOK, "subpatch_token_id": SUB_TOK,
        "location_token_id": LOC_TOK,
        "patch_embed_dim": PD,
        "eos_token_id": 1,
    }
    cfg.update(over)
    return cfg


def _weights(seed=0):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    w = {
        "model.transformer.wte.embedding": rand(V, D),
        "model.transformer.wte.new_embedding": rand(AV, D),
        "model.transformer.ln_f.weight": np.ones(D, np.float32),
        "lm_head.output_embeddings": rand(V, D),
        "lm_head.new_output_embeddings": rand(AV, D),
    }
    for i in range(2):
        p = f"model.transformer.blocks.{i}."
        w[p + "attn_norm.weight"] = np.ones(D, np.float32)
        w[p + "ff_norm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.att_proj.weight"] = rand((4 + 2 + 2) * 8, D)
        w[p + "self_attn.attn_out.weight"] = rand(D, 4 * 8)
        w[p + "self_attn.q_norm.weight"] = np.ones(8, np.float32)
        w[p + "self_attn.k_norm.weight"] = np.ones(8, np.float32)
        w[p + "mlp.ff_proj.weight"] = rand(2 * 64, D)
        w[p + "mlp.ff_out.weight"] = rand(D, 64)
    # vit (raw names under model.vit.)
    w["model.vit.patch_embedding.weight"] = rand(E, 2 * 2 * 3)
    w["model.vit.patch_embedding.bias"] = 0.02 * rand(E)
    w["model.vit.positional_embedding"] = rand(16, E)
    for i in range(VL):
        b = f"model.vit.transformer.resblocks.{i}."
        w[b + "attention_norm.weight"] = np.ones(E, np.float32)
        w[b + "attention_norm.bias"] = np.zeros(E, np.float32)
        w[b + "ffn_norm.weight"] = np.ones(E, np.float32)
        w[b + "ffn_norm.bias"] = np.zeros(E, np.float32)
        for nm in ("wq", "wk", "wv", "wo"):
            w[b + f"attention.{nm}.weight"] = rand(E, E)
            w[b + f"attention.{nm}.bias"] = 0.02 * rand(E)
        w[b + "feed_forward.w1.weight"] = rand(32, E)
        w[b + "feed_forward.w1.bias"] = 0.02 * rand(32)
        w[b + "feed_forward.w2.weight"] = rand(E, 32)
        w[b + "feed_forward.w2.bias"] = 0.02 * rand(E)
    # connector
    cp = "model.connector."
    for nm, rows in (("wq", 16), ("wk", 16), ("wv", 16)):
        w[cp + f"image_pooling_2d.{nm}.weight"] = rand(rows, POOL_DIM)
        w[cp + f"image_pooling_2d.{nm}.bias"] = 0.02 * rand(rows)
    w[cp + "image_projector.w1.weight"] = rand(24, E)
    w[cp + "image_projector.w3.weight"] = rand(24, E)
    w[cp + "image_projector.w2.weight"] = rand(D, 24)
    # point predictor
    pp = "model.point_predictor."
    w[pp + "x_norm.weight"] = np.ones(D, np.float32)
    for nm, i_dim in (("patch_q", D), ("patch_k", D), ("subpatch_q", D),
                      ("subpatch_k", POOL_DIM)):
        w[pp + nm + ".weight"] = rand(PD, i_dim)
        w[pp + nm + ".bias"] = 0.02 * rand(PD)
    w[pp + "add_no_point_class_embed.vector"] = 0.1 * rand(PD)
    w[pp + "subpatch_loc_k.weight"] = rand(9, D)
    w[pp + "subpatch_loc_k.bias"] = 0.02 * rand(9)
    w["model.build_vit_embedding.weight"] = rand(D, POOL_DIM)
    w["model.build_vit_embedding.bias"] = 0.02 * rand(D)
    return w


@pytest.fixture(scope="module")
def model():
    return load_model_from_weights(_cfg(), _weights(), jnp.float32)


class _Tok:
    """Greedy longest-match tokenizer over the special strings."""

    SPECIALS = {
        "<im_patch>": IMG_ID, "<im_low>": LOW_ID, "<im_start>": 192,
        "<im_end>": 193, "<im_col>": 194, "<low_res_im_start>": 192,
    }
    pad_token_id = 0

    def encode(self, text):
        ids, i = [], 0
        while i < len(text):
            for s, t in self.SPECIALS.items():
                if text.startswith(s, i):
                    ids.append(t)
                    i += len(s)
                    break
            else:
                ids.append(ord(text[i]) % 180 + 2)
                i += 1
        return ids

    def __call__(self, texts, padding=True):
        enc = [self.encode(t) for t in texts]
        L = max(len(e) for e in enc)
        return {"input_ids": [[0] * (L - len(e)) + e for e in enc],
                "attention_mask": [[0] * (L - len(e)) + [1] * len(e)
                                   for e in enc]}

    def decode(self, ids, **kw):
        return "".join(chr(97 + (i % 26)) for i in ids)


def _proc():
    from mlx_vlm_tpu.models.molmo_point.processing import (
        MolmoPointProcessor,
    )

    return MolmoPointProcessor(
        _Tok(), max_crops=4, overlap_margins=(1, 1), base_size=(8, 8),
        patch=2, pooling_size=(2, 2))


def test_text_generate(model):
    ids = (np.arange(6, dtype=np.int32) % 150 + 2)[None]
    e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
    toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=4)]
    assert len(toks) == 4


def test_processor_geometry():
    proc = _proc()
    img = Image.fromarray((np.random.default_rng(0).random(
        (12, 12, 3)) * 255).astype(np.uint8))
    out = proc(text=["point to it <|image|>"], images=[img])
    ids = out["input_ids"][0]
    # low-res 2x2 <im_low> + high-res 3x3 <im_patch> = 13 merge slots
    assert (ids == LOW_ID).sum() == 4
    assert (ids == IMG_ID).sum() == 9
    assert out["pooled_patches_idx"].shape[0] == 13
    assert out["pixel_values"].shape[0] == 5  # 1 global + 4 crops
    meta = proc._pointing_metadata
    assert meta["token_pooling"].shape == out["pooled_patches_idx"].shape
    assert meta["subpatch_mapping"][0].shape == (6, 6)
    # owner map references high-res crops (ids offset past global crop)
    assert meta["subpatch_mapping"][0].min() >= 16


def test_image_embed_and_generate(model):
    proc = _proc()
    img = Image.fromarray((np.random.default_rng(1).random(
        (12, 12, 3)) * 255).astype(np.uint8))
    out = proc(text=["what is this <|image|>"], images=[img])
    e = model.get_input_embeddings(
        model.params, jnp.asarray(out["input_ids"]),
        jnp.asarray(out["pixel_values"]),
        jnp.asarray(out["pooled_patches_idx"]))
    assert e.shape == (1, out["input_ids"].shape[1], D)
    toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=3)]
    assert len(toks) == 3


def test_grammar_mask_transitions():
    b = GeneratedTokenBounds(100, 5, 4, 9, True)
    total = b.location_end
    kw = dict(prevent_repeats=True, force_patch_sorted=True,
              force_subpatch_sorted=True)
    # after plain text: subpatch/location blocked, patches allowed
    m = grammar_mask(b, [7], 7, total, **kw)
    assert (m[b.subpatch_start: b.location_end] < 0).all()
    assert m[b.patch_start] == 0
    # after a patch token: ONLY subpatches allowed
    m = grammar_mask(b, [7, b.patch_start + 2], b.patch_start + 2, total,
                     **kw)
    assert (m[: b.subpatch_start] < 0).all()
    assert (m[b.subpatch_start: b.subpatch_end] == 0).all()
    assert (m[b.subpatch_end:] < 0).all()
    # after a subpatch: ONLY locations allowed
    m = grammar_mask(b, [b.patch_start, b.subpatch_start + 1],
                     b.subpatch_start + 1, total, **kw)
    assert (m[: b.location_start] < 0).all()
    assert (m[b.location_start: b.location_end] == 0).all()
    # no-more-points: every point token blocked forever
    m = grammar_mask(b, [b.no_more_points_token_id, 9], 9, total, **kw)
    assert (m[b.patch_start: b.location_end] < 0).all()
    # patch sorting: earlier patches blocked after a later one
    m = grammar_mask(b, [b.patch_start + 3, b.subpatch_start,
                         b.location_start, 9], 9, total, **kw)
    assert (m[b.patch_start: b.patch_start + 3] < 0).all()
    assert m[b.patch_start + 3] == 0


def test_extract_points_roundtrip():
    pooling = np.arange(13 * 4).reshape(13, 4)
    mapping = np.arange(16, 16 + 36).reshape(6, 6)
    # choose patch 2 / subpatch 1 so vit id = pooling[2, 1] = 9... must be
    # inside the mapping range; use pooling rows that hit mapping values
    pooling = np.full((13, 4), -1)
    pooling[2, 1] = 20  # row 0, col 4 of mapping
    meta = {"token_pooling": pooling, "subpatch_mapping": [mapping],
            "image_sizes": [(60, 60)]}
    n_patches, n_sub = 13 + 1, 4  # +1 no-more-points
    text = (f"<POINT_2><POINT_{n_patches + 1}>"
            f"<POINT_{n_patches + n_sub + 4}>7")
    pts = extract_points_from_text(text, meta, True, "3x3")
    assert len(pts) == 1
    obj, img_ix, x, y = pts[0]
    assert obj == 7 and img_ix == 0
    # mapping pos of 20: row 0, col 4; location 4 -> (1,1) third-grid
    assert 0 < x < 60 and 0 < y < 60


def test_generate_points_loop(model):
    proc = _proc()
    img = Image.fromarray((np.random.default_rng(2).random(
        (12, 12, 3)) * 255).astype(np.uint8))
    text, pts = model.generate_points(
        proc, image=img, prompt="point to the dot <|image|>",
        max_new_tokens=6)
    assert isinstance(text, str) and isinstance(pts, list)
    # grammar: any POINT triple in the text must be well-ordered
    import re

    ids = [int(m.group(1)) for m in re.finditer(r"<POINT_(\d+)>", text)]
    assert len(ids) <= 6
