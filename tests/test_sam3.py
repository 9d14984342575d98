"""SAM3 promptable segmentation: detector forward, geometry prompts,
tracker step, predictor pipeline.

Reference parity: mlx_vlm/models/sam3.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.utils.loader import load_model_from_weights

PS = 4            # patch size
IMG = 32          # image size -> 8x8 ViT grid
D_VIT = 16
D = 8             # detr hidden
D_TEXT = 12


def _tiny_cfg():
    return {
        "model_type": "sam3_video",
        "low_res_mask_size": 16,
        "detector_config": {
            "vision_config": {
                "backbone_config": {
                    "hidden_size": D_VIT,
                    "num_hidden_layers": 2,
                    "num_attention_heads": 2,
                    "intermediate_size": 32,
                    "image_size": IMG,
                    "patch_size": PS,
                    "window_size": 4,
                    "global_attn_indexes": [1],
                    "pretrain_image_size": 2 * PS,  # 2x2 pos grid, tiled
                },
                "fpn_hidden_size": D,
                "scale_factors": [4.0, 2.0, 1.0, 0.5],
            },
            "text_config": {
                "hidden_size": D_TEXT,
                "num_hidden_layers": 2,
                "num_attention_heads": 2,
                "intermediate_size": 24,
                "vocab_size": 64,
                "max_position_embeddings": 8,
                "projection_dim": 8,
            },
            "detr_encoder_config": {
                "hidden_size": D, "num_layers": 2,
                "num_attention_heads": 2, "intermediate_size": 16,
            },
            "detr_decoder_config": {
                "hidden_size": D, "num_layers": 2,
                "num_attention_heads": 2, "num_queries": 6,
                "intermediate_size": 16,
            },
            "geometry_encoder_config": {
                "hidden_size": D, "num_layers": 1,
                "num_attention_heads": 2, "intermediate_size": 16,
                "roi_size": 3,
            },
            "mask_decoder_config": {
                "hidden_size": D, "num_attention_heads": 2,
                "num_upsampling_stages": 2,
            },
        },
        "tracker_config": {
            "image_size": IMG,
            "vision_config": {
                "backbone_config": {
                    "hidden_size": D_VIT, "patch_size": PS,
                    "image_size": IMG,
                },
                "fpn_hidden_size": D,
                "scale_factors": [4.0, 2.0, 1.0, 0.5],
            },
            "mask_decoder_config": {
                "hidden_size": D, "num_hidden_layers": 1,
                "num_attention_heads": 2, "attention_downsample_rate": 2,
                "num_multimask_outputs": 3, "mlp_dim": 16,
            },
            "prompt_encoder_config": {
                "hidden_size": D, "image_size": IMG, "patch_size": PS,
                "mask_input_channels": 8,
            },
            "memory_attention_hidden_size": D,
            "memory_attention_num_layers": 1,
            "memory_attention_num_attention_heads": 1,
            "memory_attention_feed_forward_hidden_size": 16,
            "memory_attention_rope_feat_sizes": [8, 8],
            "memory_encoder_hidden_size": D,
            "memory_encoder_output_channels": 4,
            "memory_fuser_embed_dim": D,
            "memory_fuser_num_layers": 1,
            "memory_fuser_intermediate_dim": 16,
        },
    }


def _weights(cfg, seed=0):
    rng = np.random.default_rng(seed)
    w = {}

    def lin(p, i, o, bias=True):
        w[f"{p}.weight"] = rng.standard_normal((o, i)).astype(np.float32) * 0.1
        if bias:
            w[f"{p}.bias"] = np.zeros(o, np.float32)

    def ln(p, c):
        w[f"{p}.weight"] = np.ones(c, np.float32)
        w[f"{p}.bias"] = np.zeros(c, np.float32)

    def conv(p, i, o, k, bias=True, groups=1):
        w[f"{p}.weight"] = rng.standard_normal(
            (o, i // groups, k, k)).astype(np.float32) * 0.1
        if bias:
            w[f"{p}.bias"] = np.zeros(o, np.float32)

    def convT(p, i, o, k=2):
        # torch ConvTranspose2d layout (in, out, kH, kW)
        w[f"{p}.weight"] = rng.standard_normal(
            (i, o, k, k)).astype(np.float32) * 0.1
        w[f"{p}.bias"] = np.zeros(o, np.float32)

    def mha(p, d, kv=None, out_name="o_proj"):
        kv = kv or d
        lin(f"{p}.q_proj", d, d)
        lin(f"{p}.k_proj", kv, d)
        lin(f"{p}.v_proj", kv, d)
        lin(f"{p}.{out_name}", d, d)

    def fpn(prefix, in_c, d):
        for i, sf in enumerate([4.0, 2.0, 1.0, 0.5]):
            p = f"{prefix}.fpn_layers.{i}"
            c = in_c
            if sf >= 4.0:
                convT(f"{p}.scale_layers.0", c, c // 2)
                convT(f"{p}.scale_layers.2", c // 2, c // 4)
                c = c // 4
            elif sf >= 2.0:
                convT(f"{p}.scale_layers.0", c, c // 2)
                c = c // 2
            conv(f"{p}.proj1", c, d, 1)
            conv(f"{p}.proj2", d, d, 3)

    det = "detector_model"
    bc = cfg["detector_config"]["vision_config"]["backbone_config"]
    bb = f"{det}.vision_encoder.backbone"
    conv(f"{bb}.embeddings.patch_embeddings.projection", 3, D_VIT, PS,
         bias=False)
    g = bc["pretrain_image_size"] // PS
    w[f"{bb}.embeddings.position_embeddings"] = rng.standard_normal(
        (1, g * g, D_VIT)).astype(np.float32) * 0.02
    ln(f"{bb}.layer_norm", D_VIT)
    for i in range(bc["num_hidden_layers"]):
        p = f"{bb}.layers.{i}"
        ln(f"{p}.layer_norm1", D_VIT)
        ln(f"{p}.layer_norm2", D_VIT)
        mha(f"{p}.attention", D_VIT)
        lin(f"{p}.mlp.fc1", D_VIT, bc["intermediate_size"])
        lin(f"{p}.mlp.fc2", bc["intermediate_size"], D_VIT)
    fpn(f"{det}.vision_encoder.neck", D_VIT, D)

    tc = cfg["detector_config"]["text_config"]
    tm = f"{det}.text_encoder.text_model"
    w[f"{tm}.embeddings.token_embedding.weight"] = rng.standard_normal(
        (tc["vocab_size"], D_TEXT)).astype(np.float32) * 0.02
    w[f"{tm}.embeddings.position_embedding.weight"] = rng.standard_normal(
        (tc["max_position_embeddings"], D_TEXT)).astype(np.float32) * 0.02
    for i in range(tc["num_hidden_layers"]):
        p = f"{tm}.encoder.layers.{i}"
        mha(f"{p}.self_attn", D_TEXT, out_name="out_proj")
        ln(f"{p}.layer_norm1", D_TEXT)
        ln(f"{p}.layer_norm2", D_TEXT)
        lin(f"{p}.mlp.fc1", D_TEXT, tc["intermediate_size"])
        lin(f"{p}.mlp.fc2", tc["intermediate_size"], D_TEXT)
    ln(f"{tm}.final_layer_norm", D_TEXT)
    lin(f"{det}.text_encoder.text_projection", D_TEXT,
        tc["projection_dim"], bias=False)   # passive (unused at runtime)
    lin(f"{det}.text_projection", D_TEXT, D)

    ec = cfg["detector_config"]["detr_encoder_config"]
    for i in range(ec["num_layers"]):
        p = f"{det}.detr_encoder.layers.{i}"
        mha(f"{p}.self_attn", D)
        mha(f"{p}.cross_attn", D)
        for j in (1, 2, 3):
            ln(f"{p}.layer_norm{j}", D)
        lin(f"{p}.mlp.fc1", D, ec["intermediate_size"])
        lin(f"{p}.mlp.fc2", ec["intermediate_size"], D)

    dc = cfg["detector_config"]["detr_decoder_config"]
    dd = f"{det}.detr_decoder"
    for i in range(dc["num_layers"]):
        p = f"{dd}.layers.{i}"
        for name in ("self_attn", "text_cross_attn", "vision_cross_attn"):
            mha(f"{p}.{name}", D)
            ln(f"{p}.{name}_layer_norm", D)
        lin(f"{p}.mlp.fc1", D, dc["intermediate_size"])
        lin(f"{p}.mlp.fc2", dc["intermediate_size"], D)
        ln(f"{p}.mlp_layer_norm", D)
    ln(f"{dd}.output_layer_norm", D)
    w[f"{dd}.query_embed.weight"] = rng.standard_normal(
        (dc["num_queries"], D)).astype(np.float32) * 0.1
    w[f"{dd}.reference_points.weight"] = rng.standard_normal(
        (dc["num_queries"], 4)).astype(np.float32) * 0.1
    w[f"{dd}.presence_token.weight"] = rng.standard_normal(
        (1, D)).astype(np.float32) * 0.1
    for h in ("presence_head", "box_head"):
        lin(f"{dd}.{h}.layer1", D, D)
        lin(f"{dd}.{h}.layer2", D, D)
        lin(f"{dd}.{h}.layer3", D, 1 if h == "presence_head" else 4)
    ln(f"{dd}.presence_layer_norm", D)
    lin(f"{dd}.ref_point_head.layer1", 2 * D, D)
    lin(f"{dd}.ref_point_head.layer2", D, D)
    for ax in ("x", "y"):
        lin(f"{dd}.box_rpb_embed_{ax}.layer1", 2, D)
        lin(f"{dd}.box_rpb_embed_{ax}.layer2", D,
            dc["num_attention_heads"])

    gc_ = cfg["detector_config"]["geometry_encoder_config"]
    ge = f"{det}.geometry_encoder"
    w[f"{ge}.label_embed.weight"] = rng.standard_normal(
        (2, D)).astype(np.float32) * 0.1
    w[f"{ge}.cls_embed.weight"] = rng.standard_normal(
        (1, D)).astype(np.float32) * 0.1
    lin(f"{ge}.boxes_direct_project", 4, D)
    conv(f"{ge}.boxes_pool_project", D, D, gc_["roi_size"])
    lin(f"{ge}.boxes_pos_enc_project", D + 2, D)
    ln(f"{ge}.vision_layer_norm", D)
    lin(f"{ge}.final_proj", D, D)
    ln(f"{ge}.prompt_layer_norm", D)
    for i in range(gc_["num_layers"]):
        p = f"{ge}.layers.{i}"
        mha(f"{p}.self_attn", D)
        mha(f"{p}.cross_attn", D)
        for j in (1, 2, 3):
            ln(f"{p}.layer_norm{j}", D)
        lin(f"{p}.mlp.fc1", D, gc_["intermediate_size"])
        lin(f"{p}.mlp.fc2", gc_["intermediate_size"], D)
    ln(f"{ge}.output_layer_norm", D)

    md = f"{det}.mask_decoder"
    for i in range(2):
        conv(f"{md}.pixel_decoder.conv_layers.{i}", D, D, 3)
        ln(f"{md}.pixel_decoder.norms.{i}", D)
    for i in range(3):
        lin(f"{md}.mask_embedder.layers.{i}", D, D)
    mha(f"{md}.prompt_cross_attn", D)
    ln(f"{md}.prompt_cross_attn_norm", D)
    conv(f"{md}.semantic_projection", D, 1, 1)
    conv(f"{md}.instance_projection", D, D, 1)

    dps = f"{det}.dot_product_scoring"
    lin(f"{dps}.query_proj", D, D)
    lin(f"{dps}.text_proj", D, D)
    lin(f"{dps}.text_mlp.layer1", D, 8 * D)
    lin(f"{dps}.text_mlp.layer2", 8 * D, D)
    ln(f"{dps}.text_mlp_out_norm", D)

    # ---- tracker
    trk = "tracker_model"
    pe = f"{trk}.prompt_encoder"
    w[f"{pe}.point_embed.weight"] = rng.standard_normal(
        (4, D)).astype(np.float32) * 0.1
    w[f"{pe}.not_a_point_embed.weight"] = rng.standard_normal(
        (1, D)).astype(np.float32) * 0.1
    w[f"{pe}.no_mask_embed.weight"] = rng.standard_normal(
        (1, D)).astype(np.float32) * 0.1
    w[f"{pe}.shared_embedding.positional_embedding"] = rng.standard_normal(
        (2, D // 2)).astype(np.float32)
    mic = cfg["tracker_config"]["prompt_encoder_config"][
        "mask_input_channels"]
    conv(f"{pe}.mask_embed.conv1", 1, mic // 4, 2)
    conv(f"{pe}.mask_embed.conv2", mic // 4, mic, 2)
    conv(f"{pe}.mask_embed.conv3", mic, D, 1)
    ln(f"{pe}.mask_embed.layer_norm1", mic // 4)
    ln(f"{pe}.mask_embed.layer_norm2", mic)

    smd = f"{trk}.mask_decoder"
    tmc = cfg["tracker_config"]["mask_decoder_config"]
    n_mask = tmc["num_multimask_outputs"] + 1
    for i in range(tmc["num_hidden_layers"]):
        p = f"{smd}.transformer.layers.{i}"
        mha(f"{p}.self_attn", D)
        # downsampled internal dim
        for nm in ("cross_attn_token_to_image", "cross_attn_image_to_token"):
            lin(f"{p}.{nm}.q_proj", D, D // 2)
            lin(f"{p}.{nm}.k_proj", D, D // 2)
            lin(f"{p}.{nm}.v_proj", D, D // 2)
            lin(f"{p}.{nm}.o_proj", D // 2, D)
        for j in (1, 2, 3, 4):
            ln(f"{p}.layer_norm{j}", D)
        lin(f"{p}.mlp.proj_in", D, tmc["mlp_dim"])
        lin(f"{p}.mlp.proj_out", tmc["mlp_dim"], D)
    lin(f"{smd}.transformer.final_attn_token_to_image.q_proj", D, D // 2)
    lin(f"{smd}.transformer.final_attn_token_to_image.k_proj", D, D // 2)
    lin(f"{smd}.transformer.final_attn_token_to_image.v_proj", D, D // 2)
    lin(f"{smd}.transformer.final_attn_token_to_image.o_proj", D // 2, D)
    ln(f"{smd}.transformer.layer_norm_final_attn", D)
    w[f"{smd}.iou_token.weight"] = rng.standard_normal(
        (1, D)).astype(np.float32) * 0.1
    w[f"{smd}.mask_tokens.weight"] = rng.standard_normal(
        (n_mask, D)).astype(np.float32) * 0.1
    w[f"{smd}.obj_score_token.weight"] = rng.standard_normal(
        (1, D)).astype(np.float32) * 0.1
    for i in range(n_mask):
        p = f"{smd}.output_hypernetworks_mlps.{i}"
        lin(f"{p}.proj_in", D, D)
        lin(f"{p}.layers.0", D, D)
        lin(f"{p}.proj_out", D, D // 8)
    for nm, o in (("iou_prediction_head", n_mask),
                  ("pred_obj_score_head", 1)):
        lin(f"{smd}.{nm}.proj_in", D, D)
        lin(f"{smd}.{nm}.layers.0", D, D)
        lin(f"{smd}.{nm}.proj_out", D, o)
    convT(f"{smd}.upscale_conv1", D, D // 4)
    convT(f"{smd}.upscale_conv2", D // 4, D // 8)
    ln(f"{smd}.upscale_layer_norm", D // 4)
    conv(f"{smd}.conv_s0", D, D // 8, 1)
    conv(f"{smd}.conv_s1", D, D // 4, 1)

    tcg = cfg["tracker_config"]
    mem_dim = tcg["memory_encoder_output_channels"]
    ma = f"{trk}.memory_attention"
    for i in range(tcg["memory_attention_num_layers"]):
        p = f"{ma}.layers.{i}"
        mha(f"{p}.self_attn", D)
        mha(f"{p}.cross_attn_image", D, kv=mem_dim)
        for j in (1, 2, 3):
            ln(f"{p}.layer_norm{j}", D)
        lin(f"{p}.linear1", D,
            tcg["memory_attention_feed_forward_hidden_size"])
        lin(f"{p}.linear2",
            tcg["memory_attention_feed_forward_hidden_size"], D)
    ln(f"{ma}.layer_norm", D)

    me = f"{trk}.memory_encoder"
    chans = [1, 4, 16, 64, D]
    for i in range(4):
        conv(f"{me}.mask_downsampler.layers.{i}.conv", chans[i],
             chans[i + 1], 3)
        ln(f"{me}.mask_downsampler.layers.{i}.layer_norm", chans[i + 1])
    conv(f"{me}.mask_downsampler.final_conv", D, D, 1)
    for i in range(tcg["memory_fuser_num_layers"]):
        p = f"{me}.memory_fuser.layers.{i}"
        conv(f"{p}.depthwise_conv", D, D, 7,
             groups=D)
        ln(f"{p}.layer_norm", D)
        lin(f"{p}.pointwise_conv1", D, tcg["memory_fuser_intermediate_dim"])
        lin(f"{p}.pointwise_conv2", tcg["memory_fuser_intermediate_dim"], D)
        w[f"{p}.scale"] = np.full(D, 1e-6, np.float32)
    conv(f"{me}.feature_projection", D, D, 1)
    conv(f"{me}.projection", D, mem_dim, 1)

    lin(f"{trk}.object_pointer_proj.proj_in", D, D)
    lin(f"{trk}.object_pointer_proj.layers.0", D, D)
    lin(f"{trk}.object_pointer_proj.proj_out", D, D)
    # passive 4D param exercising the sanitize skip pattern
    w[f"{trk}.memory_temporal_positional_encoding"] = np.zeros(
        (7, 1, 1, mem_dim), np.float32)

    fpn("tracker_neck", D_VIT, D)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = _tiny_cfg()
    return load_model_from_weights(cfg, _weights(cfg), jnp.float32)


def _px(seed=0, B=1):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(
        (B, IMG, IMG, 3)).astype(np.float32))


def _text(seed=1, B=1, T=6):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, 64, (B, T)).astype(np.int32)
    am = np.ones((B, T), np.int32)
    am[:, -2:] = 0
    return jnp.asarray(ids), jnp.asarray(am)


class TestSam3Detector:
    def test_detect_shapes(self, model):
        ids, am = _text()
        out = model.detect(model.params, _px(), ids, am)
        Q = 6
        assert out["pred_logits"].shape == (1, Q)
        assert out["pred_boxes"].shape == (1, Q, 4)
        # masks at the finest trimmed FPN level (4x of 8 -> 32)
        assert out["pred_masks"].shape[1] == Q
        assert out["presence_logits"].shape == (1, 1)
        assert np.isfinite(np.asarray(out["pred_logits"])).all()
        assert np.isfinite(np.asarray(out["pred_masks"])).all()

    def test_text_cache_path_identical(self, model):
        ids, am = _text()
        emb = model.get_input_embeddings(model.params, ids, am)
        a = model.detect(model.params, _px(), ids, am)
        b = model.detect(model.params, _px(), attention_mask=am,
                         inputs_embeds=emb)
        np.testing.assert_allclose(np.asarray(a["pred_logits"]),
                                   np.asarray(b["pred_logits"]),
                                   rtol=1e-4, atol=1e-5)

    def test_box_prompts_change_output(self, model):
        ids, am = _text()
        boxes = jnp.asarray([[[0.5, 0.5, 0.4, 0.4]]], jnp.float32)
        a = model.detect(model.params, _px(), ids, am)
        b = model.detect(model.params, _px(), ids, am, boxes=boxes)
        assert np.abs(np.asarray(a["pred_logits"])
                      - np.asarray(b["pred_logits"])).max() > 1e-6

    def test_roi_align_matches_reference(self):
        """Vectorized ROI align vs direct numpy bilinear mean-pooling on
        an exactly-aligned box."""
        from mlx_vlm_tpu.models.sam3.detector import roi_align

        rng = np.random.default_rng(0)
        feat = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
        # box covering pixels [1, 6) x [1, 6), roi 5 -> one bin per pixel
        boxes = np.asarray([[[1.0, 1.0, 6.0, 6.0]]], np.float32)
        out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes), 5))
        # bin centers land at half-integer coords: average of 2x2 samples
        # around pixel centers; with sampling_ratio=2 the samples sit at
        # +-0.25 of the bin center — compare against direct computation
        ys = np.linspace(1.25, 5.75, 10)
        vals = np.zeros((5, 5, 2), np.float32)
        for bi in range(5):
            for bj in range(5):
                acc = np.zeros(2, np.float32)
                for sy in (1.0 + bi + 0.25, 1.0 + bi + 0.75):
                    for sx in (1.0 + bj + 0.25, 1.0 + bj + 0.75):
                        y0, x0 = int(np.floor(sy)), int(np.floor(sx))
                        dy, dx = sy - y0, sx - x0
                        acc += ((1 - dy) * (1 - dx) * feat[0, y0, x0]
                                + (1 - dy) * dx * feat[0, y0, x0 + 1]
                                + dy * (1 - dx) * feat[0, y0 + 1, x0]
                                + dy * dx * feat[0, y0 + 1, x0 + 1])
                vals[bi, bj] = acc / 4
        np.testing.assert_allclose(out[0, 0], vals, rtol=1e-4, atol=1e-5)


class TestSam3Tracker:
    def test_track_step_and_memory(self, model):
        feats = model.backbone_features(model.params, _px(2))
        init = model.track_init(
            model.params, feats,
            jnp.asarray(np.random.default_rng(3).standard_normal(
                (1, 1, IMG, IMG)).astype(np.float32)))
        assert init["memory"].shape[-1] == 4
        out = model.track_step(model.params, feats,
                               memory_bank=[init["memory"]],
                               multimask_output=True)
        assert out["pred_masks"].shape[1] == 3      # multimask
        assert out["iou_scores"].shape == (1, 3)
        assert out["obj_scores"].shape == (1, 1)
        assert out["memory"].shape == init["memory"].shape
        assert np.isfinite(np.asarray(out["pred_masks"])).all()

    def test_point_prompts(self, model):
        feats = model.backbone_features(model.params, _px(4))
        pts = (jnp.asarray([[[4.0, 4.0]]], jnp.float32),
               jnp.asarray([[1]], jnp.int32))
        out = model.track_step(model.params, feats, prompt_points=pts,
                               multimask_output=False)
        assert out["pred_masks"].shape[1] == 1


class TestSam3Predictor:
    def test_predict_end_to_end(self, model, monkeypatch):
        from PIL import Image

        from mlx_vlm_tpu.models.sam3 import Sam3Predictor, Sam3Processor

        class FakeTok:
            def __call__(self, text, **kw):
                n = len(text)
                return {"input_ids": np.ones((n, 6), np.int64),
                        "attention_mask": np.ones((n, 6), np.int64)}

        proc = Sam3Processor(image_size=IMG, tokenizer=FakeTok())
        pred = Sam3Predictor(model, proc, score_threshold=0.0)
        img = Image.fromarray((np.random.default_rng(5).random(
            (24, 40, 3)) * 255).astype(np.uint8))
        res = pred.predict(img, "a cat")
        assert res.boxes.shape[1] == 4
        assert res.masks.shape[1:] == (24, 40)
        assert (res.boxes[:, [0, 2]] <= 40).all()
        # text cache: second call hits the cache (same object)
        assert "a cat" in pred._text_cache

    def test_track_video_assigns_ids(self, model):
        from PIL import Image

        from mlx_vlm_tpu.models.sam3 import Sam3Processor, track_video

        class FakeTok:
            def __call__(self, text, **kw):
                n = len(text)
                return {"input_ids": np.ones((n, 6), np.int64),
                        "attention_mask": np.ones((n, 6), np.int64)}

        proc = Sam3Processor(image_size=IMG, tokenizer=FakeTok())
        rng = np.random.default_rng(6)
        frames = [Image.fromarray((rng.random((24, 24, 3)) * 255
                                   ).astype(np.uint8)) for _ in range(2)]
        results = track_video(model, proc, frames, "thing",
                              score_threshold=0.0)
        assert len(results) == 2
        for r in results:
            if len(r.scores):
                assert r.track_ids is not None
                assert (r.track_ids >= 0).all()
