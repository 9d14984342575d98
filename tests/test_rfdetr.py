"""RF-DETR detection family: windowed DINOv2 backbone, C2f projector,
two-stage deformable decoder, postprocessing.

Reference parity: mlx_vlm/models/rfdetr.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.utils.loader import load_model_from_weights


def _tiny_cfg(segmentation=False):
    return {
        "model_type": "rf-detr",
        "resolution": 32,
        "hidden_dim": 16,
        "num_classes": 5,
        "num_queries": 8,
        "dec_layers": 2,
        "sa_nheads": 2,
        "ca_nheads": 4,
        "dec_n_points": 2,
        "group_detr": 2,
        "num_windows": 2,
        "patch_size": 4,
        "out_feature_indexes": [1, 3],
        "segmentation": segmentation,
        "seg_num_blocks": 2,
        "backbone_config": {
            "hidden_size": 32,
            "num_hidden_layers": 4,
            "num_attention_heads": 2,
            "intermediate_size": 64,
            "patch_size": 4,
            "image_size": 16,   # stored pos grid 4x4 -> interpolated to 8x8
            "out_feature_indexes": [1, 3],
            "window_block_indexes": [0, 2],
        },
        "transformer_config": {
            "hidden_dim": 16,
            "dec_layers": 2,
            "sa_nheads": 2,
            "ca_nheads": 4,
            "dim_feedforward": 32,
            "dec_n_points": 2,
            "num_queries": 8,
            "group_detr": 2,
            "num_classes": 6,
        },
    }


def _hf_weights(cfg, seed=0, segmentation=False):
    rng = np.random.default_rng(seed)
    w = {}

    def lin(p, i, o, bias=True):
        w[f"{p}.weight"] = rng.standard_normal((o, i)).astype(np.float32) * 0.1
        if bias:
            w[f"{p}.bias"] = np.zeros(o, np.float32)

    def ln(p, c):
        w[f"{p}.weight"] = np.ones(c, np.float32)
        w[f"{p}.bias"] = np.zeros(c, np.float32)

    def conv(p, i, o, k, bias=False, groups=1):
        w[f"{p}.weight"] = rng.standard_normal(
            (o, i // groups, k, k)).astype(np.float32) * 0.1
        if bias:
            w[f"{p}.bias"] = np.zeros(o, np.float32)

    bc = cfg["backbone_config"]
    D = bc["hidden_size"]
    emb = "backbone.0.encoder.encoder.embeddings"
    w[f"{emb}.cls_token"] = np.zeros((1, 1, D), np.float32)
    g = bc["image_size"] // bc["patch_size"]
    w[f"{emb}.position_embeddings"] = rng.standard_normal(
        (1, 1 + g * g, D)).astype(np.float32) * 0.02
    conv(f"{emb}.patch_embeddings.projection", 3, D, bc["patch_size"],
         bias=True)
    w["backbone.0.encoder.encoder.embeddings.mask_token"] = np.zeros(
        (1, D), np.float32)  # must be dropped by sanitize
    for i in range(bc["num_hidden_layers"]):
        p = f"backbone.0.encoder.encoder.encoder.layer.{i}"
        ln(f"{p}.norm1", D)
        ln(f"{p}.norm2", D)
        lin(f"{p}.attention.attention.query", D, D)
        lin(f"{p}.attention.attention.key", D, D)
        lin(f"{p}.attention.attention.value", D, D)
        lin(f"{p}.attention.output.dense", D, D)
        w[f"{p}.layer_scale1.lambda1"] = np.ones(D, np.float32)
        w[f"{p}.layer_scale2.lambda1"] = np.ones(D, np.float32)
        lin(f"{p}.mlp.fc1", D, bc["intermediate_size"])
        lin(f"{p}.mlp.fc2", bc["intermediate_size"], D)
    ln("backbone.0.encoder.encoder.layernorm", D)

    d = cfg["hidden_dim"]
    half = d // 2
    in_c = D * len(bc["out_feature_indexes"])
    nb = 2
    pj = "backbone.0.projector.stages.0.0"
    conv(f"{pj}.cv1.conv", in_c, d, 1)
    ln(f"{pj}.cv1.bn", d)
    for j in range(nb):
        conv(f"{pj}.m.{j}.cv1.conv", half, half, 3)
        ln(f"{pj}.m.{j}.cv1.bn", half)
        conv(f"{pj}.m.{j}.cv2.conv", half, half, 3)
        ln(f"{pj}.m.{j}.cv2.bn", half)
    conv(f"{pj}.cv2.conv", d + half * nb, d, 1)
    ln(f"{pj}.cv2.bn", d)
    ln("backbone.0.projector.stages.0.1", d)

    tc = cfg["transformer_config"]
    for gi in range(tc["group_detr"]):
        lin(f"transformer.enc_output.{gi}", d, d)
        ln(f"transformer.enc_output_norm.{gi}", d)
        lin(f"transformer.enc_out_class_embed.{gi}", d, tc["num_classes"])
        for i, (di, do) in enumerate([(d, d), (d, d), (d, 4)]):
            lin(f"transformer.enc_out_bbox_embed.{gi}.layers.{i}", di, do)
    for i in range(tc["dec_layers"]):
        p = f"transformer.decoder.layers.{i}"
        # fused qkv on disk — sanitize must split it
        w[f"{p}.self_attn.in_proj_weight"] = rng.standard_normal(
            (3 * d, d)).astype(np.float32) * 0.1
        w[f"{p}.self_attn.in_proj_bias"] = np.zeros(3 * d, np.float32)
        lin(f"{p}.self_attn.out_proj", d, d)
        ln(f"{p}.norm1", d)
        nP = tc["dec_n_points"]
        nH = tc["ca_nheads"]
        lin(f"{p}.cross_attn.sampling_offsets", d, nH * nP * 2)
        lin(f"{p}.cross_attn.attention_weights", d, nH * nP)
        lin(f"{p}.cross_attn.value_proj", d, d)
        lin(f"{p}.cross_attn.output_proj", d, d)
        ln(f"{p}.norm2", d)
        lin(f"{p}.linear1", d, tc["dim_feedforward"])
        lin(f"{p}.linear2", tc["dim_feedforward"], d)
        ln(f"{p}.norm3", d)
    ln("transformer.decoder.norm", d)
    for i, (di, do) in enumerate([(2 * d, d), (d, d)]):
        lin(f"transformer.decoder.ref_point_head.layers.{i}", di, do)

    lin("class_embed", d, tc["num_classes"])
    for i, (di, do) in enumerate([(d, d), (d, d), (d, 4)]):
        lin(f"bbox_embed.layers.{i}", di, do)
    tq = tc["num_queries"] * tc["group_detr"]
    w["query_feat.weight"] = rng.standard_normal(
        (tq, d)).astype(np.float32) * 0.1
    w["refpoint_embed.weight"] = rng.standard_normal(
        (tq, 4)).astype(np.float32) * 0.1

    if segmentation:
        for b in range(cfg["seg_num_blocks"]):
            p = f"segmentation_head.blocks.{b}"
            conv(f"{p}.dwconv", d, d, 3, bias=True, groups=d)
            ln(f"{p}.norm", d)
            lin(f"{p}.pwconv1", d, d)
        conv("segmentation_head.spatial_features_proj", d, d, 1, bias=True)
        ln("segmentation_head.query_features_block.norm_in", d)
        lin("segmentation_head.query_features_block.layers.0", d, 4 * d)
        lin("segmentation_head.query_features_block.layers.2", 4 * d, d)
        lin("segmentation_head.query_features_proj", d, d)
        w["segmentation_head.bias"] = np.zeros(1, np.float32)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = _tiny_cfg()
    return load_model_from_weights(cfg, _hf_weights(cfg), jnp.float32)


class TestRFDETR:
    def test_forward_shapes(self, model):
        px = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
            jnp.float32)
        out = jax.jit(lambda p, x: model(p, x))(model.params, px)
        assert out["pred_logits"].shape == (2, 8, 6)
        assert out["pred_boxes"].shape == (2, 8, 4)
        assert np.isfinite(np.asarray(out["pred_logits"])).all()
        assert np.isfinite(np.asarray(out["pred_boxes"])).all()

    def test_windowed_vs_input_sensitivity(self, model):
        """Different inputs give different detections (weights are live
        through the windowed attention path)."""
        rng = np.random.default_rng(1)
        a = model(model.params, jnp.asarray(
            rng.standard_normal((1, 32, 32, 3)), jnp.float32))
        b = model(model.params, jnp.asarray(
            rng.standard_normal((1, 32, 32, 3)), jnp.float32))
        assert np.abs(np.asarray(a["pred_logits"])
                      - np.asarray(b["pred_logits"])).max() > 1e-6

    def test_predictor_postprocess(self, model):
        from PIL import Image

        from mlx_vlm_tpu.models.rfdetr import (
            RFDETRPredictor,
            RFDETRProcessor,
        )

        img = Image.fromarray((np.random.default_rng(2).random(
            (40, 64, 3)) * 255).astype(np.uint8))
        pred = RFDETRPredictor(
            model, RFDETRProcessor(resolution=32), score_threshold=0.0,
            class_names=[f"k{i}" for i in range(6)])
        res = pred.predict(img)
        assert res.boxes.shape[1] == 4
        assert (res.boxes[:, [0, 2]] <= 64).all()
        assert (res.boxes[:, [1, 3]] <= 40).all()
        assert all(n.startswith("k") for n in res.class_names)

    def test_segmentation_head(self):
        cfg = _tiny_cfg(segmentation=True)
        m = load_model_from_weights(
            cfg, _hf_weights(cfg, seed=3, segmentation=True), jnp.float32)
        px = jnp.asarray(
            np.random.default_rng(4).standard_normal((1, 32, 32, 3)),
            jnp.float32)
        out = m(m.params, px)
        assert "pred_masks" in out
        assert out["pred_masks"].shape == (1, 8, 8, 8)  # 32/4 downsample

    def test_nms(self):
        from mlx_vlm_tpu.models.rfdetr.processing import _nms_per_class

        boxes = np.asarray([[0, 0, 10, 10], [1, 1, 10, 10], [20, 20, 30, 30]],
                           np.float32)
        scores = np.asarray([0.9, 0.8, 0.7], np.float32)
        classes = np.asarray([0, 0, 0], np.int64)
        keep = _nms_per_class(boxes, scores, classes, 0.5)
        assert list(keep) == [0, 2]
