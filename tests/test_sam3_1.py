"""sam3_1: SAM 3 detection pipeline with the TriViT 3-scale neck."""

import numpy as np
import pytest

import jax.numpy as jnp

from mlx_vlm_tpu.utils.loader import load_model_from_weights

from test_sam3 import _text, _tiny_cfg, _weights, IMG


def _sam31_cfg():
    cfg = _tiny_cfg()
    cfg = dict(cfg, model_type="sam3_1")
    det = dict(cfg["detector_config"])
    det["vision_config"] = dict(det["vision_config"],
                                scale_factors=[4.0, 2.0, 1.0])
    cfg["detector_config"] = det
    return cfg


def _sam31_weights(cfg, seed=0):
    # build with the sam3 generator (4 fpn levels), then re-key the first
    # three onto the SAM 3.1 checkpoint names (neck.convs.*) and drop the
    # 0.5x level that 3.1 doesn't have
    base = dict(cfg)
    det = dict(base["detector_config"])
    det["vision_config"] = dict(det["vision_config"],
                                scale_factors=[4.0, 2.0, 1.0, 0.5])
    base["detector_config"] = det
    w = _weights(base, seed)
    out = {}
    for k, v in w.items():
        if ".vision_encoder.neck.fpn_layers." in k:
            idx = int(k.split(".fpn_layers.")[1].split(".")[0])
            if idx == 3:
                continue  # no 0.5x level in SAM 3.1
            k = k.replace(".neck.fpn_layers.", ".neck.convs.")
        out[k] = v
    return out


@pytest.fixture(scope="module")
def model():
    cfg = _sam31_cfg()
    return load_model_from_weights(cfg, _sam31_weights(cfg), jnp.float32)


def _px(seed=0, B=1):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(
        (B, IMG, IMG, 3)).astype(np.float32))


def test_detect_three_scale_neck(model):
    assert model.trim_coarsest is False
    ids, am = _text()
    out = model.detect(model.params, _px(), ids, am)
    Q = 6
    assert out["pred_logits"].shape == (1, Q)
    assert out["pred_boxes"].shape == (1, Q, 4)
    assert out["pred_masks"].shape[1] == Q
    assert np.isfinite(np.asarray(out["pred_logits"])).all()
    assert np.isfinite(np.asarray(out["pred_masks"])).all()


def test_detection_pipeline_routes_sam3_1(model):
    from mlx_vlm_tpu.generate.detection import is_detection_model

    assert is_detection_model(model)
