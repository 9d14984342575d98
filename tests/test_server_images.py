"""/v1/images/generations + /v1/images/edits endpoint tests.

Mirrors the reference server contract (reference mlx_vlm/server/openai.py:519
images_generations_endpoint, :646 images_edits_endpoint): size vs
width/height resolution, per-index seeds for n>1, b64_json vs path response
formats, output_path/output_dir handling, and error paths.

The pipeline under the service is a stub recording call kwargs — the real
denoise/VAE path is covered by tests/test_imagegen.py; here we test the HTTP
surface the endpoints own.
"""

import base64
import io
import json
import socket
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class StubPipeline:
    """Deterministic fake: pixel value = seed % 251, records kwargs."""

    def __init__(self):
        self.calls = []

    def generate(self, prompt=None, *, seed, steps, guidance, width, height,
                 max_sequence_length=None, **kw):
        self.calls.append(("generate", dict(prompt=prompt, seed=seed,
                                            steps=steps, guidance=guidance,
                                            width=width, height=height)))
        return np.full((height, width, 3), seed % 251, np.uint8)

    def edit(self, prompt=None, images=(), *, seed, steps, guidance,
             width=None, height=None, max_sequence_length=None, **kw):
        self.calls.append(("edit", dict(prompt=prompt, n_images=len(images),
                                        seed=seed, width=width,
                                        height=height)))
        h = height or images[0].shape[0]
        w = width or images[0].shape[1]
        return np.full((h, w, 3), seed % 251, np.uint8)


@pytest.fixture(scope="module")
def img_server(tmp_path_factory):
    from mlx_vlm_tpu.server.app import create_server
    from mlx_vlm_tpu.server.images import ImageService
    from mlx_vlm_tpu.utils.loader import load
    from mlx_vlm_tpu.utils.testing import build_tiny_checkpoint

    d = tmp_path_factory.mktemp("ckpt")
    build_tiny_checkpoint(str(d))
    model, processor = load(str(d), dtype=jnp.float32)
    stub = StubPipeline()
    port = _free_port()
    httpd = create_server(
        model, processor, model_name="tiny-qwen2-vl",
        host="127.0.0.1", port=port, num_slots=2, capacity=256,
        block_size=2, token_queue_timeout=120.0,
        image_service=ImageService(stub, model_name="stub-flux2"),
    )
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{port}", stub
    httpd.shutdown()
    httpd.state.generator.shutdown()


def _post(url, path, body, timeout=60):
    req = urllib.request.Request(
        url + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _decode_png_b64(b64):
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(base64.b64decode(b64))))


def _png_b64(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


class TestGenerations:
    def test_b64_roundtrip(self, img_server):
        url, stub = img_server
        status, body = _post(url, "/v1/images/generations",
                             {"prompt": "a cat", "size": "64x32",
                              "seed": 7, "steps": 2})
        assert status == 200
        assert body["size"] == "64x32"
        assert body["output_format"] == "png"
        (item,) = body["data"]
        assert item["seed"] == 7
        arr = _decode_png_b64(item["b64_json"])
        assert arr.shape == (32, 64, 3)
        assert arr[0, 0, 0] == 7
        kind, kwargs = stub.calls[-1]
        assert kind == "generate" and kwargs["steps"] == 2
        assert (kwargs["width"], kwargs["height"]) == (64, 32)

    def test_n_images_seed_increment(self, img_server):
        url, _ = img_server
        _, body = _post(url, "/v1/images/generations",
                        {"prompt": "x", "n": 3, "seed": 100,
                         "size": "32x32"})
        assert [d["seed"] for d in body["data"]] == [100, 101, 102]

    def test_width_height_override(self, img_server):
        url, stub = img_server
        _, body = _post(url, "/v1/images/generations",
                        {"prompt": "x", "width": 48, "height": 16,
                         "seed": 1})
        assert body["size"] == "48x16"
        _, kwargs = stub.calls[-1]
        assert (kwargs["width"], kwargs["height"]) == (48, 16)

    def test_path_format(self, img_server, tmp_path):
        url, _ = img_server
        _, body = _post(url, "/v1/images/generations",
                        {"prompt": "x", "seed": 5, "response_format": "path",
                         "output_dir": str(tmp_path), "size": "32x32"})
        (item,) = body["data"]
        assert "b64_json" not in item
        p = item["path"]
        assert p.startswith(str(tmp_path)) and p.endswith("image-5.png")
        from PIL import Image

        assert np.asarray(Image.open(p)).shape == (32, 32, 3)

    def test_output_path_multi_suffix(self, img_server, tmp_path):
        url, _ = img_server
        out = tmp_path / "pic.png"
        _, body = _post(url, "/v1/images/generations",
                        {"prompt": "x", "n": 2, "seed": 0,
                         "output_path": str(out), "size": "32x32",
                         "response_format": "path"})
        paths = [d["path"] for d in body["data"]]
        assert paths == [str(tmp_path / "pic-01.png"),
                         str(tmp_path / "pic-02.png")]

    def test_missing_prompt_400(self, img_server):
        url, _ = img_server
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(url, "/v1/images/generations", {"size": "32x32"})
        assert ei.value.code == 400

    def test_half_size_400(self, img_server):
        url, _ = img_server
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(url, "/v1/images/generations",
                  {"prompt": "x", "width": 64})
        assert ei.value.code == 400


class TestEdits:
    def test_edit_with_data_uri(self, img_server):
        url, stub = img_server
        ref = np.zeros((16, 24, 3), np.uint8)
        _, body = _post(url, "/v1/images/edits",
                        {"prompt": "bluer",
                         "image": "data:image/png;base64," + _png_b64(ref),
                         "seed": 9})
        (item,) = body["data"]
        assert item["seed"] == 9
        # stub keeps the reference dims when no size given
        assert (item["height"], item["width"]) == (16, 24)
        kind, kwargs = stub.calls[-1]
        assert kind == "edit" and kwargs["n_images"] == 1
        assert kwargs["width"] is None and kwargs["height"] is None

    def test_edit_file_path_and_size(self, img_server, tmp_path):
        from PIL import Image

        url, stub = img_server
        ref = tmp_path / "ref.png"
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(ref)
        _, body = _post(url, "/v1/images/edits",
                        {"prompt": "x", "image": [str(ref)],
                         "size": "32x16", "seed": 1})
        assert body["size"] == "32x16"

    def test_edit_missing_image_400(self, img_server):
        url, _ = img_server
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(url, "/v1/images/edits", {"prompt": "x"})
        assert ei.value.code == 400


def test_no_image_service_400(tmp_path_factory):
    from mlx_vlm_tpu.server.app import create_server
    from mlx_vlm_tpu.utils.loader import load
    from mlx_vlm_tpu.utils.testing import build_tiny_checkpoint

    d = tmp_path_factory.mktemp("ckpt2")
    build_tiny_checkpoint(str(d))
    model, processor = load(str(d), dtype=jnp.float32)
    port = _free_port()
    httpd = create_server(model, processor, model_name="t",
                          host="127.0.0.1", port=port, num_slots=1,
                          capacity=128, block_size=2)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"http://127.0.0.1:{port}", "/v1/images/generations",
                  {"prompt": "x"})
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
        httpd.state.generator.shutdown()
