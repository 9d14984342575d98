"""OpenAI-compatible image endpoints: /v1/images/generations + /v1/images/edits.

Role parity: reference mlx_vlm/server/openai.py:519 (images_generations_endpoint)
and :646 (images_edits_endpoint) — size/width/height resolution, per-index
seeds for n>1, b64_json or path response formats, output_path/output_dir.

TPU design: one pipeline instance serves all requests behind a lock (the
denoise step is a single jitted program; batching requests would change the
compiled shape, so requests serialize — same policy as the reference's
generation_lock).
"""

from __future__ import annotations

import base64
import random
import threading
import time
from io import BytesIO
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

__all__ = ["ImageService", "generations_endpoint", "edits_endpoint"]


def parse_size(size: str) -> Tuple[int, int]:
    """'512x512' -> (512, 512) (reference common.py parse_size)."""
    try:
        w, _, h = size.lower().partition("x")
        return int(w), int(h)
    except Exception as e:  # noqa: BLE001
        raise ValueError(f"invalid size {size!r}; expected WIDTHxHEIGHT") from e


def _png_bytes(arr: np.ndarray) -> bytes:
    from PIL import Image

    buf = BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


class ImageService:
    """Holds the Flux2 pipeline + its serialization lock for the server."""

    def __init__(self, pipeline, model_name: str = "flux2"):
        self.pipeline = pipeline
        self.model_name = model_name
        self.lock = threading.Lock()

    @classmethod
    def from_path(cls, model_path: str, **kwargs) -> "ImageService":
        from ..imagegen import Flux2Pipeline

        return cls(Flux2Pipeline.from_pretrained(model_path, **kwargs),
                   model_name=model_path)


def _resolve_size(body: dict, *, default: Optional[str] = "512x512"):
    w, h = body.get("width"), body.get("height")
    if w is not None or h is not None:
        if w is None or h is None:
            raise ValueError(
                "Both width and height are required when either is set.")
        return int(w), int(h)
    size = body.get("size") or default
    if size is None:
        return None, None
    return parse_size(size)


def _output_path(body: dict, *, prefix: str, index: int, count: int,
                 seed: int) -> Optional[Path]:
    if body.get("output_path"):
        p = Path(body["output_path"]).expanduser()
        if p.suffix.lower() != ".png":
            p = p.with_suffix(".png")
        if count > 1:
            p = p.with_name(f"{p.stem}-{index + 1:02d}{p.suffix}")
        return p
    if body.get("output_dir"):
        return Path(body["output_dir"]).expanduser() / f"{prefix}-{seed}.png"
    if body.get("response_format") == "path":
        return Path("outputs") / f"{prefix}-{seed}.png"
    return None


def _load_ref_image(ref) -> np.ndarray:
    """Path / URL-less data URI / raw base64 -> HWC uint8 RGB."""
    from PIL import Image

    if isinstance(ref, str) and ref.startswith("data:"):
        _, _, payload = ref.partition(",")
        return np.asarray(
            Image.open(BytesIO(base64.b64decode(payload))).convert("RGB"))
    p = Path(str(ref)).expanduser()
    if not p.exists():
        raise ValueError(f"reference image does not exist: {ref}")
    return np.asarray(Image.open(p).convert("RGB"))


def _run(handler, body: dict, service: ImageService, *, edit: bool):
    if not body.get("prompt"):
        raise ValueError("Missing prompt.")
    n = int(body.get("n", 1))
    steps = int(body.get("steps", 4))
    guidance = float(body.get("guidance", 1.0))
    base_seed = (int(body["seed"]) if body.get("seed") is not None
                 else random.randrange(2 ** 32))
    prefix = "edit" if edit else "image"
    if edit:
        width, height = _resolve_size(body, default=None)
        refs = body.get("image")
        if not refs:
            raise ValueError("Missing image (reference image path(s)).")
        refs = [refs] if isinstance(refs, str) else list(refs)
        images = [_load_ref_image(r) for r in refs]
    else:
        width, height = _resolve_size(body)

    created = int(time.time())
    data = []
    with service.lock:
        for index in range(n):
            seed = base_seed + index
            kwargs = dict(prompt=body["prompt"], seed=seed, steps=steps,
                          guidance=guidance,
                          max_sequence_length=body.get("max_sequence_length"))
            if edit:
                arr = service.pipeline.edit(images=images, width=width,
                                            height=height, **kwargs)
            else:
                arr = service.pipeline.generate(width=width, height=height,
                                                **kwargs)
            item = {"width": int(arr.shape[1]), "height": int(arr.shape[0]),
                    "seed": seed}
            out = _output_path(body, prefix=prefix, index=index, count=n,
                               seed=seed)
            if out is not None:
                out.parent.mkdir(parents=True, exist_ok=True)
                out.write_bytes(_png_bytes(arr))
                item["path"] = str(out)
            if body.get("response_format", "b64_json") == "b64_json":
                item["b64_json"] = base64.b64encode(
                    _png_bytes(arr)).decode("ascii")
            data.append(item)

    h, w = data[0]["height"], data[0]["width"]
    handler.send_json({
        "created": created,
        "data": data,
        "output_format": "png",
        "size": f"{w}x{h}",
    })


def generations_endpoint(handler, body: dict, service: ImageService):
    _run(handler, body, service, edit=False)


def edits_endpoint(handler, body: dict, service: ImageService):
    _run(handler, body, service, edit=True)
