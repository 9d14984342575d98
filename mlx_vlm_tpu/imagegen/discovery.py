"""Image-generation model discovery & loading.

Role parity: reference mlx_vlm/generate/image.py:320-380 — protocol-based
discovery: a diffusers-style `model_index.json` (its `_class_name` or the
per-component class map) or the model id/path name selects the pipeline
class; `load_image_generation_model` instantiates it.

Registry entries map both class names and id substrings to loader
callables so local checkpoints work without network access.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, Optional


def _load_flux2(path, **kw):
    from .pipeline import Flux2Pipeline

    return Flux2Pipeline.from_pretrained(path, **kw)


def _load_bonsai(path, **kw):
    from ..models.bonsai import BonsaiPipeline

    return BonsaiPipeline.from_pretrained(path, **kw)


def _load_mage_flow(path, **kw):
    from ..models.mage_flow import MageFlowPipeline

    return MageFlowPipeline.from_pretrained(path, **kw)


def _load_ideogram4(path, **kw):
    from ..models.ideogram4 import Ideogram4Pipeline

    return Ideogram4Pipeline.from_pretrained(path, **kw)


# class-name (model_index.json `_class_name`) -> loader
_CLASS_REGISTRY: Dict[str, Callable[..., Any]] = {
    "Flux2Pipeline": _load_flux2,
    "Flux2KleinPipeline": _load_flux2,
    "FluxPipeline": _load_flux2,
    "BonsaiPipeline": _load_bonsai,
    "BonsaiImage": _load_bonsai,
    "MageFlowPipeline": _load_mage_flow,
    "Ideogram4Pipeline": _load_ideogram4,
}

# model-id / path substring -> loader (reference _model_type_from_id)
_ID_REGISTRY = (
    ("bonsai", _load_bonsai),
    ("mage-flow", _load_mage_flow),
    ("mage_flow", _load_mage_flow),
    ("ideogram", _load_ideogram4),
    ("flux", _load_flux2),
    ("klein", _load_flux2),
)


def model_index_class(model_path) -> Optional[str]:
    """`_class_name` from model_index.json, if present."""
    p = Path(model_path).expanduser() / "model_index.json"
    if not p.exists():
        return None
    try:
        with open(p) as f:
            return json.load(f).get("_class_name")
    except (OSError, json.JSONDecodeError):
        return None


def image_model_loader(model: str) -> Optional[Callable[..., Any]]:
    cls = model_index_class(model)
    if cls and cls in _CLASS_REGISTRY:
        return _CLASS_REGISTRY[cls]
    low = str(model).lower()
    for tag, loader in _ID_REGISTRY:
        if tag in low:
            return loader
    # a local checkpoint in flux2 layout counts even without an index
    root = Path(model).expanduser()
    if (root / "transformer").exists() and (root / "vae").exists():
        return _load_flux2
    return None


def is_image_generation_model(model: Optional[str]) -> bool:
    """Reference generate/image.py is_image_generation_model."""
    return model is not None and image_model_loader(model) is not None


def load_image_generation_model(model: Optional[str], **kwargs):
    """Reference generate/image.py:333 load_image_generation_model."""
    if model is None:
        raise ValueError("Image generation model must be specified")
    loader = image_model_loader(model)
    if loader is None:
        raise ValueError(
            f"{model!r} is not a recognized image-generation checkpoint "
            "(no model_index.json class, id alias, or flux2 layout)")
    return loader(model, **kwargs)


__all__ = ["is_image_generation_model", "load_image_generation_model",
           "image_model_loader", "model_index_class"]
