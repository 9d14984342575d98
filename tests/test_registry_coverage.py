"""Registry dead-end guards (round-2 verdict: llava-qwen2 remap pointed at
a module that didn't exist).

Every MODEL_REMAPPING value must import; every _FAMILY_FORMATS key must
resolve to a loadable module, a remap, or be explicitly listed as
template-only (a family whose prompt format we support ahead of its
model port)."""

import importlib

import pytest

from mlx_vlm_tpu.utils.loader import MODEL_REMAPPING

# prompt-format entries shipped ahead of their model modules; adding a
# family here is an explicit statement that only templating is supported
TEMPLATE_ONLY = {
    "cohere2_vision",
}


def _resolves(model_type: str) -> bool:
    name = MODEL_REMAPPING.get(model_type, model_type)
    try:
        importlib.import_module(f"mlx_vlm_tpu.models.{name}")
        return True
    except ImportError:
        return False


def test_every_remap_target_imports():
    missing = {
        k: v for k, v in MODEL_REMAPPING.items()
        if not _resolves(k)
    }
    assert not missing, f"remap targets without modules: {missing}"


def test_family_formats_resolve_or_are_declared():
    from mlx_vlm_tpu.prompt_utils import _FAMILY_FORMATS

    unresolved = sorted(
        k for k in _FAMILY_FORMATS
        if not _resolves(k) and k not in TEMPLATE_ONLY
    )
    assert not unresolved, (
        f"template families with no module/remap and not declared "
        f"template-only: {unresolved}"
    )


def test_template_only_list_is_fresh():
    """Entries that now resolve should be removed from TEMPLATE_ONLY."""
    stale = sorted(k for k in TEMPLATE_ONLY if _resolves(k))
    assert not stale, f"now-implemented families still marked: {stale}"
