"""Drafter registry.

Role parity: reference mlx_vlm/speculative/drafters/__init__.py:11-163 —
model_type -> drafter kind mapping, load_drafter, compatibility validation.
"""

from __future__ import annotations

from .eagle3 import Eagle3Drafter

DRAFTER_KINDS = {
    "vanilla": "independent small LM (token-level drafting)",
    "eagle3": "one-layer speculator over captured target hidden states",
}


def resolve_drafter_kind(model_type: str) -> str:
    """Reference kind map (drafters/__init__.py:11)."""
    if "eagle" in model_type:
        return "eagle3"
    return "vanilla"


__all__ = ["Eagle3Drafter", "DRAFTER_KINDS", "resolve_drafter_kind"]
