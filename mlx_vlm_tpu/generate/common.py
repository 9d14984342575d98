"""Shared generation types & helpers.

Role parity: reference `mlx_vlm/generate/common.py` — GenerationResult:152,
PromptCacheState:178, wired_limit/generation_stream (Metal-specific; on TPU
the XLA async dispatch stream plays that role).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def device_peak_memory_gb() -> float:
    try:
        stats = jax.local_devices()[0].memory_stats()
        peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use") or 0
        return peak / (1024**3)
    except Exception:
        return 0.0


@dataclasses.dataclass
class GenerationResult:
    """Per-chunk streaming result (reference common.py:152)."""

    text: str
    token: Optional[int]
    logprobs: Any
    prompt_tokens: int
    generation_tokens: int
    prompt_tps: float
    generation_tps: float
    peak_memory: float
    finish_reason: Optional[str] = None
    total_tokens: int = 0

    def __post_init__(self):
        self.total_tokens = self.prompt_tokens + self.generation_tokens


@dataclasses.dataclass
class PromptCacheState:
    """Cross-turn in-process KV reuse (reference common.py:178)."""

    cache: Any = None
    tokens: Optional[List[int]] = None
    rope_deltas: Any = None
    model_key: Optional[str] = None
