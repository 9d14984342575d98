"""Shared eval inference helper.

Role parity: reference mlx_vlm/evals/utils.py (`inference` used by the
MMMU / MathVista / OCRBench / MMStar harnesses).
"""

from __future__ import annotations

import re
from typing import Any, List, Optional


def inference(
    model,
    processor,
    prompt: str,
    images: Optional[List[Any]] = None,
    max_tokens: int = 512,
    temperature: float = 0.0,
    **kwargs,
) -> str:
    from ..generate.dispatch import generate
    from ..prompt_utils import apply_chat_template

    templated = apply_chat_template(
        processor, getattr(model, "config_dict", {}), prompt,
        num_images=len(images or []),
    )
    res = generate(
        model, processor, templated, image=images,
        max_tokens=max_tokens, temperature=temperature, **kwargs,
    )
    return res.text


def extract_mc_answer(text: str, choices: str = "ABCD") -> Optional[str]:
    """Pull a multiple-choice letter out of a free-form answer."""
    text = text.strip()
    m = re.search(rf"\b([{choices}])\b", text)
    if m:
        return m.group(1)
    for c in choices:
        if text.upper().startswith(c):
            return c
    return None


def score_exact(prediction: str, answer: str) -> bool:
    return prediction.strip().lower() == answer.strip().lower()


def score_contains(prediction: str, answer: str) -> bool:
    return answer.strip().lower() in prediction.strip().lower()
