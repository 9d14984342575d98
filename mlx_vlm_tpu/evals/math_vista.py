"""MathVista harness — reference mlx_vlm/evals/math_vista.py."""

from __future__ import annotations

import argparse
import json
import re
from typing import Optional

from .utils import extract_mc_answer, inference


def _extract_numeric(text: str) -> Optional[str]:
    m = re.findall(r"-?\d+\.?\d*", text.replace(",", ""))
    return m[-1] if m else None


def evaluate_example(model, processor, ex) -> dict:
    q = ex["question"]
    if ex.get("choices"):
        q += "\nChoices: " + ", ".join(
            f"({chr(65+i)}) {c}" for i, c in enumerate(ex["choices"])
        ) + "\nAnswer with the option's letter directly."
    pred_text = inference(model, processor, q, [ex["decoded_image"]], max_tokens=64)
    if ex.get("choices"):
        letter = extract_mc_answer(pred_text, "ABCDEFGH"[: len(ex["choices"])])
        pred = ex["choices"][ord(letter) - 65] if letter else pred_text
    else:
        pred = _extract_numeric(pred_text) or pred_text
    answer = str(ex["answer"])
    return {"prediction": str(pred), "answer": answer,
            "correct": str(pred).strip().lower() == answer.strip().lower()}


def run(model_path: str, limit: Optional[int] = None,
        output: str = "mathvista_results.json"):
    from datasets import load_dataset

    from ..utils.loader import load

    model, processor = load(model_path)
    ds = load_dataset("AI4Math/MathVista", split="testmini")
    results = []
    for i, ex in enumerate(ds):
        if limit and i >= limit:
            break
        results.append(evaluate_example(model, processor, ex))
    acc = sum(r["correct"] for r in results) / max(len(results), 1)
    with open(output, "w") as f:
        json.dump({"accuracy": acc, "n": len(results)}, f)
    print(f"MathVista accuracy: {acc:.4f} over {len(results)}")
    return acc


def main(argv=None):
    p = argparse.ArgumentParser("mathvista eval")
    p.add_argument("--model", required=True)
    p.add_argument("--limit", type=int, default=None)
    a = p.parse_args(argv)
    run(a.model, a.limit)


if __name__ == "__main__":
    main()
