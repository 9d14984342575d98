"""OCRBench harness — reference mlx_vlm/evals/ocrbench.py."""

from __future__ import annotations

import argparse
import json
from typing import Optional

from .utils import inference, score_contains


def evaluate_example(model, processor, ex, max_tokens=128) -> dict:
    pred = inference(
        model, processor, ex["question"], [ex["image"]], max_tokens=max_tokens
    )
    answers = ex["answer"] if isinstance(ex["answer"], list) else [ex["answer"]]
    correct = any(score_contains(pred, a) for a in answers)
    return {"prediction": pred, "answers": answers, "correct": correct,
            "type": ex.get("question_type")}


def run(model_path: str, limit: Optional[int] = None,
        output: str = "ocrbench_results.json"):
    from datasets import load_dataset

    from ..utils.loader import load

    model, processor = load(model_path)
    ds = load_dataset("echo840/OCRBench", split="test")
    results = []
    for i, ex in enumerate(ds):
        if limit and i >= limit:
            break
        results.append(evaluate_example(model, processor, ex))
    acc = sum(r["correct"] for r in results) / max(len(results), 1)
    with open(output, "w") as f:
        json.dump({"accuracy": acc, "n": len(results)}, f)
    print(f"OCRBench accuracy: {acc:.4f} over {len(results)}")
    return acc


def main(argv=None):
    p = argparse.ArgumentParser("ocrbench eval")
    p.add_argument("--model", required=True)
    p.add_argument("--limit", type=int, default=None)
    a = p.parse_args(argv)
    run(a.model, a.limit)


if __name__ == "__main__":
    main()
