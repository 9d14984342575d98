"""MMStar harness — reference mlx_vlm/evals/mmstar.py."""

from __future__ import annotations

import argparse
import json
from typing import Optional

from .utils import extract_mc_answer, inference


def run(model_path: str, limit: Optional[int] = None,
        output: str = "mmstar_results.json"):
    from datasets import load_dataset

    from ..utils.loader import load

    model, processor = load(model_path)
    ds = load_dataset("Lin-Chen/MMStar", split="val")
    results = []
    for i, ex in enumerate(ds):
        if limit and i >= limit:
            break
        pred_text = inference(
            model, processor,
            ex["question"] + "\nAnswer with the option's letter directly.",
            [ex["image"]], max_tokens=16,
        )
        pred = extract_mc_answer(pred_text)
        results.append({"correct": pred == ex["answer"],
                        "category": ex.get("category")})
    acc = sum(r["correct"] for r in results) / max(len(results), 1)
    with open(output, "w") as f:
        json.dump({"accuracy": acc, "n": len(results)}, f)
    print(f"MMStar accuracy: {acc:.4f} over {len(results)}")
    return acc


def main(argv=None):
    p = argparse.ArgumentParser("mmstar eval")
    p.add_argument("--model", required=True)
    p.add_argument("--limit", type=int, default=None)
    a = p.parse_args(argv)
    run(a.model, a.limit)


if __name__ == "__main__":
    main()
