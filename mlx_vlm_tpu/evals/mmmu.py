"""MMMU benchmark harness.

Role parity: reference mlx_vlm/evals/mmmu.py (30-subject multiple-choice
validation split over HF datasets).  Requires network/`datasets` at runtime.
"""

from __future__ import annotations

import argparse
import ast
import json
from typing import List, Optional

from .utils import extract_mc_answer, inference

SUBJECTS = [
    "Accounting", "Agriculture", "Architecture_and_Engineering", "Art",
    "Art_Theory", "Basic_Medical_Science", "Biology", "Chemistry",
    "Clinical_Medicine", "Computer_Science", "Design",
    "Diagnostics_and_Laboratory_Medicine", "Economics", "Electronics",
    "Energy_and_Power", "Finance", "Geography", "History", "Literature",
    "Manage", "Marketing", "Materials", "Math", "Mechanical_Engineering",
    "Music", "Pharmacy", "Physics", "Psychology", "Public_Health",
    "Sociology",
]

PROMPT = (
    "{question}\n{options}\nAnswer with the option's letter from the given "
    "choices directly."
)


def format_options(options: List[str]) -> str:
    return "\n".join(f"({chr(65 + i)}) {o}" for i, o in enumerate(options))


def evaluate_example(model, processor, ex, max_tokens=16) -> dict:
    options = ex["options"]
    if isinstance(options, str):
        options = ast.literal_eval(options)
    images = [ex[k] for k in ("image_1", "image_2", "image_3") if ex.get(k)]
    prompt = PROMPT.format(
        question=ex["question"], options=format_options(options)
    )
    pred_text = inference(model, processor, prompt, images, max_tokens=max_tokens)
    pred = extract_mc_answer(pred_text, "ABCDEFGHIJ"[: len(options)])
    return {
        "id": ex.get("id"),
        "prediction": pred,
        "answer": ex.get("answer"),
        "correct": pred == ex.get("answer"),
        "raw": pred_text,
    }


def run(model_path: str, subjects: Optional[List[str]] = None,
        split: str = "validation", limit: Optional[int] = None,
        output: str = "mmmu_results.json"):
    from datasets import load_dataset

    from ..utils.loader import load

    model, processor = load(model_path)
    results = []
    for subject in subjects or SUBJECTS:
        ds = load_dataset("MMMU/MMMU", subject, split=split)
        for i, ex in enumerate(ds):
            if limit and i >= limit:
                break
            results.append(evaluate_example(model, processor, ex))
    acc = sum(r["correct"] for r in results) / max(len(results), 1)
    with open(output, "w") as f:
        json.dump({"accuracy": acc, "n": len(results), "results": results}, f)
    print(f"MMMU accuracy: {acc:.4f} over {len(results)} examples")
    return acc


def main(argv=None):
    p = argparse.ArgumentParser("mmmu eval")
    p.add_argument("--model", required=True)
    p.add_argument("--subjects", nargs="*", default=None)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)
    run(args.model, args.subjects, limit=args.limit)


if __name__ == "__main__":
    main()
