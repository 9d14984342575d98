"""Training datasets.

Role parity: reference mlx_vlm/trainer/datasets.py — VisionDataset:13 /
PreferenceVisionDataset:221 (HF datasets with chat-template application and
multimodal collation).
"""

from __future__ import annotations

import json
from typing import Iterator, List, Optional

import numpy as np


class VisionDataset:
    """Chat-format SFT dataset from a jsonl file or HF dataset.

    Each example: {"messages": [...]} (optionally {"images": [path,...]}).
    Labels mask everything but assistant responses is approximated by
    masking the prompt prefix (reference sft_trainer.py:131 masks
    non-assistant tokens).
    """

    def __init__(self, path_or_rows, processor, config: dict, image_root: str = ""):
        if isinstance(path_or_rows, str):
            with open(path_or_rows) as f:
                self.rows = [json.loads(l) for l in f if l.strip()]
        else:
            self.rows = list(path_or_rows)
        self.processor = processor
        self.config = config
        self.image_root = image_root

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, idx: int) -> dict:
        from ..prompt_utils import apply_chat_template
        from ..utils.processing import prepare_inputs

        row = self.rows[idx]
        messages = row.get("messages") or row.get("conversations")
        images = row.get("images") or row.get("image")
        if images and not isinstance(images, list):
            images = [images]
        # prompt without the final assistant turn -> mask boundary
        prompt_msgs = messages[:-1]
        full = apply_chat_template(
            self.processor, self.config, messages, add_generation_prompt=False,
            num_images=len(images or []),
        )
        prefix = apply_chat_template(
            self.processor, self.config, prompt_msgs, add_generation_prompt=True,
            num_images=len(images or []),
        )
        inputs = prepare_inputs(self.processor, full, images=images)
        pref = prepare_inputs(self.processor, prefix, images=images)
        ids = np.asarray(inputs["input_ids"])[0]
        n_prefix = np.asarray(pref["input_ids"]).shape[1]
        labels = ids.copy().astype(np.int64)
        labels[:n_prefix] = -100
        out = {"input_ids": ids, "labels": labels}
        for k in ("pixel_values", "image_grid_thw"):
            if k in inputs:
                out[k] = np.asarray(inputs[k])
        return out


def iterate_batches(
    dataset: VisionDataset, batch_size: int, max_seq_len: int = 2048,
    shuffle: bool = True, seed: int = 0,
) -> Iterator[dict]:
    """Right-pad text batches to a shared bucketed length
    (reference sft_trainer.py:205)."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(dataset)) if shuffle else np.arange(len(dataset))
    for i in range(0, len(order) - batch_size + 1, batch_size):
        items = [dataset[int(j)] for j in order[i : i + batch_size]]
        S = min(max(len(it["input_ids"]) for it in items), max_seq_len)
        S = ((S + 63) // 64) * 64
        B = len(items)
        ids = np.zeros((B, S), np.int32)
        labels = np.full((B, S), -100, np.int64)
        for b, it in enumerate(items):
            n = min(len(it["input_ids"]), S)
            ids[b, :n] = it["input_ids"][:n]
            labels[b, :n] = it["labels"][:n]
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, B, S)).copy()
        yield {"input_ids": ids, "labels": labels, "position_ids": pos}
