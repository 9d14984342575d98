"""`python -m mlx_vlm_tpu sft` — full-finetune / LoRA / DoRA training CLI.

Role parity: reference mlx_vlm/trainer/sft_trainer.py:362 (train) and
lora.py:143 (argument surface), plus DoRA (trainer/dora_layers.py).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("mlx_vlm_tpu sft")
    p.add_argument("--model", required=True)
    p.add_argument("--dataset", required=True,
                   help="jsonl with {'messages': ...}")
    p.add_argument("--val-dataset", default=None)
    p.add_argument("--mode", choices=("full", "lora", "dora"),
                   default="lora")
    p.add_argument("--out-path", default="adapters",
                   help="adapter dir (lora/dora) or model dir (full)")
    p.add_argument("--lora-rank", type=int, default=8)
    p.add_argument("--lora-alpha", type=float, default=16.0)
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--steps-per-report", type=int, default=10)
    p.add_argument("--steps-per-eval", type=int, default=0)
    p.add_argument("--steps-per-save", type=int, default=0)
    p.add_argument("--max-seq-len", type=int, default=2048)
    p.add_argument("--grad-checkpoint", action="store_true",
                   help="remat decoder layers in backward (saves HBM)")
    args = p.parse_args(argv)

    from .trainer.datasets import VisionDataset
    from .trainer.train import TrainConfig, train
    from .utils.loader import load

    model, processor = load(args.model)
    train_ds = VisionDataset(args.dataset, processor, model.config_dict)
    print(f"train dataset: {len(train_ds)} examples")
    val_ds = None
    if args.val_dataset:
        val_ds = VisionDataset(args.val_dataset, processor,
                               model.config_dict)
        print(f"val dataset: {len(val_ds)} examples")

    cfg = TrainConfig(
        mode=args.mode, iters=args.iters, batch_size=args.batch_size,
        learning_rate=args.learning_rate, max_seq_len=args.max_seq_len,
        grad_checkpoint=args.grad_checkpoint, lora_rank=args.lora_rank,
        lora_alpha=args.lora_alpha, steps_per_report=args.steps_per_report,
        steps_per_eval=args.steps_per_eval,
        steps_per_save=args.steps_per_save, out_path=args.out_path,
    )
    train(model, processor, train_ds, cfg, val_dataset=val_ds)
    print(f"saved to {args.out_path}")


if __name__ == "__main__":
    main()
