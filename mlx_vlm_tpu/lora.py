"""`python -m mlx_vlm_tpu lora` — LoRA SFT CLI.

Role parity: reference mlx_vlm/lora.py:143 (main) + trainer/sft_trainer.py:362
(train loop with periodic loss reporting and adapter saving).
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser("mlx_vlm_tpu lora")
    p.add_argument("--model", required=True)
    p.add_argument("--dataset", required=True, help="jsonl with {'messages': ...}")
    p.add_argument("--adapter-path", default="adapters")
    p.add_argument("--lora-rank", type=int, default=8)
    p.add_argument("--lora-alpha", type=float, default=16.0)
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--steps-per-report", type=int, default=10)
    p.add_argument("--max-seq-len", type=int, default=2048)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from .trainer.datasets import VisionDataset, iterate_batches
    from .trainer.lora import init_lora, make_lora_train_step, save_adapter
    from .utils.loader import load

    model, processor = load(args.model)
    dataset = VisionDataset(args.dataset, processor, model.config_dict)
    print(f"dataset: {len(dataset)} examples")

    lora = init_lora(model.params, rank=args.lora_rank, alpha=args.lora_alpha)
    tx = optax.adamw(args.learning_rate)
    opt_state = tx.init(lora)
    step_fn = jax.jit(make_lora_train_step(model, tx))

    it = 0
    t0 = time.time()
    losses = []
    while it < args.iters:
        for batch in iterate_batches(dataset, args.batch_size, args.max_seq_len,
                                     seed=it):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            lora, opt_state, loss = step_fn(lora, opt_state, batch)
            losses.append(float(loss))
            it += 1
            if it % args.steps_per_report == 0:
                avg = sum(losses[-args.steps_per_report:]) / args.steps_per_report
                print(f"iter {it}: loss {avg:.4f} ({it/(time.time()-t0):.2f} it/s)")
            if it >= args.iters:
                break
    save_adapter(args.adapter_path, lora, {
        "rank": args.lora_rank, "alpha": args.lora_alpha, "model": args.model,
    })
    print(f"adapter saved to {args.adapter_path}")


if __name__ == "__main__":
    main()
