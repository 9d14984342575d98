"""Unified training loop: full finetuning, LoRA, DoRA.

Role parity: reference mlx_vlm/trainer/sft_trainer.py:362 (train loop with
periodic loss reporting, in-train validation, checkpoint saving) and
lora.py:143; DoRA per trainer/dora_layers.py.

TPU design: one jitted update program per mode; grad_checkpoint remats each
decoder layer in the backward scan (O(1) activation HBM).  With sharded
params the same step runs dp/tp over a mesh — GSPMD inserts the gradient
reductions.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class TrainConfig:
    mode: str = "lora"  # full | lora | dora
    iters: int = 100
    batch_size: int = 2
    learning_rate: float = 1e-4
    max_seq_len: int = 2048
    grad_checkpoint: bool = False
    lora_rank: int = 8
    lora_alpha: float = 16.0
    steps_per_report: int = 10
    steps_per_eval: int = 0  # 0 = no in-train eval
    eval_batches: int = 8
    steps_per_save: int = 0  # 0 = save only at the end
    out_path: str = "adapters"


def evaluate(model, params, dataset, *, batch_size: int, max_seq_len: int,
             max_batches: int = 8) -> float:
    """Mean masked-CE loss over up to `max_batches` validation batches."""
    from .datasets import iterate_batches
    from .sft import make_eval_step

    step = jax.jit(make_eval_step(model))
    losses = []
    for i, batch in enumerate(iterate_batches(dataset, batch_size,
                                              max_seq_len, seed=0)):
        if i >= max_batches:
            break
        losses.append(float(step(params,
                                 {k: jnp.asarray(v)
                                  for k, v in batch.items()})))
    return float(np.mean(losses)) if losses else float("nan")


def train(model, processor, train_dataset, cfg: TrainConfig,
          val_dataset=None, log: Callable[[str], None] = print) -> dict:
    """Run the configured finetune; returns the trained adapter factors
    (lora/dora) or the updated full params."""
    import optax

    from .datasets import iterate_batches
    from .lora import (attach_lora, init_dora, init_lora,
                       make_lora_train_step, save_adapter)
    from .sft import make_train_step

    # pack-only int4 loads: training walks per-linear layer paths (LoRA
    # target matching, gradient trees) — rematerialize them from the pack
    from ..utils.loader import ensure_layer_params

    ensure_layer_params(model, drop_pack=True)

    tx = optax.adamw(cfg.learning_rate)
    if cfg.mode == "full":
        trainable = model.params
        step_fn = jax.jit(make_train_step(
            model, tx, grad_checkpoint=cfg.grad_checkpoint))
        merged = lambda t: t  # noqa: E731
    elif cfg.mode in ("lora", "dora"):
        init = init_dora if cfg.mode == "dora" else init_lora
        trainable = init(model.params, rank=cfg.lora_rank,
                         alpha=cfg.lora_alpha)
        if cfg.grad_checkpoint:
            model.language_model.remat = True
        step_fn = jax.jit(make_lora_train_step(model, tx))
        merged = lambda t: attach_lora(model.params, t)  # noqa: E731
    else:
        raise ValueError(f"unknown train mode {cfg.mode!r}")
    opt_state = tx.init(trainable)

    it, t0, losses = 0, time.time(), []
    while it < cfg.iters:
        for batch in iterate_batches(train_dataset, cfg.batch_size,
                                     cfg.max_seq_len, seed=it):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            trainable, opt_state, loss = step_fn(trainable, opt_state, batch)
            losses.append(float(loss))
            it += 1
            if it % cfg.steps_per_report == 0:
                avg = sum(losses[-cfg.steps_per_report:]) / min(
                    len(losses), cfg.steps_per_report)
                log(f"iter {it}: train loss {avg:.4f} "
                    f"({it / (time.time() - t0):.2f} it/s)")
            if (cfg.steps_per_eval and val_dataset is not None
                    and it % cfg.steps_per_eval == 0):
                vl = evaluate(model, merged(trainable), val_dataset,
                              batch_size=cfg.batch_size,
                              max_seq_len=cfg.max_seq_len,
                              max_batches=cfg.eval_batches)
                log(f"iter {it}: val loss {vl:.4f}")
            if cfg.steps_per_save and it % cfg.steps_per_save == 0:
                _save(model, processor, trainable, cfg,
                      suffix=f"-{it:06d}")
            if it >= cfg.iters:
                break
    _save(model, processor, trainable, cfg)
    return trainable


def _save(model, processor, trainable, cfg: TrainConfig, suffix: str = ""):
    out = Path(cfg.out_path + suffix)
    if cfg.mode == "full":
        save_full_model(str(out), model, trainable)
    else:
        from .lora import save_adapter

        save_adapter(str(out), trainable, {
            "rank": cfg.lora_rank, "alpha": cfg.lora_alpha,
            "mode": cfg.mode,
        })


def save_full_model(out_dir: str, model, params: Optional[dict] = None):
    """Full-finetune checkpoint: unstacked HF-named safetensors shards +
    config.json (reference trainer saving via utils.save_weights)."""
    from ..convert import save_weights
    from ..utils.loader import unstack_params

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    flat = unstack_params(model, params or model.params)
    save_weights(out, flat)
    (out / "config.json").write_text(json.dumps(model.config_dict, indent=2))
