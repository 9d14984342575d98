"""Supervised fine-tuning: loss + train step.

Role parity: reference `mlx_vlm/trainer/sft_trainer.py` —
vision_language_loss_fn:131 (masked CE over assistant tokens), train:362.

TPU design: the whole update (forward, backward, optimizer) is one jitted
program; with sharded params GSPMD emits the TP all-reduces and DP gradient
reductions automatically over the mesh.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

IGNORE_INDEX = -100


def sft_loss(model, params, input_ids, labels, position_ids, inputs_embeds=None):
    """Masked next-token cross-entropy (labels==-100 ignored)."""
    lm = params["language_model"]
    if inputs_embeds is None:
        inputs_embeds = model.language_model.embed(lm, input_ids)
    hidden, _ = model.language_model(lm, inputs_embeds, None, position_ids)
    logits = model.language_model.logits(lm, hidden)
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    mask = targets != IGNORE_INDEX
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits, jnp.maximum(targets, 0)
    )
    return (ce * mask).sum() / jnp.maximum(mask.sum(), 1)


def make_train_step(model, tx: optax.GradientTransformation,
                    grad_checkpoint: bool = False) -> Callable:
    """Returns jittable `(params, opt_state, batch) -> (params, opt_state, loss)`.

    grad_checkpoint=True remats each decoder layer in the backward pass
    (reference grad_checkpoint, trainer/trainer.py): HBM for activations
    drops from O(layers) to O(1) at ~1.3x FLOPs.
    """
    if grad_checkpoint:
        model.language_model.remat = True

    def step(params, opt_state, batch):
        def loss_fn(p):
            return sft_loss(
                model, p, batch["input_ids"], batch["labels"], batch["position_ids"]
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_eval_step(model) -> Callable:
    """Jittable validation loss: `(params, batch) -> loss`."""

    def step(params, batch):
        return sft_loss(model, params, batch["input_ids"], batch["labels"],
                        batch["position_ids"])

    return step
