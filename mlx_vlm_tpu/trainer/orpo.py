"""ORPO preference training (odds-ratio preference optimization).

Role parity: reference mlx_vlm/trainer/orpo_trainer.py — orpo_loss:94,
train_orpo:306.  Loss = chosen-NLL + lambda * -log sigmoid(log-odds-ratio
between chosen and rejected completions).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

IGNORE_INDEX = -100


def _sequence_logprob(model, params, input_ids, labels, position_ids):
    """Mean per-token logprob of the labeled (assistant) tokens."""
    lm = params["language_model"]
    embeds = model.language_model.embed(lm, input_ids)
    hidden, _ = model.language_model(lm, embeds, None, position_ids)
    logits = model.language_model.logits(lm, hidden)[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    mask = (targets != IGNORE_INDEX).astype(jnp.float32)
    lp = jax.nn.log_softmax(logits, axis=-1)
    tok_lp = jnp.take_along_axis(
        lp, jnp.maximum(targets, 0)[..., None], axis=-1
    )[..., 0]
    return (tok_lp * mask).sum(-1) / jnp.maximum(mask.sum(-1), 1.0)


def orpo_loss(model, params, batch, beta: float = 0.1):
    """Reference orpo_trainer.py:94. batch carries chosen_* and rejected_*."""
    lp_c = _sequence_logprob(
        model, params, batch["chosen_input_ids"], batch["chosen_labels"],
        batch["chosen_position_ids"],
    )
    lp_r = _sequence_logprob(
        model, params, batch["rejected_input_ids"], batch["rejected_labels"],
        batch["rejected_position_ids"],
    )
    # log-odds ratio: log( p_c/(1-p_c) / (p_r/(1-p_r)) ) with p = exp(mean lp)
    log_odds = (lp_c - lp_r) - (
        jnp.log1p(-jnp.exp(jnp.clip(lp_c, -20, -1e-6)))
        - jnp.log1p(-jnp.exp(jnp.clip(lp_r, -20, -1e-6)))
    )
    ratio_loss = -jax.nn.log_sigmoid(log_odds)
    nll = -lp_c
    loss = (nll + beta * ratio_loss).mean()
    metrics = {
        "nll": nll.mean(),
        "ratio_loss": ratio_loss.mean(),
        "margin": (lp_c - lp_r).mean(),
        "accuracy": (lp_c > lp_r).astype(jnp.float32).mean(),
    }
    return loss, metrics


def make_orpo_train_step(model, tx: optax.GradientTransformation,
                         beta: float = 0.1) -> Callable:
    def step(params, opt_state, batch):
        def loss_fn(p):
            return orpo_loss(model, p, batch, beta)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, metrics

    return step


def make_orpo_lora_train_step(model, tx, beta: float = 0.1) -> Callable:
    from .lora import attach_lora

    base = model.params

    def step(lora, opt_state, batch):
        def loss_fn(lr):
            return orpo_loss(model, attach_lora(base, lr), batch, beta)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(lora)
        updates, opt_state = tx.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss, metrics

    return step
