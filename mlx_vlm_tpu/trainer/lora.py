"""LoRA / QLoRA adapters.

Role parity: reference mlx_vlm/trainer/lora_layers.py (LoRALinear:11,
QLoRALinear:101 — ours rides quantized base weights for free since
core.layers.linear adds the low-rank path on top of any base), adapter
apply/save trainer/utils.py:312/372, lora.py CLI.

Functional design: LoRA factors live *inside* the parameter tree next to the
weights they adapt ("lora_a"/"lora_b" keys).  Training computes grads only
for the LoRA leaves via a split/merge of the tree.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj")


def _iter_linears(tree: dict, prefix=""):
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            if "weight" in v and not isinstance(v.get("weight"), dict):
                yield path, v
            else:
                yield from _iter_linears(v, path)


def init_lora(
    params: dict,
    rank: int = 8,
    alpha: float = 16.0,
    targets: Tuple[str, ...] = DEFAULT_TARGETS,
    seed: int = 0,
    dtype=jnp.float32,
) -> dict:
    """Create LoRA factors for every matching linear.

    Returns {path: {"lora_a": [..., r, in], "lora_b": [..., out, r]}} with
    the alpha/rank scale folded into lora_b's init-time semantics (b starts
    at zero so the adapter is a no-op until trained).
    """
    rng = np.random.default_rng(seed)
    out = {}
    for path, p in _iter_linears(params):
        name = path.rsplit(".", 1)[-1]
        if name not in targets:
            continue
        w = p["weight"]
        shape = w.shape  # [out,in] or stacked [L,out,in]
        *lead, o, i = shape
        a = (rng.standard_normal((*lead, rank, i)) / np.sqrt(rank)).astype(
            np.float32
        ) * 0.01
        b = np.zeros((*lead, o, rank), np.float32)
        out[path] = {
            "lora_a": jnp.asarray(a, dtype),
            "lora_b": jnp.asarray(b, dtype),
        }
    if not out:
        raise ValueError(f"no linears matched LoRA targets {targets}")
    return out


def init_dora(
    params: dict,
    rank: int = 8,
    alpha: float = 16.0,
    targets: Tuple[str, ...] = DEFAULT_TARGETS,
    seed: int = 0,
    dtype=jnp.float32,
) -> dict:
    """DoRA factors (reference trainer/dora_layers.py:9): LoRA factors plus
    a trainable per-output-row magnitude `dora_m`, initialised to the base
    weight's row norms so the adapter starts as an exact no-op."""
    from ..core.quant import QuantizedTensor, dequantize

    lora = init_lora(params, rank, alpha, targets, seed, dtype)
    by_path = {p: v for p, v in _iter_linears(params)}
    for path, fac in lora.items():
        w = by_path[path]["weight"]
        if isinstance(w, QuantizedTensor):
            w = dequantize(w)
        fac["dora_m"] = jnp.sqrt(
            jnp.sum(jnp.square(w.astype(jnp.float32)), axis=-1) + 1e-12
        ).astype(dtype)
    return lora


def attach_lora(params: dict, lora: dict) -> dict:
    """Merged tree: shallow-copied dicts with lora factors inserted."""

    def walk(tree: dict, prefix="") -> dict:
        new = {}
        for k, v in tree.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                v = walk(v, path)
                if path in lora:
                    v = {**v, **lora[path]}
            new[k] = v
        return new

    return walk(params)


def make_lora_train_step(model, tx, scale: float = 2.0):
    """Jittable `(lora, opt_state, batch) -> (lora, opt_state, loss)` —
    gradients flow only into the LoRA leaves."""
    import optax

    from .sft import sft_loss

    base = model.params

    def step(lora, opt_state, batch):
        def loss_fn(lr):
            merged = attach_lora(base, lr)
            return sft_loss(
                model, merged, batch["input_ids"], batch["labels"],
                batch["position_ids"],
            )

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt_state = tx.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return step


def fuse_lora(params: dict, lora: dict) -> dict:
    """Fold adapters into the base weights (w += b @ a)."""

    def walk(tree: dict, prefix="") -> dict:
        new = {}
        for k, v in tree.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                v = walk(v, path)
                if path in lora:
                    a = lora[path]["lora_a"]
                    b = lora[path]["lora_b"]
                    delta = jnp.einsum("...or,...ri->...oi", b, a)
                    v = {**v, "weight": v["weight"] + delta.astype(v["weight"].dtype)}
            new[k] = v
        return new

    return walk(params)


def fuse_dora(params: dict, dora: dict) -> dict:
    """Fold DoRA adapters into the base weights:
    w' = (m / ||W + BA||_row) * (W + BA)  (reference dora_layers.py:32)."""
    from ..core.quant import QuantizedTensor, dequantize

    def walk(tree: dict, prefix="") -> dict:
        new = {}
        for k, v in tree.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                v = walk(v, path)
                if path in dora:
                    fac = dora[path]
                    w = v["weight"]
                    out_dtype = getattr(w, "dtype", jnp.float32)
                    if isinstance(w, QuantizedTensor):
                        w = dequantize(w)
                        out_dtype = w.dtype
                    delta = jnp.einsum("...or,...ri->...oi", fac["lora_b"],
                                       fac["lora_a"])
                    adapted = w.astype(jnp.float32) + delta.astype(
                        jnp.float32)
                    norm = jnp.sqrt(
                        jnp.sum(jnp.square(adapted), axis=-1) + 1e-12)
                    scaled = adapted * (fac["dora_m"] / norm)[..., None]
                    v = {**v, "weight": scaled.astype(out_dtype)}
            new[k] = v
        return new

    return walk(params)


def save_adapter(path: str, lora: dict, config: Optional[dict] = None):
    """Adapter safetensors + config (reference trainer/utils.py:372)."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    flat = {}
    for p, fac in lora.items():
        for kind, leaf in fac.items():
            flat[f"{p}.{kind}"] = np.asarray(leaf, np.float32)
    save_file(flat, os.path.join(path, "adapters.safetensors"))
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump(config or {}, f)


def load_adapter(path: str, dtype=jnp.float32) -> dict:
    from safetensors import safe_open

    lora: Dict[str, dict] = {}
    with safe_open(os.path.join(path, "adapters.safetensors"), framework="numpy") as sf:
        for k in sf.keys():
            base, kind = k.rsplit(".", 1)
            lora.setdefault(base, {})[kind] = jnp.asarray(sf.get_tensor(k), dtype)
    return lora


def apply_lora_layers(model, adapter_path: str):
    """Inference-time adapter attach (reference utils.py:799)."""
    lora = load_adapter(adapter_path)
    model.params = attach_lora(model.params, lora)
    return model
