"""Tensor-parallel partition rules (megatron-style) as sharding annotations.

Role parity: reference per-model `shard(group)` methods that rewrite Linear
layers into `shard_linear(..., "all-to-sharded"/"sharded-to-all")`
(models/qwen2/language.py:160-187 and 18 other sites).  On TPU we do not
rewrite modules: parameters get `NamedSharding`s from path-regex rules and
XLA/GSPMD inserts the all-reduces inside the jitted step
(SURVEY.md §2.10).

Rule orientation for stacked decoder weights [L, out, in]:
- column-parallel (q/k/v/gate/up): shard `out`  -> P(None, "model", None)
- row-parallel   (o_proj/down):    shard `in`   -> P(None, None, "model")
- embeddings / lm_head: shard vocab dim
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.quant import QuantizedTensor

# rules map path-regex -> PartitionSpec for the *weight* leaf. Stacked decoder
# layers have a leading L axis.
PARTITION_RULES_QWEN2 = [
    (r"language_model\.model\.embed_tokens\.weight", P("model", None)),
    (r"language_model\.model\.layers\.self_attn\.[qkv]_proj\.weight", P(None, "model", None)),
    (r"language_model\.model\.layers\.self_attn\.[qkv]_proj\.bias", P(None, "model")),
    (r"language_model\.model\.layers\.self_attn\.o_proj\.weight", P(None, None, "model")),
    (r"language_model\.model\.layers\.mlp\.(gate|up)_proj\.weight", P(None, "model", None)),
    (r"language_model\.model\.layers\.mlp\.down_proj\.weight", P(None, None, "model")),
    (r"language_model\.lm_head\.weight", P("model", None)),
    # vision tower stays replicated (reference shards LM only, utils.py:848)
]


def partition_rules_qwen2():
    return PARTITION_RULES_QWEN2


def _flatten(tree: dict, prefix=""):
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            yield from _flatten(v, path)
        else:
            yield path, v


def _spec_for(path: str, rules) -> Optional[P]:
    for pat, spec in rules:
        if re.fullmatch(pat, path):
            return spec
    return None


def apply_shardings(params: dict, mesh: Mesh, rules) -> dict:
    """device_put every leaf with its rule's NamedSharding (replicated if no
    rule matches)."""

    def place(path, leaf):
        spec = _spec_for(path, rules) or P()
        sh = NamedSharding(mesh, spec)
        if isinstance(leaf, QuantizedTensor):
            # shard packed q + scales/biases congruently on the out axis;
            # group (last) axis sharding is not supported yet
            qs = NamedSharding(mesh, spec)
            return QuantizedTensor(
                q=jax.device_put(leaf.q, qs),
                scales=jax.device_put(leaf.scales, qs),
                biases=jax.device_put(leaf.biases, qs),
                bits=leaf.bits,
                group_size=leaf.group_size,
                out_dtype=leaf.out_dtype,
            )
        return jax.device_put(leaf, sh)

    def walk(tree: dict, prefix="") -> dict:
        out = {}
        for k, v in tree.items():
            path = f"{prefix}.{k}" if prefix else k
            out[k] = walk(v, path) if isinstance(v, dict) else place(path, v)
        return out

    return walk(params)


RULES_BY_MODEL_TYPE: Dict[str, list] = {
    "qwen2_vl": PARTITION_RULES_QWEN2,
    "qwen2_5_vl": PARTITION_RULES_QWEN2,
}


def shard_model(model, mesh: Mesh):
    """Apply the model family's TP rules in place; returns the model."""
    model_type = model.config.model_type
    rules = RULES_BY_MODEL_TYPE.get(model_type)
    if rules is None:
        raise ValueError(f"no partition rules for model type {model_type}")
    model.params = apply_shardings(model.params, mesh, rules)
    model.mesh = mesh
    return model
