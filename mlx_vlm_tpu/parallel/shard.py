"""Tensor/pipeline-parallel partition rules as sharding annotations.

Role parity: reference per-model `shard(group)` methods (19 sites, e.g.
models/qwen2/language.py:160-187) and `PipelineMixin.pipeline(group)`
(models/pipeline.py:1-24) which assigns contiguous layer ranges per rank.

TPU design (SURVEY.md §2.10): parameters get `NamedSharding`s from
path-regex rules and XLA/GSPMD inserts collectives inside the jitted step.
Because decoder layers are STACKED on a leading axis for lax.scan, pipeline
parallelism is itself just a sharding: the layer axis maps to the "pipe"
mesh axis (each stage holds L/P layers; XLA moves the carried activations
between stages across scan steps).  Megatron TP rides the "model" axis:

- column-parallel (q/k/v/gate/up): out dim -> "model"
- row-parallel (o_proj/down):      in dim  -> "model"
- embeddings / lm_head: vocab dim -> "model"
- MoE expert stacks: expert axis -> "expert" (expert parallelism) when the
  mesh has one, else replicated
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.quant import ChannelQuantizedTensor, QuantizedTensor


def _llama_like_rules(prefix: str = "language_model", pipe: Optional[str] = None):
    L = pipe  # None -> replicated layer axis
    return [
        (rf"{prefix}\.model\.embed_tokens\.weight", P("model", None)),
        (rf"{prefix}\.model\.layers\.self_attn\.[qkv]_proj\.weight", P(L, "model", None)),
        (rf"{prefix}\.model\.layers\.self_attn\.[qkv]_proj\.bias", P(L, "model")),
        (rf"{prefix}\.model\.layers\.self_attn\.[qkv]_norm\.weight", P(L, None)),
        (rf"{prefix}\.model\.layers\.self_attn\.o_proj\.weight", P(L, None, "model")),
        (rf"{prefix}\.model\.layers\.mlp\.(gate|up)_proj\.weight", P(L, "model", None)),
        (rf"{prefix}\.model\.layers\.mlp\.down_proj\.weight", P(L, None, "model")),
        (rf"{prefix}\.model\.layers\.mlp\.experts\.(gate|up)_proj\.weight",
         P(L, "expert", "model", None)),
        (rf"{prefix}\.model\.layers\.mlp\.experts\.down_proj\.weight",
         P(L, "expert", None, "model")),
        (rf"{prefix}\.model\.layers\.mlp\.gate\.weight", P(L, None, None)),
        (rf"{prefix}\.model\.layers\.[a-z_]*layernorm\.weight", P(L, None)),
        (rf"{prefix}\.lm_head\.weight", P("model", None)),
        # vision towers stay replicated (reference shards the LM only,
        # utils.py:848)
    ]


def partition_rules(model_type: str, pipeline: bool = False):
    pipe = "pipe" if pipeline else None
    rules = _llama_like_rules("language_model", pipe)
    return rules


# backwards-compat name
def partition_rules_qwen2():
    return partition_rules("qwen2_vl")


PARTITION_RULES_QWEN2 = partition_rules("qwen2_vl")


def _spec_for(path: str, rules) -> Optional[P]:
    for pat, spec in rules:
        if re.fullmatch(pat, path):
            return spec
    return None


def _prune_spec(spec: P, mesh: Mesh, ndim: int) -> P:
    """Drop axes the mesh doesn't have / trailing over-specification."""
    names = set(mesh.axis_names)
    parts = [
        (p if (p is None or p in names) else None) for p in tuple(spec)[:ndim]
    ]
    while len(parts) < ndim:
        parts.append(None)
    # an axis of size 1 in the mesh is harmless; leave it
    return P(*parts)


def apply_shardings(params: dict, mesh: Mesh, rules) -> dict:
    """device_put every leaf with its rule's NamedSharding (replicated when
    no rule matches)."""

    def place(path, leaf):
        ndim = leaf.ndim
        spec = _spec_for(path, rules)
        spec = _prune_spec(spec, mesh, ndim) if spec is not None else P()
        sh = NamedSharding(mesh, spec)
        if isinstance(leaf, ChannelQuantizedTensor):
            # channel layout is transposed [.., in, out]: flip the last two
            # spec entries the HF [out, in] rules assume
            sp = list(spec)
            if len(sp) >= 2:
                sp[-1], sp[-2] = sp[-2], sp[-1]
            tsp = P(*sp)
            tsh = NamedSharding(mesh, tsp)
            # scales/biases are [.., 1, out]: keep the out-axis sharding only
            ssp = list(sp)
            if len(ssp) >= 2:
                ssp[-2] = None
            ssh = NamedSharding(mesh, P(*ssp))
            return ChannelQuantizedTensor(
                q8=jax.device_put(leaf.q8, tsh),
                scales=jax.device_put(leaf.scales, ssh),
                biases=jax.device_put(leaf.biases, ssh),
                src_bits=leaf.src_bits,
                out_dtype=leaf.out_dtype,
            )
        if isinstance(leaf, QuantizedTensor):
            return QuantizedTensor(
                q=jax.device_put(leaf.q, NamedSharding(mesh, spec)),
                scales=jax.device_put(leaf.scales, NamedSharding(mesh, spec)),
                biases=jax.device_put(leaf.biases, NamedSharding(mesh, spec)),
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


def shard_model(model, mesh: Mesh, pipeline: Optional[bool] = None):
    """Apply the model family's TP(+PP) rules in place; returns the model.

    Reference parity: `sharded_load` utils.py:815 (shard + pipeline then
    materialize)."""
    if pipeline is None:
        pipeline = "pipe" in mesh.axis_names and mesh.shape.get("pipe", 1) > 1
    # pack-only int4 loads carry the layer linears only inside the fused
    # single-chip decode pack, which no partition rule matches; rebuild the
    # per-linear stacked tree (bit-exact) and drop the pack before sharding
    from ..utils.loader import ensure_layer_params

    ensure_layer_params(model, drop_pack=True)
    if "expert" in mesh.axis_names and mesh.shape.get("expert", 1) > 1:
        from ..core.moe import set_expert_parallel

        set_expert_parallel(True)
    rules = partition_rules(model.config.model_type, pipeline)
    model.params = apply_shardings(model.params, mesh, rules)
    model.mesh = mesh
    return model
