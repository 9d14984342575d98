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
        (rf"{prefix}\.model\.layers(?:\.\d+)?\.self_attn\.[qkv]_proj\.weight", P(L, "model", None)),
        (rf"{prefix}\.model\.layers(?:\.\d+)?\.self_attn\.[qkv]_proj\.bias", P(L, "model")),
        (rf"{prefix}\.model\.layers(?:\.\d+)?\.self_attn\.[qkv]_norm\.weight", P(L, None)),
        (rf"{prefix}\.model\.layers(?:\.\d+)?\.self_attn\.o_proj\.weight", P(L, None, "model")),
        (rf"{prefix}\.model\.layers(?:\.\d+)?\.mlp\.(gate|up)_proj\.weight", P(L, "model", None)),
        (rf"{prefix}\.model\.layers(?:\.\d+)?\.mlp\.down_proj\.weight", P(L, None, "model")),
        (rf"{prefix}\.model\.layers(?:\.\d+)?\.mlp\.experts\.(gate|up)_proj\.weight",
         P(L, "expert", "model", None)),
        (rf"{prefix}\.model\.layers(?:\.\d+)?\.mlp\.experts\.down_proj\.weight",
         P(L, "expert", None, "model")),
        (rf"{prefix}\.model\.layers(?:\.\d+)?\.mlp\.gate\.weight", P(L, None, None)),
        (rf"{prefix}\.model\.layers(?:\.\d+)?\.[a-z_]*layernorm\.weight", P(L, None)),
        (rf"{prefix}\.lm_head\.weight", P("model", None)),
        # vision towers stay replicated (reference shards the LM only,
        # utils.py:848)
    ]


def _mla_rules(prefix: str = "language_model", pipe: Optional[str] = None):
    """MLA (deepseek_v2/v3/v32/kimi/mistral4) head-sharded TP: the LoRA-down
    projections (q_a, kv_a) are tiny and replicated; the head-major up
    projections shard on heads; o_proj is row-parallel (reference
    deepseek_v3/language.py:420 shard_heads)."""
    L = pipe
    la = rf"{prefix}\.model\.layers(?:\.\d+)?\.self_attn"
    return [
        (rf"{la}\.q_a_proj\.weight", P(L, None, None)),
        (rf"{la}\.q_a_layernorm\.weight", P(L, None)),
        (rf"{la}\.q_b_proj\.weight", P(L, "model", None)),
        (rf"{la}\.kv_a_proj_with_mqa\.weight", P(L, None, None)),
        (rf"{la}\.kv_a_layernorm\.weight", P(L, None)),
        (rf"{la}\.kv_b_proj\.weight", P(L, "model", None)),
        # MoE router + shared experts (deepseek MoE layouts)
        (rf"{prefix}\.model\.layers(?:\.\d+)?\.mlp\.gate\."
         r"(weight|e_score_correction_bias)", P(L, None, None)),
        (rf"{prefix}\.model\.layers(?:\.\d+)?\.mlp\.shared_experts\."
         r"(gate|up)_proj\.weight", P(L, "model", None)),
        (rf"{prefix}\.model\.layers(?:\.\d+)?\.mlp\.shared_experts\."
         r"down_proj\.weight", P(L, None, "model")),
    ]


def _shared_expert_rules(prefix: str = "language_model",
                         pipe: Optional[str] = None):
    L = pipe
    return [
        (rf"{prefix}\.model\.layers(?:\.\d+)?\.mlp\.shared_expert\."
         r"(gate|up)_proj\.weight", P(L, "model", None)),
        (rf"{prefix}\.model\.layers(?:\.\d+)?\.mlp\.shared_expert\."
         r"down_proj\.weight", P(L, None, "model")),
        (rf"{prefix}\.model\.layers(?:\.\d+)?\.mlp\.shared_expert_gate\.weight",
         P(L, None, None)),
        (rf"{prefix}\.model\.layers(?:\.\d+)?\.mlp\.shared_experts\."
         r"(gate|up)_proj\.weight", P(L, "model", None)),
        (rf"{prefix}\.model\.layers(?:\.\d+)?\.mlp\.shared_experts\."
         r"down_proj\.weight", P(L, None, "model")),
    ]


# fused projections whose row order interleaves q|k|v (or gate|up) heads:
# a contiguous row shard would split across role boundaries, so these are
# EXPLICITLY replicated (matched-but-replicated — the coverage guard
# reports them separately).  Families wanting real TP here split the
# fusion at sanitize instead (e.g. phi3_v, phi4mm).
_FUSED_REPLICATED = (
    r".*\.(wqkv|qkv|att_proj|query_key_value|qkv_proj|in_proj|w13|wi)\."
    r"(weight|bias)",
)


def partition_rules(model_type: str, pipeline: bool = False,
                    param_paths=None):
    """Rule set for one family.

    `param_paths` (flat leaf paths) switches on family-specific rule
    groups by the key shapes actually present — this covers remapped
    families automatically (reference ships 19 per-model shard()
    implementations; here the rules are keyed on layout, not name)."""
    pipe = "pipe" if pipeline else None
    rules = _llama_like_rules("language_model", pipe)
    joined = "\n".join(param_paths) if param_paths else ""
    if ".q_b_proj." in joined or ".kv_b_proj." in joined:
        rules = _mla_rules("language_model", pipe) + rules
    if ".shared_expert" in joined:
        rules += _shared_expert_rules("language_model", pipe)
    rules += [(pat, P()) for pat in _FUSED_REPLICATED]
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
    """Drop axes the mesh doesn't have / align rank.

    Rules are written for STACKED layers ([L, out, in] — leading layer
    axis); for UNSTACKED leaves (numbered per-layer trees, e.g.
    heterogeneous deepseek_v2 stacks) the spec right-aligns so the
    out/in axes keep their intended sharding."""
    names = set(mesh.axis_names)
    parts = list(tuple(spec))
    if len(parts) > ndim:
        parts = parts[len(parts) - ndim:]
    parts = [(p if (p is None or p in names) else None) for p in parts]
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
    paths = _flat_paths(model.params)
    rules = partition_rules(model.config.model_type, pipeline,
                            param_paths=paths)
    report = coverage_report(paths, model.params, rules)
    if report["unmatched"]:
        import os
        import warnings

        msg = (
            f"TP partition rules matched {report['pct']:.0f}% of LM matmul "
            f"weights ({len(report['sharded'])} sharded, "
            f"{len(report['replicated'])} rule-replicated); UNMATCHED "
            f"(silently replicated): {sorted(report['unmatched'])[:8]}"
            + ("..." if len(report["unmatched"]) > 8 else "")
        )
        if os.environ.get("MLX_VLM_TPU_TP_STRICT", "0") in ("1", "true"):
            raise ValueError(msg)
        warnings.warn(msg, stacklevel=2)
    model.params = apply_shardings(model.params, mesh, rules)
    model.mesh = mesh
    model.tp_coverage = report
    return model


def _flat_paths(params: dict, prefix: str = "") -> List[str]:
    out = []
    for k, v in params.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out += _flat_paths(v, path)
        else:
            out.append(path)
    return out


def coverage_report(paths: List[str], params: dict, rules) -> dict:
    """Which LM matmul weights do the rules cover?  (VERDICT r4 weak #3:
    TP silently no-ops off the llama shape — make it loud.)

    An 'LM matmul weight' is any >=2-D leaf under language_model.model
    whose path ends in .weight and is not a norm/embedding table."""

    def leaf_at(path):
        node = params
        for part in path.split("."):
            node = node[part]
        return node

    sharded, replicated, unmatched = [], [], []
    for path in paths:
        if not path.startswith("language_model.model.layers"):
            continue
        if not path.endswith(".weight") or "norm" in path.split(".")[-2]:
            continue
        leaf = leaf_at(path)
        if getattr(leaf, "ndim", 0) < 2:
            continue
        spec = _spec_for(path, rules)
        if spec is None:
            unmatched.append(path)
        elif any(p is not None and p != "pipe" for p in tuple(spec)):
            sharded.append(path)
        else:
            replicated.append(path)
    total = len(sharded) + len(replicated) + len(unmatched)
    return {
        "sharded": sharded,
        "replicated": replicated,
        "unmatched": unmatched,
        "pct": 100.0 * (total - len(unmatched)) / max(total, 1),
    }
