"""Cache-capability registry for Automatic Prefix Caching.

Role parity: reference apc_adapters.py (Capability enum, PrefixStateAdapter
protocol, register_default_capabilities, resolve_capability) and apc.py
model_apc_mode:4098 — the machinery that decides HOW a given model's prompt
cache may be reused: split into per-token KV blocks, snapshot whole at an
exact boundary, or not at all.

TPU re-design: reference caches are mutable objects, so its adapters carry
capture/restore/merge/serialize methods per capability.  Here every cache is
an immutable registered-dataclass jax pytree — capture is `jax.device_get`
of the tree and restore is a `tree_map(jnp.asarray)`, both already owned by
APCManager.store_exact / lookup_exact.  What remains of the adapter protocol
is the CLASSIFICATION problem, which this module solves:

- ``"block"``: plain bf16 K/V slabs whose time axis concatenates — safe to
  page into the chained-hash block pool (cross-request sharing at any
  16-token boundary, disk tier, LRU).
- ``"exact"``: layouts with non-token-separable state — SSM conv tails and
  delta-rule states (ArraysCache, qwen3_next/nemotron_h/inkling hybrids),
  quantized bit-planes, rotated codebook caches, windowed rings.  The safe
  reuse unit is a whole-prefix snapshot taken at a guarded boundary
  (reference lookup_exact_cache:2976 "Mixed architectures such as
  Nemotron-H ... not block-concatenable").
- ``None``: unknown cache objects; APC stays out of the way.

Unknown-but-snapshotable layouts (a registered dataclass exposing
``scan_arrays`` + ``offset`` — the contract every cache in core/ and the
model zoo implements) degrade to ``"exact"``, mirroring the reference's
MRO walk that demotes unseen PAGEABLE subclasses to CHECKPOINT.
"""

from __future__ import annotations

import os
from typing import Any, Optional

BLOCK = "block"
EXACT = "exact"

# class-name registry (names, not classes: model-family cache dataclasses
# live in lazily-imported modules and must not be imported to classify).
# Reference register_default_capabilities() analog.
_REGISTRY: dict = {
    "KVCache": BLOCK,
    "BatchKVCache": BLOCK,
    # quantized planes don't slice to clean per-token bf16 blocks; group
    # boundaries and scale planes make the snapshot the safe unit
    "QuantizedKVCache": EXACT,
    "Int8KVCache": EXACT,
    "Int4KVCache": EXACT,
    "_RotatedInt4": EXACT,
    "TurboQuantKVCache": EXACT,
    # windowed rings: the ring start depends on total history, so a block
    # at absolute position p is not context-free
    "RotatingKVCache": EXACT,
    "MixedWindowCache": EXACT,
    # opaque recurrent-state slots (SSM / delta rule / conv tails)
    "ArraysCache": EXACT,
}


def register_capability(cls_or_name, capability: str) -> None:
    """Declare the APC capability of a cache class (reference
    apc_adapters.register_capability)."""
    name = cls_or_name if isinstance(cls_or_name, str) else cls_or_name.__name__
    if capability not in (BLOCK, EXACT):
        raise ValueError(f"capability must be 'block' or 'exact': {capability}")
    _REGISTRY[name] = capability


def cache_capability(cache: Any) -> Optional[str]:
    """Classify one cache instance (reference resolve_capability).

    MRO walk by class name; composites (tuples/lists of caches) take the
    weakest child capability; unregistered snapshotable pytrees degrade to
    "exact"; anything else is None (APC off)."""
    if isinstance(cache, (tuple, list)):
        caps = [cache_capability(c) for c in cache]
        if not caps or any(c is None for c in caps):
            return None
        return BLOCK if all(c == BLOCK for c in caps) else EXACT
    for cls in type(cache).__mro__:
        cap = _REGISTRY.get(cls.__name__)
        if cap is not None:
            # a subclass of a block-pageable cache may have extra state the
            # harvester doesn't know about — demote to exact unless the
            # subclass registered itself (reference MRO-demotion rule)
            if cap == BLOCK and cls is not type(cache):
                return EXACT
            return cap
    import dataclasses

    if dataclasses.is_dataclass(cache) and hasattr(cache, "offset"):
        # the model-zoo cache contract: a registered-dataclass pytree with
        # a write cursor — snapshotable whole via jax.device_get
        return EXACT
    return None


_MODE_CACHE: dict = {}


def model_apc_mode(model, kv_bits=None, kv_group_size: int = 64) -> Optional[str]:
    """APC strategy for ``model`` under the given KV-quant policy
    (reference apc.py model_apc_mode:4098).

    Builds one tiny probe cache through the same factory the generate paths
    use and classifies it; memoized per (family, kv policy, scheme env) so
    the probe allocation happens once per process."""
    key = (
        str(getattr(model, "config_dict", {}).get("model_type", "")) or
        type(model).__name__,
        None if not kv_bits else float(kv_bits),
        int(kv_group_size),
        os.environ.get("MLX_VLM_TPU_KV_SCHEME", ""),
    )
    if key in _MODE_CACHE:
        return _MODE_CACHE[key]
    from .generate.ar import make_cache

    try:
        import jax.numpy as jnp

        probe = make_cache(model, 1, 256, jnp.bfloat16,
                           kv_bits=kv_bits, kv_group_size=kv_group_size)
        mode = cache_capability(probe)
    except Exception:
        mode = None
    _MODE_CACHE[key] = mode
    return mode


__all__ = [
    "BLOCK",
    "EXACT",
    "register_capability",
    "cache_capability",
    "model_apc_mode",
]
