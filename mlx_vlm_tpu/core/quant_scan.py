"""Closure-threading for quantized stacked weights inside `lax.scan`.

Problem: layer scans take stacked per-layer params as scan `xs`, which
dynamic-slices every leaf each iteration.  XLA fuses those slices into its
own dots for free, but a slice feeding a Pallas custom call materializes a
copy — tripling HBM traffic on the decode hot path.

Solution: pull Int4GroupedTensor leaves OUT of the scan xs (replacing them
with childless `Int4ScanRef` pytree nodes so scan sees nothing to slice),
scan over an extra `arange(L)` index, and let the body re-bind the full
stacked tensors through a trace-time context.  `core.layers.linear`
resolves the refs and calls the scalar-prefetch kernel in
ops/int4_matvec.py, which indexes the resident stacked buffer directly.

Usage (see models/llama/language.py):

    h, ys = scan_layers(body, h, mp["layers"], extra_xs)
    # body(carry, lp, *extra_slices) -> (carry, y)
"""

from __future__ import annotations

import dataclasses
from contextlib import contextmanager

import jax
import jax.numpy as jnp

from .quant import Int4GroupedTensor

__all__ = ["Int4ScanRef", "scan_layers", "resolve_scan_ref"]


@dataclasses.dataclass(frozen=True)
class Int4ScanRef:
    """Placeholder for a stacked Int4GroupedTensor pulled out of scan xs.

    Registered as a pytree node with NO children, so `lax.scan` has
    nothing to slice; `linear` resolves it via the active scan context.
    """

    key: int


jax.tree_util.register_pytree_node(
    Int4ScanRef,
    lambda r: ((), r.key),
    lambda key, _: Int4ScanRef(key),
)

_ACTIVE: list = []  # stack of (quant_tensors, layer_index)


def _split(layers):
    quant = []

    def repl(leaf):
        if isinstance(leaf, Int4GroupedTensor):
            quant.append(leaf)
            return Int4ScanRef(len(quant) - 1)
        return leaf

    xs = jax.tree_util.tree_map(
        repl, layers,
        is_leaf=lambda l: isinstance(l, Int4GroupedTensor))
    return xs, quant


@contextmanager
def _active(quant, idx):
    _ACTIVE.append((quant, idx))
    try:
        yield
    finally:
        _ACTIVE.pop()


def resolve_scan_ref(ref: Int4ScanRef):
    """-> (stacked Int4GroupedTensor, traced layer index)."""
    if not _ACTIVE:
        raise RuntimeError(
            "Int4ScanRef outside a scan_layers body — quantized stacked "
            "weights must be scanned via core.quant_scan.scan_layers")
    quant, idx = _ACTIVE[-1]
    return quant[ref.key], idx


def scan_layers(body, carry, layers, *extra, remat: bool = False):
    """`lax.scan` over stacked layer params, routing Int4GroupedTensor
    leaves through the no-copy closure path.

    body(carry, lp, *extra_slices) -> (carry, y)
    """
    xs_layers, quant = _split(layers)
    if not quant:
        def plain(c, xs):
            return body(c, xs[0], *xs[1:])

        fn = jax.checkpoint(plain) if remat else plain
        return jax.lax.scan(fn, carry, (xs_layers, *extra))

    L = jax.tree_util.tree_leaves(xs_layers)[0].shape[0]

    def wrapped(c, xs):
        i, lp, *ex = xs
        with _active(quant, i):
            return body(c, lp, *ex)

    fn = jax.checkpoint(wrapped) if remat else wrapped
    return jax.lax.scan(
        fn, carry, (jnp.arange(L, dtype=jnp.int32), xs_layers, *extra))
