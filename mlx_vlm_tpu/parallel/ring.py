"""Sequence-parallel prefill via ring attention — the user-facing wiring.

Long-context capability the reference LACKS (SURVEY.md §5: mlx-vlm has no
ring attention / context parallelism).  `ring_prefill` runs a full-prompt
forward with every attention layer's prefill self-attention sharded along
the sequence axis of a device mesh: each chip holds S/P tokens of Q/K/V and
rotates the KV shard around the ICI ring (`ops/ring_attention.py`), so the
S×S score tensor never materializes on one chip and activation memory is
O(S/P) per device.

Wiring contract (kept deliberately explicit — opt-in, not covert):

- `sequence_parallel(mesh)` is a context manager.  While active,
  `KVCache.attend` routes *whole-prompt self-attention* (q_len == kv_len,
  cache offset PROVABLY zero at trace time, no left-pad/window/softcap/
  sinks) through the ring kernel instead of XLA SDPA.  Everything else —
  decode steps, jitted chunked-prefill continuations (whose offset is a
  tracer, hence unprovable), left-padded batches, exotic masks — falls
  through to the normal exact path.
- `ring_prefill(model, embeds, cache, position_ids, mesh)` is the
  one-call entry: whole-prompt forward under the context, returning
  (logits, cache) exactly like `model(...)`.

Constraints: rows must be unpadded (B == 1 or equal lengths — the ring
path assumes a pure causal mask) and S must divide by the mesh's seq-axis
size; otherwise the call silently uses the single-device path.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_STATE: Optional[tuple] = None  # (ring_fn, n_dev, seq_axis, min_tokens)


@contextlib.contextmanager
def sequence_parallel(mesh: Mesh, seq_axis: str = "data",
                      min_tokens: int = 256):
    """Enable ring-attention routing for prefill self-attention chunks.

    No-op (yields immediately) when the mesh's `seq_axis` has size 1.
    """
    global _STATE
    from ..ops.ring_attention import make_ring_attention

    n_dev = mesh.shape[seq_axis]
    if n_dev <= 1:
        yield
        return
    prev = _STATE
    _STATE = (
        make_ring_attention(mesh, seq_axis), n_dev, seq_axis, min_tokens
    )
    try:
        yield
    finally:
        _STATE = prev


def _known_zero(x) -> bool:
    """True iff `x` is a trace-time-KNOWN all-zero value.

    Traced values (e.g. the cache offset inside generate_step's jitted
    chunked prefill) are NOT known — they concretize with an error, which
    we treat as 'unknown' so the caller falls through to the exact path."""
    if x is None:
        return False
    try:
        import numpy as _np

        return bool(_np.all(_np.asarray(x) == 0))
    except Exception:  # Tracer concretization — value unknown at trace time
        return False


def maybe_ring_attend(q, k, v, scale, *, offset=None, left_pad=None,
                      window=None, logit_softcap=None, sinks=None):
    """Called from `KVCache.attend` at trace time.  Returns the ring
    attention output for this chunk, or None to use the normal path.

    `k`/`v` are the chunk's NEW keys/values (pre cache write), so
    q_len == kv_len identifies a self-attention prefill chunk — but that
    shape check alone CANNOT distinguish a whole prompt from a chunked-
    prefill continuation (q_len == kv_len with cache offset > 0), whose
    cached context the ring kernel would silently drop.  Routing therefore
    additionally requires `offset` to be a trace-time-KNOWN zero and
    `left_pad` a known all-zero (the ring kernel assumes a pure causal
    mask from position 0) — `ring_prefill` passes both as concrete
    constants; jitted chunked prefill passes tracers and falls through."""
    if _STATE is None:
        return None
    if window is not None or logit_softcap is not None or sinks is not None:
        return None
    if not _known_zero(offset):
        return None
    if left_pad is not None and not _known_zero(left_pad):
        return None
    fn, n_dev, _, min_tokens = _STATE
    S = q.shape[2]
    if k.shape[2] != S or S < min_tokens or S % n_dev:
        return None
    nh, nkv = q.shape[1], k.shape[1]
    if nh != nkv:  # ring kernel is MHA-shaped; expand GQA heads
        k = jnp.repeat(k, nh // nkv, axis=1)
        v = jnp.repeat(v, nh // nkv, axis=1)
    return fn(q, k, v, scale)


def ring_prefill(model, embeds, cache, position_ids, mesh: Mesh,
                 seq_axis: str = "data", min_tokens: int = 256):
    """Whole-prompt prefill with sequence-parallel ring attention.

    Shards `embeds` along S over `seq_axis`, traces the model forward with
    the ring context active (a fresh jit per call — use for long prompts
    where the compile is amortized by the prefill itself), and returns
    (logits, cache) like `model(params, embeds, cache, position_ids)`.
    """
    import dataclasses

    import numpy as np

    spec = NamedSharding(mesh, P(None, seq_axis, None))
    embeds = jax.device_put(embeds, spec)
    B = embeds.shape[0]
    lp0 = np.zeros((B,), np.int32)
    with sequence_parallel(mesh, seq_axis, min_tokens=min_tokens):
        # offset/left_pad enter the trace as CONCRETE zeros (constants, not
        # jit arguments): maybe_ring_attend routes only when it can PROVE
        # the chunk is a whole prompt (see its docstring)
        @jax.jit
        def fwd(params, embeds, k, v):
            c = dataclasses.replace(
                cache, k=k, v=v, offset=jnp.asarray(0, jnp.int32),
                left_pad=jnp.asarray(lp0))
            return model(params, embeds, c, position_ids)

        logits, cache = fwd(model.params, embeds, cache.k, cache.v)
    return logits, cache
