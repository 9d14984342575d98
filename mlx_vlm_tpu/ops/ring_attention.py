"""Ring attention: sequence-parallel exact attention over the device mesh.

This is the long-context capability the reference *lacks* (SURVEY.md §5:
"no ring attention / context parallelism"): Q, K, V are sharded along the
sequence axis; each device holds one KV block and rotates it around the
ring with `jax.lax.ppermute` while accumulating its local queries' attention
with an online (flash-style) softmax merge.  KV movement rides ICI
neighbor links; peak memory per chip is O(S/P).

Built with `shard_map` so XLA sees the per-device program; on TPU pods the
ppermute lowers to ICI collective-permute (the Pallas RDMA variant in
/opt/skills/guides/pallas_guide.md §18 is the kernel-level follow-up).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def make_ring_attention(mesh: Mesh, seq_axis: str = "data", causal: bool = True):
    """Returns `fn(q, k, v, scale) -> out` with q/k/v [B, H, S, D] sharded on
    S over `seq_axis`."""
    from jax.experimental.shard_map import shard_map

    n_dev = mesh.shape[seq_axis]
    spec = P(None, None, seq_axis, None)

    def local(q, k, v, scale):
        idx = jax.lax.axis_index(seq_axis)
        B, H, Sq, D = q.shape
        Sk = k.shape[2]
        qf = q.astype(jnp.float32)
        m = jnp.full((B, H, Sq, 1), _NEG, jnp.float32)
        l = jnp.zeros((B, H, Sq, 1), jnp.float32)
        o = jnp.zeros((B, H, Sq, D), jnp.float32)
        q_pos = idx * Sq + jax.lax.broadcasted_iota(jnp.int32, (Sq, Sk), 0)

        def body(p, carry):
            k_cur, v_cur, m, l, o = carry
            src = (idx - p) % n_dev  # global chunk index currently held
            scores = jnp.einsum(
                "bhsd,bhtd->bhst", qf, k_cur.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ) * scale
            if causal:
                k_pos = src * Sk + jax.lax.broadcasted_iota(
                    jnp.int32, (Sq, Sk), 1
                )
                scores = jnp.where(
                    (k_pos <= q_pos)[None, None], scores, _NEG
                )
            m_new = jnp.maximum(m, scores.max(-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p_ = jnp.exp(scores - m_new)
            l = l * alpha + p_.sum(-1, keepdims=True)
            o = o * alpha + jnp.einsum(
                "bhst,bhtd->bhsd", p_, v_cur.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
            k_nxt = jax.lax.ppermute(k_cur, seq_axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, seq_axis, perm)
            return (k_nxt, v_nxt, m_new, l, o)

        _, _, m, l, o = jax.lax.fori_loop(0, n_dev, body, (k, v, m, l, o))
        return (o / jnp.maximum(l, 1e-20)).astype(q.dtype)

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, P()),
        out_specs=spec,
        check_rep=False,
    )

    def fn(q, k, v, scale):
        scale_arr = jnp.asarray(scale, jnp.float32)
        q = jax.device_put(q, NamedSharding(mesh, spec))
        k = jax.device_put(k, NamedSharding(mesh, spec))
        v = jax.device_put(v, NamedSharding(mesh, spec))
        return mapped(q, k, v, scale_arr)

    return fn
