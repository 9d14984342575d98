"""DDTree best-first draft-tree construction + tree verification.

Role parity: reference mlx_vlm/speculative/ddtree.py (Algorithm 1:57 —
best-first enumeration of prefix-closed rank tuples by factorized log-prob,
Lemma-1 top-K reduction).  The reference exports the builder but never
wires it; here `tree_generate_step` also RUNS the tree against the target:
one forward over [bonus | tree nodes] with an ancestor-mask, a host walk
committing the deepest greedy-consistent path, and a replay forward that
rewrites the committed path's KV contiguously (tree rows are scattered, so
the cursor-rewind trick alone can't keep them).
"""

from __future__ import annotations

import dataclasses
import heapq
from typing import Generator, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class DDTreeNode:
    ranks: Tuple[int, ...]
    token_ids: Tuple[int, ...]
    log_prob: float
    depth: int
    parent: int = -1


def build_ddtree(drafter_logits: np.ndarray, budget: int,
                 slot_offset: int = 0) -> List[DDTreeNode]:
    """Best-first draft tree from per-depth marginals (Algorithm 1).

    drafter_logits: [L, V] (or [1, L, V]) logits of the block drafter, one
    row per draft depth.  Returns up to `budget` nodes in descending
    factorized log-probability; `parent` indexes earlier list entries
    (-1 = child of the root bonus token).
    """
    logits = np.asarray(drafter_logits)
    if logits.ndim == 3:
        logits = logits[0]
    logits = logits[slot_offset:]
    L, V = logits.shape
    if L <= 0 or budget <= 0:
        return []
    lse = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1))
    log_probs = logits - logits.max(-1, keepdims=True) - lse[:, None]
    K = min(budget, V)
    top_ids = np.argsort(-log_probs, axis=-1)[:, :K]
    top_lp = np.take_along_axis(log_probs, top_ids, axis=-1)

    def lp_of(ranks):
        return float(sum(top_lp[d][r - 1] for d, r in enumerate(ranks)))

    heap: list = []
    counter = 0
    heapq.heappush(heap, (-lp_of((1,)), counter, (1,), -1))
    counter += 1
    tree: List[DDTreeNode] = []
    while heap and len(tree) < budget:
        neg_lp, _, ranks, parent = heapq.heappop(heap)
        depth = len(ranks)
        tokens = tuple(int(top_ids[d][r - 1])
                       for d, r in enumerate(ranks))
        idx = len(tree)
        tree.append(DDTreeNode(ranks, tokens, -neg_lp, depth, parent))
        if ranks[-1] + 1 <= K:  # next sibling
            nr = ranks[:-1] + (ranks[-1] + 1,)
            heapq.heappush(heap, (-lp_of(nr), counter, nr, parent))
            counter += 1
        if depth < L:  # first child
            nr = ranks + (1,)
            heapq.heappush(heap, (-lp_of(nr), counter, nr, idx))
            counter += 1
    return tree


def tree_ancestor_mask(tree: List[DDTreeNode]) -> np.ndarray:
    """[B+1, B+1] bool over [bonus | nodes]: row i sees its ancestors."""
    n = len(tree)
    m = np.eye(n + 1, dtype=bool)
    m[:, 0] = True  # everyone sees the bonus root
    for i, node in enumerate(tree):
        j = node.parent
        while j != -1:
            m[i + 1, j + 1] = True
            j = tree[j].parent
    return m


def walk_tree(tree: List[DDTreeNode], greedy: np.ndarray) -> List[int]:
    """Deepest greedy-consistent path.

    greedy[0] is the target's greedy token after the bonus; greedy[i+1]
    after tree node i.  Returns the accepted node indices root-to-leaf.
    """
    path: List[int] = []
    parent = -1
    want = int(greedy[0])
    while True:
        nxt = None
        for i, node in enumerate(tree):
            if node.parent == parent and node.token_ids[-1] == want:
                nxt = i
                break
        if nxt is None:
            return path
        path.append(nxt)
        parent = nxt
        want = int(greedy[nxt + 1])


def tree_generate_step(
    inputs_embeds: jax.Array,  # [1, S, D]
    model,
    drafter,  # drafters.dflash.DFlashDrafter
    drafter_params: dict,
    *,
    max_tokens: int = 256,
    draft_block_size: Optional[int] = None,
    tree_budget: int = 8,
    stats=None,
) -> Generator[Tuple[np.ndarray, np.ndarray], None, None]:
    """Greedy tree-verified speculative decoding (lossless).

    Per round: the DFlash drafter's block logits feed build_ddtree; ONE
    target forward scores [bonus | tree]; the deepest greedy-consistent
    path commits; a replay forward rewrites the path KV contiguously and
    yields the next bonus + drafter context features.
    """
    from ..generate.ar import CACHE_BUCKET, make_cache
    from ..generate.common import round_up
    from .dflash import DFlashStats

    stats = stats if stats is not None else DFlashStats()
    params = model.params
    lm = model.language_model
    B, S, _ = inputs_embeds.shape
    assert B == 1
    bs = draft_block_size or drafter.config.block_size
    depth = bs - 1
    nb = tree_budget
    capacity = round_up(S + max_tokens + nb + depth + 2, CACHE_BUCKET)
    cache = make_cache(model, B, capacity, inputs_embeds.dtype)
    d_cache = drafter.init_cache(B, capacity, inputs_embeds.dtype)

    from functools import partial

    @partial(jax.jit, donate_argnums=(1,))
    def prefill_captured(p, cache, embeds, pos):
        lp = p["language_model"]
        hidden, cache, hiddens = lm.forward_captured(lp, embeds, cache, pos)
        logits = lm.logits(lp, hidden)[:, -1].astype(jnp.float32)
        return logits, cache, drafter.fuse_ctx(hiddens)

    @partial(jax.jit, donate_argnums=(1,), static_argnames=("n",))
    def replay(p, cache, seq, n):
        """Write KV for the committed [bonus | path] (length n) and return
        the next greedy token + fused capture."""
        lp = p["language_model"]
        embeds = lm.embed(lp, seq)
        pos = cache.offset + jnp.arange(n)[None, None, :]
        pos = jnp.broadcast_to(pos, (3, 1, n)).astype(jnp.int32)
        hidden, cache, hiddens = lm.forward_captured(lp, embeds, cache, pos)
        logits = lm.logits(lp, hidden)[:, -1].astype(jnp.float32)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return nxt, cache, drafter.fuse_ctx(hiddens)

    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, B, S)).copy()
    logits, cache, ctx = prefill_captured(
        params, cache, jnp.asarray(inputs_embeds), jnp.asarray(pos))
    d_cache = drafter.append_fn(S)(drafter_params, d_cache, ctx,
                                   jnp.asarray(S, jnp.int32))
    tok = int(np.asarray(jnp.argmax(logits, -1))[0])
    yield np.asarray([tok]), np.zeros((B,), np.float32)
    n = 1

    draft_logits = drafter.draft_logits_fn(lm, bs)
    while n < max_tokens:
        lgts = np.asarray(draft_logits(
            params, drafter_params, d_cache, jnp.asarray([tok], jnp.int32)))
        tree = build_ddtree(lgts[0], nb)
        seq = np.asarray([[tok] + [nd.token_ids[-1] for nd in tree]],
                         np.int32)
        depths = np.asarray([0] + [nd.depth for nd in tree], np.int32)
        amask = tree_ancestor_mask(tree)

        # NOTE: tree_verify must not see a causal mask over the block —
        # pass the ancestor mask through the language model via positions
        # trick is not possible generically, so verify runs the block with
        # a cache-reading forward whose in-block mask is the ancestor mask.
        greedy = np.asarray(_tree_forward(
            lm, params, cache, jnp.asarray(seq), jnp.asarray(depths),
            jnp.asarray(amask)))[0]
        path = walk_tree(tree, greedy)
        committed = [tree[i].token_ids[-1] for i in path]
        stats.record(len(committed), depth)

        # replay [bonus | path] to write contiguous KV + next bonus
        replay_seq = np.asarray([[tok] + committed], np.int32)
        nxt, cache, feats = replay(params, cache,
                                   jnp.asarray(replay_seq),
                                   n=len(committed) + 1)
        d_cache = drafter.append_fn(depth + 1)(
            drafter_params, d_cache,
            _pad_rows(feats, depth + 1),
            jnp.asarray(len(committed) + 1, jnp.int32))
        for t in committed + [int(np.asarray(nxt)[0])]:
            if n >= max_tokens:
                return
            yield np.asarray([t]), np.zeros((B,), np.float32)
            n += 1
        tok = int(np.asarray(nxt)[0])


def _pad_rows(feats: jax.Array, width: int) -> jax.Array:
    T = feats.shape[1]
    if T == width:
        return feats
    if T > width:
        return feats[:, :width]
    return jnp.pad(feats, ((0, 0), (0, width - T), (0, 0)))


_TREE_FWD_CACHE: dict = {}


def _tree_forward(lm, params, cache, seq, depths, amask):
    """Jitted read-only target forward over [bonus | tree] with the
    ancestor mask spliced into the in-block attention."""
    key = (id(lm), int(seq.shape[1]))
    fn = _TREE_FWD_CACHE.get(key)
    if fn is None:

        @jax.jit
        def fwd(p, cache, seq, depths, amask):
            lp = p["language_model"]
            embeds = lm.embed(lp, seq)
            T = seq.shape[1]
            pos = (cache.offset + depths)[None, None, :]
            pos = jnp.broadcast_to(pos, (3, 1, T)).astype(jnp.int32)
            hidden, _ = lm.forward_masked(lp, embeds, cache, pos, amask)
            logits = lm.logits(lp, hidden).astype(jnp.float32)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        fn = _TREE_FWD_CACHE[key] = fwd
    return fn(params, cache, seq, depths, amask)
