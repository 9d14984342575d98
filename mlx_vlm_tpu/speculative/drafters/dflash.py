"""DFlash drafter: block-parallel draft denoising over captured target
hidden states.

Role parity: reference mlx_vlm/speculative/drafters/qwen3_dflash/dflash.py
(DFlashDraftModel:120) + speculative/dflash.py (_dflash_rounds:75,
_dflash_next_block_size:16).  A small qwen3-style transformer drafts a WHOLE
block of tokens in one non-autoregressive forward: the proposal block
[bonus, mask, mask, ...] cross-attends to a running context of fused target
hidden states; logits come from the target's own lm_head.

TPU design:
- The drafter's decoder stack is scan-stacked like every model here — one
  compiled layer body for all layers.
- Context K/V live in a fixed-capacity index-written cache (core/cache.py);
  per-round appends are a padded fixed-width write (block-size wide) so the
  append program compiles once, with the valid count advancing the cursor.
- Proposal-block attention is one SDPA call over [cached-context | block]
  keys with a width mask — non-causal within the block by construction
  (DFlash denoises the block jointly, reference dflash.py:88-91).
- Rollback is free: rejected context rows sit past the cursor and are
  overwritten by the next append (no tensor trims).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import linear, rms_norm, swiglu_mlp
from ...core.rope import apply_rope, make_rope
from ...ops.attention import sdpa


@dataclasses.dataclass
class DFlashConfig:
    hidden_size: int
    intermediate_size: int
    num_attention_heads: int
    num_key_value_heads: int
    vocab_size: int
    num_hidden_layers: int = 5
    head_dim: Optional[int] = None
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000000.0
    mask_token_id: int = 0
    block_size: int = 16
    target_layer_ids: Tuple[int, ...] = (1, 8, 15, 22, 29)
    target_hidden_size: Optional[int] = None  # per captured target layer

    def __post_init__(self):
        if self.head_dim is None:
            self.head_dim = self.hidden_size // self.num_attention_heads
        if self.target_hidden_size is None:
            self.target_hidden_size = self.hidden_size


class DFlashDrafter:
    """params = {"fc": Linear(nc*Dt -> D), "hidden_norm", "layers" (stacked:
    input_layernorm / self_attn{q,k,v,o,q_norm,k_norm} /
    post_attention_layernorm / mlp), "norm"}.  Embeddings and lm_head are
    borrowed from the target at draft time (reference bind(), dflash.py:143).
    """

    def __init__(self, config: DFlashConfig):
        self.config = config
        c = config
        self.n_heads = c.num_attention_heads
        self.n_kv_heads = c.num_key_value_heads
        self.head_dim = c.head_dim
        self.scale = self.head_dim**-0.5
        self.rope = make_rope(self.head_dim, c.rope_theta)
        self._append_fns: dict = {}
        self._draft_fns: dict = {}

    def init_cache(self, batch_size: int, capacity: int, dtype=jnp.float32):
        return cache_lib.init_cache(
            self.config.num_hidden_layers, batch_size, self.n_kv_heads,
            self.head_dim, capacity, dtype)

    def fuse_ctx(self, hiddens: jax.Array) -> jax.Array:
        """[L, B, S, Dt] captured target stack -> [B, S, nc*Dt]."""
        picks = [hiddens[i] for i in self.config.target_layer_ids]
        return jnp.concatenate(picks, axis=-1)

    # ------------------------------------------------------------- internals
    def _ctx_embed(self, params, ctx: jax.Array) -> jax.Array:
        """Fused target hidden -> drafter context stream [B, T, D]."""
        c = self.config
        return rms_norm(params["hidden_norm"], linear(params["fc"], ctx),
                        c.rms_norm_eps)

    def _ctx_kv(self, lp, x_ctx, pos):
        """One layer's context K/V for appending: [B, Hkv, T, hd] each."""
        B, T, _ = x_ctx.shape
        c = self.config
        y = rms_norm(lp["input_layernorm"], x_ctx, c.rms_norm_eps)
        k = linear(lp["self_attn"]["k_proj"], y).reshape(
            B, T, self.n_kv_heads, self.head_dim)
        k = rms_norm(lp["self_attn"]["k_norm"], k, c.rms_norm_eps)
        k = k.transpose(0, 2, 1, 3)
        v = linear(lp["self_attn"]["v_proj"], y).reshape(
            B, T, self.n_kv_heads, self.head_dim).transpose(0, 2, 1, 3)
        cos, sin = self.rope.cos_sin(pos)
        _, k = apply_rope(k, k, cos, sin)
        return k, v

    # --------------------------------------------------------------- appends
    def append_fn(self, seg_len: int):
        """Jitted program writing `seg_len` context rows at the cursor and
        advancing it by the (dynamic) valid count."""
        if seg_len in self._append_fns:
            return self._append_fns[seg_len]

        @partial(jax.jit, donate_argnums=(1,))
        def append(dparams, cache, ctx, n_valid):
            # ctx [B, seg_len, nc*Dt]; rows >= n_valid are padding — they
            # land past the advanced cursor and get overwritten next round.
            B = ctx.shape[0]
            x_ctx = self._ctx_embed(dparams, ctx)
            pos = cache.offset + jnp.arange(seg_len, dtype=jnp.int32)
            pos = jnp.broadcast_to(pos[None], (B, seg_len))

            def layer(off, xs):
                lp, kc, vc = xs
                k, v = self._ctx_kv(lp, x_ctx, pos)
                kc, vc = cache_lib.update_layer(kc, vc, k, v, off)
                return off, (kc, vc)

            _, (ks, vs) = jax.lax.scan(
                layer, cache.offset, (dparams["layers"], cache.k, cache.v))
            return dataclasses.replace(
                cache, k=ks, v=vs, offset=cache.offset + n_valid)

        self._append_fns[seg_len] = append
        return append

    # ---------------------------------------------------------------- drafts
    def draft_fn(self, target_lm, block_size: int):
        """Jitted non-autoregressive block draft.

        (target_params, drafter_params, cache, bonus [B]) ->
        draft tokens [B, block_size-1].  The cache is read-only here — the
        proposal block's K/V are used in-flight and never stored.
        """
        key = (id(target_lm), block_size)
        if key in self._draft_fns:
            return self._draft_fns[key]
        c = self.config
        bs = block_size

        @jax.jit
        def draft(tparams, dparams, cache, bonus):
            B = bonus.shape[0]
            tlp = tparams["language_model"]
            block = jnp.concatenate(
                [bonus[:, None],
                 jnp.full((B, bs - 1), c.mask_token_id, jnp.int32)], axis=1)
            h = target_lm.embed(tlp, block)  # [B, bs, D]
            pos = cache.offset + jnp.arange(bs, dtype=jnp.int32)
            pos = jnp.broadcast_to(pos[None], (B, bs))
            cos, sin = self.rope.cos_sin(pos)
            C = cache.capacity
            # [1, 1, 1, C+bs]: context valid below the cursor, block fully
            # visible (non-causal denoising)
            mask = jnp.concatenate(
                [jnp.arange(C) < cache.offset, jnp.ones((bs,), bool)]
            )[None, None, None, :]

            def layer(h, xs):
                lp, kc, vc = xs
                y = rms_norm(lp["input_layernorm"], h, c.rms_norm_eps)
                q = linear(lp["self_attn"]["q_proj"], y).reshape(
                    B, bs, self.n_heads, self.head_dim)
                q = rms_norm(lp["self_attn"]["q_norm"], q, c.rms_norm_eps)
                q = q.transpose(0, 2, 1, 3)
                pk = linear(lp["self_attn"]["k_proj"], y).reshape(
                    B, bs, self.n_kv_heads, self.head_dim)
                pk = rms_norm(lp["self_attn"]["k_norm"], pk, c.rms_norm_eps)
                pk = pk.transpose(0, 2, 1, 3)
                pv = linear(lp["self_attn"]["v_proj"], y).reshape(
                    B, bs, self.n_kv_heads, self.head_dim).transpose(
                    0, 2, 1, 3)
                q, pk = apply_rope(q, pk, cos, sin)
                keys = jnp.concatenate([kc, pk.astype(kc.dtype)], axis=2)
                vals = jnp.concatenate([vc, pv.astype(vc.dtype)], axis=2)
                o = sdpa(q, keys, vals, self.scale, mask)
                o = o.transpose(0, 2, 1, 3).reshape(B, bs, -1)
                h = h + linear(lp["self_attn"]["o_proj"], o)
                y2 = rms_norm(lp["post_attention_layernorm"], h,
                              c.rms_norm_eps)
                h = h + swiglu_mlp(lp["mlp"], y2)
                return h, None

            h, _ = jax.lax.scan(layer, h,
                                (dparams["layers"], cache.k, cache.v))
            h = rms_norm(dparams["norm"], h, c.rms_norm_eps)
            logits = target_lm.logits(tlp, h[:, 1:])  # positions 1..bs-1
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        self._draft_fns[key] = draft
        return draft

    def draft_logits_fn(self, target_lm, block_size: int):
        """Like draft_fn but returns the full per-depth logits
        [B, block_size-1, V] — feeds DDTree construction
        (speculative/ddtree.py build_ddtree)."""
        key = (id(target_lm), block_size, "logits")
        if key in self._draft_fns:
            return self._draft_fns[key]
        argmax_key = (id(target_lm), block_size)
        # share the block forward with draft_fn via a logits-returning twin
        c = self.config
        bs = block_size
        base = self.draft_fn(target_lm, bs)
        del base, argmax_key

        @jax.jit
        def draft_logits(tparams, dparams, cache, bonus):
            B = bonus.shape[0]
            tlp = tparams["language_model"]
            block = jnp.concatenate(
                [bonus[:, None],
                 jnp.full((B, bs - 1), c.mask_token_id, jnp.int32)], axis=1)
            h = target_lm.embed(tlp, block)
            pos = cache.offset + jnp.arange(bs, dtype=jnp.int32)
            pos = jnp.broadcast_to(pos[None], (B, bs))
            cos, sin = self.rope.cos_sin(pos)
            C = cache.capacity
            mask = jnp.concatenate(
                [jnp.arange(C) < cache.offset, jnp.ones((bs,), bool)]
            )[None, None, None, :]

            def layer(h, xs):
                lp, kc, vc = xs
                y = rms_norm(lp["input_layernorm"], h, c.rms_norm_eps)
                q = linear(lp["self_attn"]["q_proj"], y).reshape(
                    B, bs, self.n_heads, self.head_dim)
                q = rms_norm(lp["self_attn"]["q_norm"], q, c.rms_norm_eps)
                q = q.transpose(0, 2, 1, 3)
                pk = linear(lp["self_attn"]["k_proj"], y).reshape(
                    B, bs, self.n_kv_heads, self.head_dim)
                pk = rms_norm(lp["self_attn"]["k_norm"], pk, c.rms_norm_eps)
                pk = pk.transpose(0, 2, 1, 3)
                pv = linear(lp["self_attn"]["v_proj"], y).reshape(
                    B, bs, self.n_kv_heads, self.head_dim).transpose(
                    0, 2, 1, 3)
                q, pk = apply_rope(q, pk, cos, sin)
                keys = jnp.concatenate([kc, pk.astype(kc.dtype)], axis=2)
                vals = jnp.concatenate([vc, pv.astype(vc.dtype)], axis=2)
                o = sdpa(q, keys, vals, self.scale, mask)
                o = o.transpose(0, 2, 1, 3).reshape(B, bs, -1)
                h = h + linear(lp["self_attn"]["o_proj"], o)
                y2 = rms_norm(lp["post_attention_layernorm"], h,
                              c.rms_norm_eps)
                h = h + swiglu_mlp(lp["mlp"], y2)
                return h, None

            h, _ = jax.lax.scan(layer, h,
                                (dparams["layers"], cache.k, cache.v))
            h = rms_norm(dparams["norm"], h, c.rms_norm_eps)
            return target_lm.logits(tlp, h[:, 1:]).astype(jnp.float32)

        self._draft_fns[key] = draft_logits
        return draft_logits


def next_block_size(stats, ceiling: int, remaining: int,
                    window: int = 8) -> int:
    """Acceptance-adaptive block sizing (reference
    _dflash_next_block_size:16): back off fast when deep positions are
    rejected, grow back on sustained near-full acceptance.  Sizes snap to
    {4, 8, ceiling} so at most three programs ever compile."""
    bs = min(ceiling, remaining)
    if bs <= 1:
        return bs
    recent = stats.recent[-window:]
    if not recent:
        return bs
    drafted = sum(d for _, d in recent)
    accepted = sum(a for a, _ in recent)
    rate = accepted / max(drafted, 1)
    if rate < 0.30:
        return min(bs, 4)
    if rate < 0.60:
        return min(bs, 8)
    return bs


def init_dflash_params(config: DFlashConfig, seed: int = 0,
                       scale: float = 0.05, dtype=jnp.float32) -> dict:
    """Random drafter params (checkpoint loading maps the same tree)."""
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return jnp.asarray(rng.standard_normal(shape) * scale, dtype)

    c = config
    D, I = c.hidden_size, c.intermediate_size
    hd = c.head_dim
    nc = len(c.target_layer_ids)
    L = c.num_hidden_layers

    def stack(f):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *[f() for _ in
                                                         range(L)])

    def one_layer():
        return {
            "input_layernorm": {"weight": jnp.ones(D, dtype)},
            "post_attention_layernorm": {"weight": jnp.ones(D, dtype)},
            "self_attn": {
                "q_proj": {"weight": rand(c.num_attention_heads * hd, D)},
                "k_proj": {"weight": rand(c.num_key_value_heads * hd, D)},
                "v_proj": {"weight": rand(c.num_key_value_heads * hd, D)},
                "o_proj": {"weight": rand(D, c.num_attention_heads * hd)},
                "q_norm": {"weight": jnp.ones(hd, dtype)},
                "k_norm": {"weight": jnp.ones(hd, dtype)},
            },
            "mlp": {
                "gate_proj": {"weight": rand(I, D)},
                "up_proj": {"weight": rand(I, D)},
                "down_proj": {"weight": rand(D, I)},
            },
        }

    return {
        "fc": {"weight": rand(D, nc * c.target_hidden_size)},
        "hidden_norm": {"weight": jnp.ones(D, dtype)},
        "layers": stack(one_layer),
        "norm": {"weight": jnp.ones(D, dtype)},
    }
