"""MiniMax M3 language model: block-sparse MSA + sigmoid-routed MoE.

Role parity: reference mlx_vlm/models/minimax_m3_vl/language.py —
MiniMaxAttention (:987, partial rotary + gemma qk norms + lightning
indexer), MiniMaxM3Indexer (:1521, per-block max scores + forced
init/local blocks + topk selection), MiniMaxSparseMoeBlock (:1720, sigmoid
scores + aux-free bias + routed_scaling), MiniMaxSwiGLUOAI (:509 clipped
gated activation), MiniMaxM3KVCache (:549, main KV + side index-key cache).

TPU design decisions:
- The sparse selector is a fully vectorized mask-program over the static
  cache capacity: index scores -> per-block max -> forced init/local ->
  top-k -> block membership expanded with a static `jnp.repeat` into the
  attention mask.  No dynamic shapes; selection is exact w.r.t. the
  reference because when <= topk blocks are valid, top-k keeps all of them
  (dense equivalence), so the sparse program can be enabled purely on the
  static capacity (capacity > block * topk).
- Dense-prefix / sparse+MoE-suffix layers run as two homogeneous
  `lax.scan` groups (the M3 layer pattern: first 3 layers dense).
- The index-key cache is an extra [L_sparse, B, 1, C, Di] buffer on a
  cache subclass; kv_bits quantizes main KV while index keys stay in
  model dtype (they are tiny: 1 head).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import embedding, embedding_as_linear, linear, rms_norm
from ...core.mask import causal_cache_mask
from ...core.moe import switch_glu
from ...core.rope import default_inv_freq, rope_cos_sin
from ...ops.attention import sdpa
from .config import ModelConfig, TextConfig


# --------------------------------------------------------------------- cache
@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "offset", "left_pad", "ik"],
    meta_fields=[],
)
@dataclasses.dataclass
class MiniMaxKVCache(cache_lib.KVCache):
    """KVCache + side index-key buffer (reference MiniMaxM3KVCache:549)."""

    ik: jax.Array = None  # [L_sparse, B, 1, C, Di]

    def scan_arrays(self):  # dense fields only; ik is sliced by the LM
        return (self.k, self.v)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["kq", "ks", "kb", "vq", "vs", "vb", "offset", "left_pad", "ik"],
    meta_fields=["bits", "group_size"],
)
@dataclasses.dataclass
class MiniMaxQuantizedKVCache(cache_lib.QuantizedKVCache):
    ik: jax.Array = None

    def scan_arrays(self):
        return (self.kq, self.ks, self.kb, self.vq, self.vs, self.vb)


# ----------------------------------------------------------------- primitives
def swiglu_oai(gate: jax.Array, up: jax.Array, alpha: float, limit: float,
               beta: float) -> jax.Array:
    """Clipped gated activation (reference _swiglu_oai:509):
    clip(gate) * sigmoid(alpha * clip(gate)) * (clip(up) + beta)."""
    g = jnp.clip(gate, None, limit)
    u = jnp.clip(up, -limit, limit)
    return g * jax.nn.sigmoid(alpha * g) * (u + beta)


def minimax_router(
    x: jax.Array,  # [N, D]
    gate_w: jax.Array,
    bias: Optional[jax.Array],
    top_k: int,
    routed_scaling_factor: float,
    scoring_func: str,
):
    """Sigmoid/softmax scores; aux-free bias affects selection only
    (reference _minimax_moe_select:87)."""
    logits = linear({"weight": gate_w}, x.astype(jnp.float32)).astype(jnp.float32)
    if scoring_func == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)
    sel = scores if bias is None else scores + bias.astype(jnp.float32)[None]
    _, inds = jax.lax.top_k(sel, top_k)
    weights = jnp.take_along_axis(scores, inds, axis=-1)
    weights = weights / (weights.sum(-1, keepdims=True) + 1e-20)
    return inds, weights * routed_scaling_factor


def apply_rope_partial(q, k, cos, sin, rot_dim: int):
    """Half-split rotation on the first rot_dim dims; the rest pass through
    (reference rotary_dim = head_dim * partial_rotary_factor)."""
    from ...core.rope import apply_rope

    q_rot, q_pass = q[..., :rot_dim], q[..., rot_dim:]
    k_rot, k_pass = k[..., :rot_dim], k[..., rot_dim:]
    q_rot, k_rot = apply_rope(q_rot, k_rot, cos, sin)
    return (
        jnp.concatenate([q_rot, q_pass], axis=-1),
        jnp.concatenate([k_rot, k_pass], axis=-1),
    )


class LanguageModel:
    def __init__(self, args: TextConfig, config: Optional[ModelConfig] = None):
        self.args = args
        self.config = config
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.head_dim or args.hidden_size // args.num_attention_heads
        self.rotary_dim = args.rotary_dim
        self.scale = self.head_dim**-0.5
        self.inv_freq = jnp.asarray(
            default_inv_freq(self.rotary_dim, args.rope_theta), jnp.float32
        )
        sc = args.sparse_attention_config
        self.index_dim = sc["sparse_index_dim"]
        self.index_heads = sc["sparse_num_index_heads"]
        self.block_size = sc["sparse_block_size"]
        self.topk_blocks = sc["sparse_topk_blocks"]
        self.init_blocks = sc["sparse_init_block"]
        self.local_blocks = sc["sparse_local_block"]

        L = args.num_hidden_layers
        moe = [args.is_moe_layer(i) for i in range(L)]
        sparse = [args.has_sparse_index(i) for i in range(L)]
        if moe != sparse:
            raise ValueError(
                "minimax_m3 requires aligned MoE/sparse layer patterns "
                f"(moe={moe}, sparse={sparse})"
            )
        self.n_pre = moe.index(True) if True in moe else L
        if moe[self.n_pre :] != [True] * (L - self.n_pre):
            raise ValueError(
                "minimax_m3 requires a dense-prefix + sparse-MoE-suffix "
                f"layer pattern (got {moe})"
            )
        self.n_main = L - self.n_pre
        self.norm_offset = 1.0 if args.use_gemma_norm else 0.0

    # ------------------------------------------------------------------ jit
    def __call__(self, params, inputs_embeds, cache, position_ids):
        B, S, _ = inputs_embeds.shape
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos, sin = rope_cos_sin(position_ids, self.inv_freq)
        h = inputs_embeds
        mp = params["model"]
        eps = self.args.rms_norm_eps

        if cache is None:
            zero = jnp.zeros((), jnp.int32)
            mask = causal_cache_mask(zero, jnp.zeros((B,), jnp.int32), S, S)

            def dense_body(h, lp):
                h = self._layer(lp, h, cos, sin, mask, None, None, None)[0]
                return h, None

            def main_body(h, lp):
                h = self._layer(lp, h, cos, sin, mask, None, None, None,
                                moe=True)[0]
                return h, None

            if "dense_pre" in mp:
                h, _ = jax.lax.scan(dense_body, h, mp["dense_pre"])
            if "main_layers" in mp:
                h, _ = jax.lax.scan(main_body, h, mp["main_layers"])
            return rms_norm(mp["norm"], h, eps, offset=self.norm_offset), None

        mask = causal_cache_mask(cache.offset, cache.left_pad, S, cache.capacity)
        kv = cache.scan_arrays()
        new_parts = []

        if self.n_pre:
            part = jax.tree.map(lambda a: a[: self.n_pre], kv)

            def dense_body(h, xs):
                lp, cxs = xs
                h, cxs, _ = self._layer(lp, h, cos, sin, mask, cache, cxs, None)
                return h, cxs

            h, ys = jax.lax.scan(dense_body, h, (mp["dense_pre"], part))
            new_parts.append(ys)

        if self.n_main:
            part = jax.tree.map(lambda a: a[self.n_pre :], kv)

            def main_body(h, xs):
                lp, cxs, ik = xs
                h, cxs, ik = self._layer(
                    lp, h, cos, sin, mask, cache, cxs, ik,
                    moe=True, position_ids=position_ids,
                )
                return h, (cxs, ik)

            h, (ys, ik_y) = jax.lax.scan(
                main_body, h, (mp["main_layers"], part, cache.ik)
            )
            new_parts.append(ys)
        else:
            ik_y = cache.ik

        ys = jax.tree.map(lambda *p: jnp.concatenate(p, axis=0), *new_parts)
        h = rms_norm(mp["norm"], h, eps, offset=self.norm_offset)
        new_cache = cache.with_arrays(ys, S)
        new_cache = dataclasses.replace(new_cache, ik=ik_y)
        return h, new_cache

    # ----------------------------------------------------------- layer bodies
    def _layer(self, lp, h, cos, sin, mask, cache, cxs, ik, moe=False,
               position_ids=None):
        eps = self.args.rms_norm_eps
        off = self.norm_offset
        x = rms_norm(lp["input_layernorm"], h, eps, offset=off)
        attn, cxs, ik = self._attention(
            lp["self_attn"], x, cos, sin, mask, cache, cxs, ik, position_ids
        )
        h = h + attn
        x = rms_norm(lp["post_attention_layernorm"], h, eps, offset=off)
        if moe:
            h = h + self._moe_mlp(lp["block_sparse_moe"], x)
        else:
            h = h + self._dense_mlp(lp["mlp"], x)
        return h, cxs, ik

    def _dense_mlp(self, p, x):
        a = self.args
        return linear(
            p["down_proj"],
            swiglu_oai(
                linear(p["gate_proj"], x), linear(p["up_proj"], x),
                a.swiglu_alpha, a.swiglu_limit, a.swiglu_beta,
            ),
        )

    def _moe_mlp(self, p, x):
        a = self.args
        B, S, D = x.shape
        flat = x.reshape(B * S, D)
        inds, wts = minimax_router(
            flat, p["gate"]["weight"], p.get("e_score_correction_bias"),
            a.num_experts_per_tok, a.routed_scaling_factor, a.scoring_func,
        )
        e = p["experts"]
        act2 = lambda g, u: swiglu_oai(  # noqa: E731
            g, u, a.swiglu_alpha, a.swiglu_limit, a.swiglu_beta
        )
        y = switch_glu(
            flat, e["gate_proj"]["weight"], e["up_proj"]["weight"],
            e["down_proj"]["weight"], inds, wts.astype(jnp.float32), act2=act2,
        )
        if "shared_experts" in p:
            y = y + self._dense_mlp(p["shared_experts"], flat)
        return y.reshape(B, S, D)

    # ------------------------------------------------------------- attention
    def _attention(self, p, x, cos, sin, mask, cache, cxs, ik, position_ids):
        a = self.args
        B, S, _ = x.shape
        q = linear(p["q_proj"], x).reshape(B, S, self.n_heads, self.head_dim)
        k = linear(p["k_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        v = linear(p["v_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        if a.use_qk_norm:
            q = rms_norm(p["q_norm"], q, a.rms_norm_eps, offset=self.norm_offset)
            k = rms_norm(p["k_norm"], k, a.rms_norm_eps, offset=self.norm_offset)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        q, k = apply_rope_partial(q, k, cos, sin, self.rotary_dim)

        if cache is None:
            out = sdpa(q, k, v, self.scale, mask)
            out = out.transpose(0, 2, 1, 3).reshape(B, S, -1)
            return linear(p["o_proj"], out), cxs, ik

        if ik is not None:
            capacity = cache.capacity
            if capacity > self.block_size * self.topk_blocks:
                ik, sel_mask = self._sparse_select(
                    p, x, cos, sin, mask, cache, ik, position_ids
                )
                mask = mask & sel_mask
            else:
                ik = self._update_index_keys(p, x, cos, sin, cache, ik)

        out, cxs = cache.attend(cxs, q, k, v, self.scale, mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, -1)
        return linear(p["o_proj"], out), cxs, ik

    def _index_qk(self, p, x, cos, sin):
        a = self.args
        B, S, _ = x.shape
        iq = linear(p["index_q_proj"], x).reshape(
            B, S, self.index_heads, self.index_dim
        )
        ikn = linear(p["index_k_proj"], x).reshape(B, S, 1, self.index_dim)
        iq = rms_norm(p["index_q_norm"], iq, a.rms_norm_eps,
                      offset=self.norm_offset)
        ikn = rms_norm(p["index_k_norm"], ikn, a.rms_norm_eps,
                       offset=self.norm_offset)
        iq = iq.transpose(0, 2, 1, 3)
        ikn = ikn.transpose(0, 2, 1, 3)
        iq, ikn = apply_rope_partial(iq, ikn, cos, sin, self.rotary_dim)
        return iq, ikn

    def _update_index_keys(self, p, x, cos, sin, cache, ik):
        _, ikn = self._index_qk(p, x, cos, sin)
        ik, _ = cache_lib.update_layer_auto(ik, ik, ikn, ikn, cache.offset)
        return ik

    def _sparse_select(self, p, x, cos, sin, mask, cache, ik, position_ids):
        """Top-k block mask (reference select_blocks:1577 + build_block_mask
        :1695 as one vectorized program)."""
        B, S, _ = x.shape
        bs, topk = self.block_size, self.topk_blocks
        C = cache.capacity
        nb = C // bs
        iq, ikn = self._index_qk(p, x, cos, sin)
        ik, _ = cache_lib.update_layer_auto(ik, ik, ikn, ikn, cache.offset)

        scores = jnp.einsum(
            "bhsd,bokd->bhsk", iq.astype(jnp.float32),
            ik.astype(jnp.float32),
        ) * self.scale  # [B, Hi, S, C]
        valid = mask  # [B, 1, S, C] bool (causal + left-pad + capacity)
        neg = jnp.float32(-1e30)
        scores = jnp.where(valid, scores, neg)
        block_scores = scores.reshape(B, -1, S, nb, bs).max(-1).max(1)  # [B,S,nb]
        valid_blocks = valid.reshape(B, 1, S, nb, bs).any(-1)[:, 0]  # [B,S,nb]

        if position_ids is None:
            qpos = cache.offset + jnp.arange(S, dtype=jnp.int32)[None, :]
        else:
            qpos = position_ids  # [B, S] absolute positions
            qpos = qpos + cache.left_pad[:, None]
        cur_block = qpos // bs  # [B, S]
        blocks = jnp.arange(nb, dtype=jnp.int32)[None, None, :]
        sel = jnp.where(valid_blocks, block_scores, neg)
        if self.init_blocks > 0:
            forced = (blocks < self.init_blocks) & valid_blocks
            sel = jnp.where(forced, jnp.float32(1e30), sel)
        if self.local_blocks > 0:
            lo = jnp.maximum(cur_block - self.local_blocks + 1, 0)
            local = (
                (blocks >= lo[..., None]) & (blocks <= cur_block[..., None])
                & valid_blocks
            )
            sel = jnp.where(local, jnp.float32(1e29), sel)

        k_sel = min(topk, nb)
        top_vals, top_idx = jax.lax.top_k(sel, k_sel)  # [B,S,k]
        top_ok = top_vals > neg / 2
        block_keep = (
            jax.nn.one_hot(top_idx, nb, dtype=jnp.float32)
            * top_ok[..., None]
        ).sum(-2) > 0  # [B, S, nb]
        keep = jnp.repeat(block_keep, bs, axis=-1)  # [B, S, C]
        return ik, keep[:, None]  # [B, 1, S, C]

    # --------------------------------------------------------------- helpers
    def logits(self, params, hidden):
        if self.args.tie_word_embeddings:
            return embedding_as_linear(params["model"]["embed_tokens"], hidden)
        return linear(params["lm_head"], hidden)

    def embed(self, params, input_ids):
        return embedding(params["model"]["embed_tokens"], input_ids)

    # the engine defers cache construction to us (index-key side buffer +
    # optional main-KV quantization)
    owns_cache_factory = True

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None, kv_bits=None, kv_group_size=64):
        L = self.args.num_hidden_layers
        if left_pad is None:
            left_pad = jnp.zeros((batch_size,), jnp.int32)
        ik = jnp.zeros(
            (self.n_main, batch_size, 1, capacity, self.index_dim), dtype
        )
        if kv_bits:
            packed = self.head_dim * int(kv_bits) // 8
            groups = self.head_dim // kv_group_size
            base = (L, batch_size, self.n_kv_heads, capacity)
            return MiniMaxQuantizedKVCache(
                kq=jnp.zeros((*base, packed), jnp.uint8),
                ks=jnp.zeros((*base, groups), dtype),
                kb=jnp.zeros((*base, groups), dtype),
                vq=jnp.zeros((*base, packed), jnp.uint8),
                vs=jnp.zeros((*base, groups), dtype),
                vb=jnp.zeros((*base, groups), dtype),
                offset=jnp.zeros((), jnp.int32),
                left_pad=left_pad,
                bits=int(kv_bits),
                group_size=kv_group_size,
                ik=ik,
            )
        return MiniMaxKVCache(
            k=jnp.zeros(
                (L, batch_size, self.n_kv_heads, capacity, self.head_dim), dtype
            ),
            v=jnp.zeros(
                (L, batch_size, self.n_kv_heads, capacity, self.head_dim), dtype
            ),
            offset=jnp.zeros((), jnp.int32),
            left_pad=left_pad,
            ik=ik,
        )
