"""Falcon-Perception decoder: fused wqkv + shared qk-RMSNorm + attention
sinks + relu^2-gated fused w13 MLP + 3D rope (1D time half / learned
"golden" 2D half).

Role parity: reference mlx_vlm/models/falcon_perception/language.py —
Attention (wqkv, sinks, _norm_w_in/_norm_w_qk):148, MLP (w13 relu^2):207,
apply_rotary_emb_1d (interleaved pairs):21, golden rope
(compute_golden_freqs:42, apply_golden_rotary_emb:51),
create_falcon_perception_mask (causal | same-image block):121,
position collapse across image spans (falcon_perception.py:168).

TPU design: one lax.scan over stacked layers; the per-token image-block
ids and golden (h, w) coordinates are host-computed numpy planes baked
into the cache at init (blk [B, C] int32, hw [B, C, 2] f32) so the traced
step stays shape-static — queries slice their rows at the cache offset,
keys read the full plane.  Text/decode slots carry blk=0 / hw=(0,0),
which makes the block mask collapse to causal and the golden rotation
the identity (theta == 0).  The model is single-chunk prefill
(no_chunked_prefill): the bidirectional image block mask needs every key
of an image written in the same program that reads it.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core.cache import update_layer
from ...core.layers import embedding, embedding_as_linear, linear, rms_norm
from ...core.mask import causal_cache_mask
from ...ops.attention import sdpa
from .config import ModelConfig, TextConfig


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "blk", "hw", "offset", "left_pad"],
    meta_fields=[],
)
@dataclasses.dataclass
class FalconPerceptionCache:
    """KV buffers + host-precomputed image-block ids and golden coords.

    K/V are stored at FULL q-head count: the golden rope's learned
    frequencies differ per q-head, so each GQA repeat of a kv head is
    rotated differently (reference repeats k/v to n_heads BEFORE the
    rotation, language.py:189-195) — a grouped cache cannot represent
    that exactly."""

    k: jax.Array  # [L, B, Hq, C, hd]
    v: jax.Array  # [L, B, Hq, C, hd]
    blk: jax.Array  # [B, C] int32: image block id (0 = text)
    hw: jax.Array  # [B, C, 2] f32: golden-rope (h, w) coords
    offset: jax.Array  # int32 scalar
    left_pad: jax.Array  # [B]

    @property
    def capacity(self) -> int:
        return self.k.shape[3]


def _rope_1d(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Interleaved-pair rotation (reference apply_rotary_emb_1d:21).

    x [B, H, S, d]; cos/sin [B, S, d//2]."""
    xf = x.astype(jnp.float32)
    x0, x1 = xf[..., 0::2], xf[..., 1::2]
    c = cos[:, None]  # [B, 1, S, d//2]
    s = sin[:, None]
    out = jnp.stack([x0 * c - x1 * s, x0 * s + x1 * c], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


def _rope_golden(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Learned 2D rotation (reference apply_golden_rotary_emb:51).

    x [B, H, S, d]; cos/sin [B, H, S, d//2] (already per-head)."""
    xf = x.astype(jnp.float32)
    x0, x1 = xf[..., 0::2], xf[..., 1::2]
    out = jnp.stack([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


class LanguageModel:
    def __init__(self, args: TextConfig, config: ModelConfig = None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.head_dim
        self.scale = args.head_dim**-0.5
        # time half of the head gets interleaved 1D rope over rope_dim dims
        self.rope_dim = args.head_dim // 2
        exps = np.arange(0, self.rope_dim, 2, dtype=np.float64) / self.rope_dim
        self.inv_freq = jnp.asarray(
            (1.0 / (args.rope_theta ** exps)).astype(np.float32))
        # host-side prompt plan (set by Model.prepare_position_ids; consumed
        # as DATA by init_cache)
        self.pending_blk: Optional[np.ndarray] = None
        self.pending_hw: Optional[np.ndarray] = None

    owns_cache_factory = True

    # ------------------------------------------------------------- cache
    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None, **_):
        a = self.args
        if left_pad is None:
            left_pad = jnp.zeros((batch_size,), jnp.int32)
        blk = np.zeros((batch_size, capacity), np.int32)
        hw = np.zeros((batch_size, capacity, 2), np.float32)
        if self.pending_blk is not None and \
                self.pending_blk.shape[0] == batch_size:
            n = min(capacity, self.pending_blk.shape[1])
            blk[:, :n] = self.pending_blk[:, :n]
            hw[:, :n] = self.pending_hw[:, :n]
        return FalconPerceptionCache(
            k=jnp.zeros((a.num_hidden_layers, batch_size, self.n_heads,
                         capacity, self.head_dim), dtype),
            v=jnp.zeros((a.num_hidden_layers, batch_size, self.n_heads,
                         capacity, self.head_dim), dtype),
            blk=jnp.asarray(blk),
            hw=jnp.asarray(hw),
            offset=jnp.zeros((), jnp.int32),
            left_pad=jnp.asarray(left_pad, jnp.int32),
        )

    # -------------------------------------------------------------- misc
    def embed(self, params, input_ids):
        return embedding(params["model"]["embed_tokens"], input_ids)

    def logits(self, params, hidden):
        if self.args.tie_word_embeddings or "lm_head" not in params:
            return embedding_as_linear(params["model"]["embed_tokens"],
                                       hidden)
        return linear(params["lm_head"], hidden)

    # --------------------------------------------------------------- jit
    def __call__(self, params, inputs_embeds, cache, position_ids):
        a = self.args
        B, S, D = inputs_embeds.shape
        eps = a.rms_norm_eps
        mp = params["model"]
        nq, nkv, hd = self.n_heads, self.n_kv_heads, self.head_dim
        q_size, kv_size = nq * hd, nkv * hd

        if cache is None:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
            return_cache = False
        else:
            return_cache = True

        pos = position_ids[0] if position_ids.ndim == 3 else position_ids
        pos = jnp.broadcast_to(pos, (B, S))

        # 1D time rope angles at the collapsed positions
        ang = pos.astype(jnp.float32)[..., None] * self.inv_freq
        cos1, sin1 = jnp.cos(ang), jnp.sin(ang)  # [B, S, rope_dim//2]

        # golden 2D rope: theta[b,s,h,f] = hw . freqs_golden[h,f,:]
        off = cache.offset.astype(jnp.int32)
        hw_q = jax.lax.dynamic_slice(cache.hw, (0, off, 0), (B, S, 2))
        fg = mp["freqs_cis_golden"].astype(jnp.float32)  # [H, hwdim//2, 2]
        theta = jnp.einsum("bsp,hfp->bhsf", hw_q, fg)
        cosg, sing = jnp.cos(theta), jnp.sin(theta)  # [B, H, S, f]

        # causal | same-image-block mask (reference language.py:121)
        mask = causal_cache_mask(cache.offset, cache.left_pad, S,
                                 cache.capacity)
        blk_q = jax.lax.dynamic_slice(cache.blk, (0, off), (B, S))
        same = (blk_q[:, None, :, None] > 0) & (
            blk_q[:, None, :, None] == cache.blk[:, None, None, :])
        mask = mask | same

        half = hd // 2

        def block(h, lp, kb, vb):
            ap, fp = lp["self_attn"], lp["mlp"]
            x = rms_norm(ap["norm_in"], h, eps)
            qkv = linear(ap["wqkv"], x)
            q = qkv[..., :q_size].reshape(B, S, nq, hd).transpose(0, 2, 1, 3)
            k = qkv[..., q_size:q_size + kv_size].reshape(
                B, S, nkv, hd).transpose(0, 2, 1, 3)
            v = qkv[..., q_size + kv_size:].reshape(
                B, S, nkv, hd).transpose(0, 2, 1, 3)
            qkw = ap["qk_norm"]
            q = rms_norm(qkw, q, eps)
            k = rms_norm(qkw, k, eps)
            # GQA repeat BEFORE the rotation: the golden freqs are learned
            # per q-head, so each repeat of a kv head rotates differently
            # (reference language.py:189-195)
            if nq != nkv:
                k = jnp.repeat(k, nq // nkv, axis=1)
                v = jnp.repeat(v, nq // nkv, axis=1)
            # 3D rope: time half 1D 'interleaved-pair', hw half golden
            qt = _rope_1d(q[..., :half], cos1, sin1)
            kt = _rope_1d(k[..., :half], cos1, sin1)
            qh = _rope_golden(q[..., half:], cosg, sing)
            kh = _rope_golden(k[..., half:], cosg, sing)
            q = jnp.concatenate([qt, qh], axis=-1)
            k = jnp.concatenate([kt, kh], axis=-1)
            kb, vb = update_layer(kb, vb, k, v, cache.offset)
            o = sdpa(q, kb, vb, self.scale, mask, sinks=ap["sinks"])
            o = o.transpose(0, 2, 1, 3).reshape(B, S, nq * hd)
            h = h + linear(ap["wo"], o)
            # MLP with in-module norm (reference MLP:207)
            x = rms_norm(fp["norm"], h, eps)
            w13 = linear(fp["w13"], x)
            gate, up = jnp.split(w13, 2, axis=-1)
            act = jnp.square(jax.nn.relu(gate)) * up
            return h + linear(fp["w2"], act), (kb, vb)

        def step(h, xs):
            lp, kb, vb = xs
            return block(h, lp, kb, vb)

        h, (k_y, v_y) = jax.lax.scan(
            step, inputs_embeds, (mp["layers"], cache.k, cache.v))
        h = rms_norm(mp["norm"], h, eps)
        self_hidden = h
        if not return_cache:
            return self_hidden, None
        new_cache = FalconPerceptionCache(
            k=k_y, v=v_y, blk=cache.blk, hw=cache.hw,
            offset=cache.offset + S, left_pad=cache.left_pad,
        )
        return self_hidden, new_cache
