"""Qwen3-Next hybrid decoder: gated-delta-net linear attention + periodic
full attention + MoE MLP with shared expert.

Role parity: reference mlx_vlm/models/qwen3_next/language.py —
Qwen3NextAttention (gated output, partial rope):47, Qwen3NextGatedDeltaNet
(conv1d + delta rule):127, Qwen3NextSparseMoeBlock (+shared expert):263,
layer interleaving `(i+1) % full_attention_interval`:317, make_cache
(ArraysCache for linear layers, KVCache for attention):407.

TPU design:
- The layer stack is scanned as SUPER-BLOCKS of `full_attention_interval`
  layers (e.g. 3 gated-delta + 1 attention).  Layers are homogeneous within
  each role, so sanitize renames `model.layers.{i}` into
  `model.linear_layers.{j}` / `model.attn_layers.{m}` and the loader stacks
  each role; the outer lax.scan runs over super-blocks with an inner scan
  over the linear layers.  Compile time is O(1) in depth.
- The delta rule is a sequential lax.scan over time (core/ssm.py
  gated_delta_scan) — the state read is nonlinear, so no associative scan.
- Right-padded prefill chunks (engine pads prompts to pow2) would corrupt
  recurrent state; pad steps are detected by position_id == 0 at slot > 0
  (text positions are strictly positive past the first token) and masked
  out of both the delta state and the causal conv window.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.cache import update_layer_auto
from ...core.layers import embedding, embedding_as_linear, linear, rms_norm, swiglu_mlp
from ...core.mask import causal_cache_mask
from ...core.moe import switch_glu, topk_router
from ...core.rope import make_rope
from ...core.ssm import gated_delta_scan
from ...ops.attention import sdpa
from .config import ModelConfig


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["conv", "state", "k", "v", "offset", "left_pad"],
    meta_fields=[],
)
@dataclasses.dataclass
class Qwen3NextCache:
    """Hybrid cache: conv window + delta state for linear layers, KV buffers
    for the periodic attention layers."""

    conv: jax.Array  # [L_lin, B, K-1, conv_dim]
    state: jax.Array  # [L_lin, B, Hv, Dk, Dv] fp32
    k: jax.Array  # [L_att, B, Hkv, C, hd]
    v: jax.Array  # [L_att, B, Hkv, C, hd]
    offset: jax.Array  # int32 scalar
    left_pad: jax.Array  # [B]

    @property
    def capacity(self) -> int:
        return self.k.shape[3]


def _rms(x, eps=1e-6):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class LanguageModel:
    def __init__(self, args: ModelConfig, config=None):
        self.args = args
        self.config = config or args
        a = args
        self.interval = a.full_attention_interval
        self.nlin = self.interval - 1
        self.blocks = a.num_hidden_layers // self.interval
        self.n_heads = a.num_attention_heads
        self.n_kv_heads = a.num_key_value_heads
        self.head_dim = a.head_dim
        self.scale = a.head_dim**-0.5
        self.rot_dim = int(a.head_dim * a.partial_rotary_factor)
        self.rope = make_rope(
            self.rot_dim, a.rope_theta, a.rope_scaling, a.max_position_embeddings
        )
        self.key_dim = a.linear_key_head_dim * a.linear_num_key_heads
        self.value_dim = a.linear_value_head_dim * a.linear_num_value_heads
        self.conv_dim = self.key_dim * 2 + self.value_dim
        self.ksize = a.linear_conv_kernel_dim

    # ------------------------------------------------------------------ jit
    def __call__(self, params, inputs_embeds, cache, position_ids):
        a = self.args
        B, S, _ = inputs_embeds.shape
        eps = a.rms_norm_eps
        if position_ids.ndim == 3 and self.rope.mrope_sections is None:
            position_ids = position_ids[0]
        cos, sin = self.rope.cos_sin(position_ids)
        h = inputs_embeds
        mp = params["model"]

        if cache is None:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
            return_cache = False
        else:
            return_cache = True

        mask = causal_cache_mask(cache.offset, cache.left_pad, S, cache.capacity)
        # ssm validity: slot >= left_pad, and pad sentinel (pos==0 at slot>0)
        slots = cache.offset + jnp.arange(S, dtype=jnp.int32)  # [S]
        if position_ids.ndim == 3:
            pos_row = position_ids[0]  # temporal stream carries validity
        elif position_ids.ndim == 2:
            pos_row = position_ids
        else:
            pos_row = position_ids[None]
        pos_row = jnp.broadcast_to(pos_row, (B, S))
        valid = (slots[None, :] >= cache.left_pad[:, None]) & (
            (pos_row > 0) | (slots[None, :] == 0)
        )  # [B, S]

        G, nlin = self.blocks, self.nlin
        lin_p = jax.tree.map(
            lambda x: x.reshape(G, nlin, *x.shape[1:]), mp["linear_layers"]
        )
        conv_c = cache.conv.reshape(G, nlin, *cache.conv.shape[1:])
        st_c = cache.state.reshape(G, nlin, *cache.state.shape[1:])

        def lin_layer(h, xs):
            lp, cv, st = xs
            x = rms_norm(lp["input_layernorm"], h, eps)
            r, cv, st = self._gdn(lp["linear_attn"], x, cv, st, valid)
            h = h + r
            x = rms_norm(lp["post_attention_layernorm"], h, eps)
            h = h + self._mlp(lp["mlp"], x)
            return h, (cv, st)

        def super_block(h, xs):
            lp_g, cv_g, st_g, ap, kb, vb = xs
            h, (cv_y, st_y) = jax.lax.scan(lin_layer, h, (lp_g, cv_g, st_g))
            x = rms_norm(ap["input_layernorm"], h, eps)
            r, kb, vb = self._attention(ap["self_attn"], x, cos, sin, mask,
                                        cache.offset, kb, vb)
            h = h + r
            x = rms_norm(ap["post_attention_layernorm"], h, eps)
            h = h + self._mlp(ap["mlp"], x)
            return h, (cv_y, st_y, kb, vb)

        h, (cv_y, st_y, k_y, v_y) = jax.lax.scan(
            super_block, h, (lin_p, conv_c, st_c, mp["attn_layers"],
                             cache.k, cache.v)
        )
        h = rms_norm(mp["norm"], h, eps)
        if not return_cache:
            return h, None
        new_cache = Qwen3NextCache(
            conv=cv_y.reshape(cache.conv.shape),
            state=st_y.reshape(cache.state.shape),
            k=k_y, v=v_y,
            offset=cache.offset + S,
            left_pad=cache.left_pad,
        )
        return h, new_cache

    # ------------------------------------------------------ gated delta net
    def _gdn(self, p, x, conv_state, state, valid):
        """Reference Qwen3NextGatedDeltaNet.__call__:191-261."""
        a = self.args
        B, S, _ = x.shape
        nk, nv = a.linear_num_key_heads, a.linear_num_value_heads
        dk, dv = a.linear_key_head_dim, a.linear_value_head_dim
        rep = nv // nk

        qkvz = linear(p["in_proj_qkvz"], x).reshape(B, S, nk, -1)
        ba = linear(p["in_proj_ba"], x).reshape(B, S, nk, -1)
        q = qkvz[..., :dk]
        k = qkvz[..., dk:2 * dk]
        v = qkvz[..., 2 * dk:2 * dk + rep * dv].reshape(B, S, nv, dv)
        z = qkvz[..., 2 * dk + rep * dv:].reshape(B, S, nv, dv)
        b = ba[..., :rep].reshape(B, S, nv)
        aa = ba[..., rep:].reshape(B, S, nv)

        # causal depthwise conv over [q|k|v] channels with carried window
        mixed = jnp.concatenate(
            [q.reshape(B, S, -1), k.reshape(B, S, -1), v.reshape(B, S, -1)],
            axis=-1,
        )
        mixed = jnp.where(valid[..., None], mixed, 0)
        conv_in = jnp.concatenate([conv_state.astype(mixed.dtype), mixed], axis=1)
        # new window: ends at the last valid step (pads sit before/after it)
        lv = jnp.max(
            jnp.where(valid, jnp.arange(S, dtype=jnp.int32)[None], -1),
            axis=1,
        )  # [B]
        gather = (lv[:, None] + 1 + jnp.arange(self.ksize - 1)[None])  # [B, K-1]
        new_conv = jnp.take_along_axis(conv_in, gather[..., None], axis=1)
        w = p["conv1d"]["weight"]  # [conv_dim, K]
        windows = jnp.stack(
            [conv_in[:, i:i + S] for i in range(self.ksize)], axis=0
        )  # [K, B, S, C]
        conv_out = jax.nn.silu(jnp.einsum("kbsc,ck->bsc", windows, w))

        q = conv_out[..., :self.key_dim].reshape(B, S, nk, dk)
        k = conv_out[..., self.key_dim:2 * self.key_dim].reshape(B, S, nk, dk)
        v = conv_out[..., 2 * self.key_dim:].reshape(B, S, nv, dv)

        inv_scale = dk**-0.5
        q = (inv_scale**2) * _rms(q)
        k = inv_scale * _rms(k)
        q = jnp.repeat(q, rep, axis=2)
        k = jnp.repeat(k, rep, axis=2)

        # g = exp(-exp(A_log) * softplus(a + dt_bias)); beta = sigmoid(b)
        g = jnp.exp(
            -jnp.exp(p["A_log"].astype(jnp.float32))
            * jax.nn.softplus(aa.astype(jnp.float32) + p["dt_bias"])
        )
        beta = jax.nn.sigmoid(b.astype(jnp.float32))

        out, state = gated_delta_scan(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), g, beta, state, valid,
        )
        # gated RMSNorm: rms(out) * silu(z) (reference RMSNormGated:31)
        out = rms_norm(p["norm"], out, self.args.rms_norm_eps)
        out = (
            out.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))
        ).astype(x.dtype)
        return linear(p["out_proj"], out.reshape(B, S, -1)), new_conv, state

    # ----------------------------------------------------------- attention
    def _attention(self, p, x, cos, sin, mask, offset, k_buf, v_buf):
        a = self.args
        B, S, _ = x.shape
        hd = self.head_dim
        qg = linear(p["q_proj"], x).reshape(B, S, self.n_heads, 2 * hd)
        q, gate = qg[..., :hd], qg[..., hd:]
        k = linear(p["k_proj"], x).reshape(B, S, self.n_kv_heads, hd)
        v = linear(p["v_proj"], x).reshape(B, S, self.n_kv_heads, hd)
        q = rms_norm(p["q_norm"], q, a.rms_norm_eps).transpose(0, 2, 1, 3)
        k = rms_norm(p["k_norm"], k, a.rms_norm_eps).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        # partial rotary: only the first rot_dim dims rotate
        from ...core.rope import apply_rope

        rd = self.rot_dim
        q_rot, k_rot = apply_rope(q[..., :rd], k[..., :rd], cos, sin)
        q = jnp.concatenate([q_rot, q[..., rd:]], axis=-1)
        k = jnp.concatenate([k_rot, k[..., rd:]], axis=-1)
        k_buf, v_buf = update_layer_auto(k_buf, v_buf, k, v, offset)
        attn = sdpa(q, k_buf, v_buf, self.scale, mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
        gate = gate.reshape(B, S, -1)
        return linear(p["o_proj"], attn * jax.nn.sigmoid(gate)), k_buf, v_buf

    # ----------------------------------------------------------------- moe
    def _mlp(self, p, x):
        if "experts" not in p:
            return swiglu_mlp(p, x)
        B, S, D = x.shape
        flat = x.reshape(B * S, D)
        indices, weights = topk_router(
            flat, p["gate"]["weight"], self.args.num_experts_per_tok,
            self.args.norm_topk_prob,
        )
        out = switch_glu(
            flat,
            p["experts"]["gate_proj"]["weight"],
            p["experts"]["up_proj"]["weight"],
            p["experts"]["down_proj"]["weight"],
            indices, weights,
        )
        shared = swiglu_mlp(p["shared_expert"], flat)
        sg = jax.nn.sigmoid(
            linear(p["shared_expert_gate"], flat).astype(jnp.float32)
        ).astype(shared.dtype)
        return (out + sg * shared).reshape(B, S, D)

    # ---------------------------------------------------------------- misc
    def logits(self, params, hidden):
        if self.args.tie_word_embeddings or "lm_head" not in params:
            return embedding_as_linear(params["model"]["embed_tokens"], hidden)
        return linear(params["lm_head"], hidden)

    def embed(self, params, input_ids):
        return embedding(params["model"]["embed_tokens"], input_ids)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16, left_pad=None):
        a = self.args
        if left_pad is None:
            left_pad = jnp.zeros((batch_size,), jnp.int32)
        L_lin = self.blocks * self.nlin
        return Qwen3NextCache(
            conv=jnp.zeros(
                (L_lin, batch_size, self.ksize - 1, self.conv_dim), dtype
            ),
            state=jnp.zeros(
                (L_lin, batch_size, a.linear_num_value_heads,
                 a.linear_key_head_dim, a.linear_value_head_dim), jnp.float32,
            ),
            k=jnp.zeros(
                (self.blocks, batch_size, self.n_kv_heads, capacity,
                 self.head_dim), dtype,
            ),
            v=jnp.zeros(
                (self.blocks, batch_size, self.n_kv_heads, capacity,
                 self.head_dim), dtype,
            ),
            offset=jnp.zeros((), jnp.int32),
            left_pad=left_pad,
        )
