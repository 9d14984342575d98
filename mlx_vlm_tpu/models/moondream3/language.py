"""Moondream3 text decoder: parallel blocks + Tau scaling + sparse MoE.

Role parity: reference mlx_vlm/models/moondream3/language.py — fused-qkv
attention with learned position/data-dependent temperature scaling on Q
and V (Tau:13), partial rope over the first rope_dim lanes, parallel
residual blocks sharing ONE LayerNorm (DecoderBlock:216:
x + attn(ln(x)) + mlp(ln(x))), dense MLPs for the first moe_start_layer
layers then softmax-top-k routed experts with a gelu(h)*(g+1) gated
activation (MoEMLP:172), biased lm_head.

TPU design: dense prefix and MoE suffix run as two sequential
`lax.scan`s over role-split stacks sharing one KV cache (glm4_moe
pattern); expert weights ship pre-stacked ([E, out, in]) so routing is a
single gather-MLP (core/moe.switch_glu with a custom act2).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import layer_norm, linear
from ...core.mask import causal_cache_mask
from ...core.moe import switch_glu
from ...core.quant_scan import scan_layers
from ...core.rope import apply_rope, make_rope


@dataclasses.dataclass
class TextConfig:
    model_type: str = "moondream3"
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_hidden_layers: int = 24
    vocab_size: int = 51200
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: int = 64
    rope_theta: float = 1500000.0
    rope_dim: int = 32
    rms_norm_eps: float = 1e-5
    num_experts: int = 64
    num_experts_per_tok: int = 8
    moe_intermediate_size: int = 1024
    moe_start_layer: int = 4
    attention_bias: bool = True
    prefix_attn: int = 730
    max_position_embeddings: int = 4096

    @classmethod
    def from_dict(cls, d: dict) -> "TextConfig":
        import inspect

        sig = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in d.items() if k in sig})


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.head_dim
        self.rope_dim = args.rope_dim
        self.scale = self.head_dim**-0.5
        self.rope = make_rope(self.rope_dim, args.rope_theta)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None):
        return cache_lib.init_cache(
            self.args.num_hidden_layers, batch_size, self.n_kv_heads,
            self.head_dim, capacity, dtype, left_pad)

    def embed(self, params, input_ids):
        return jnp.take(params["model"]["wte"]["weight"], input_ids, axis=0)

    def logits(self, params, hidden):
        return linear(params["lm_head"], hidden)

    def _tau(self, tp, qkv, pos):
        """Learned temperature scales for Q and V (reference Tau:13).

        qkv [B, S, qkv_dim]; pos [B, S] absolute positions ->
        tau_q, tau_v [B, n_heads, S, 1]."""
        h = jax.nn.gelu(qkv.astype(jnp.float32), approximate=False)
        tok_q = jnp.tanh(h @ tp["wq"].astype(jnp.float32).T)  # [B, S, H]
        tok_v = jnp.tanh(h @ tp["wv"].astype(jnp.float32).T)
        log_pos = jnp.log(pos.astype(jnp.float32) + 1.0)  # [B, S]
        alpha = tp["alpha"].astype(jnp.float32)  # [H]
        tau_pos = 1.0 + (jax.nn.sigmoid(
            alpha[None, :, None] * log_pos[:, None, :]) - 0.5)  # [B, H, S]
        tau_q = tok_q.transpose(0, 2, 1) + tau_pos
        tau_v = tok_v.transpose(0, 2, 1) + tau_pos
        return tau_q[..., None], tau_v[..., None]

    def _moe(self, p, x):
        a = self.args
        B, S, D = x.shape
        flat = x.reshape(B * S, D)
        logits = linear(p["router"], flat).astype(jnp.float32)
        top, idx = jax.lax.top_k(logits, a.num_experts_per_tok)
        wts = jax.nn.softmax(top, axis=-1).astype(x.dtype)
        I = a.moe_intermediate_size
        fc1 = p["fc1"]["weight"]  # [E, 2I, D]
        out = switch_glu(
            flat,
            fc1[:, :I],
            fc1[:, I:],
            p["fc2"]["weight"],
            idx, wts,
            act2=lambda h, g: jax.nn.gelu(h, approximate=False) * (g + 1.0),
        )
        return out.reshape(B, S, D)

    def __call__(self, params, inputs_embeds, cache, position_ids,
                 prefix_len: Optional[jax.Array] = None):
        from ...ops.attention import sdpa

        a = self.args
        B, S, _ = inputs_embeds.shape
        pos = position_ids[0] if position_ids.ndim == 3 else position_ids
        cos, sin = self.rope.cos_sin(pos)
        pos2d = jnp.broadcast_to(pos, (B, S)) if pos.ndim == 2 else pos
        mp = params["model"]
        hd, rd = self.head_dim, self.rope_dim
        q_dim = self.n_heads * hd
        kv_dim = self.n_kv_heads * hd

        if cache is None:
            zero = jnp.zeros((), jnp.int32)
            mask = causal_cache_mask(zero, jnp.zeros((B,), jnp.int32), S, S)
        else:
            mask = causal_cache_mask(cache.offset, cache.left_pad, S,
                                     cache.capacity)
        if prefix_len is not None:
            # [BOS | image] tokens attend bidirectionally (reference
            # moondream3.py:_create_prefix_attention_mask)
            j = jnp.arange(mask.shape[-1])[None, None, None, :]
            qi = pos2d[:, None, :, None]
            mask = mask | ((qi < prefix_len) & (j < prefix_len))

        def attn(lp, x, cxs):
            qkv = linear(lp["attn"]["qkv"], x)
            tau_q, tau_v = self._tau(lp["attn"]["tau"], qkv, pos2d)
            q = qkv[..., :q_dim].reshape(B, S, self.n_heads, hd).transpose(
                0, 2, 1, 3)
            k = qkv[..., q_dim:q_dim + kv_dim].reshape(
                B, S, self.n_kv_heads, hd).transpose(0, 2, 1, 3)
            v = qkv[..., q_dim + kv_dim:].reshape(
                B, S, self.n_kv_heads, hd).transpose(0, 2, 1, 3)
            q = (q.astype(jnp.float32) * tau_q).astype(x.dtype)
            v = (v.astype(jnp.float32)
                 * tau_v[:, :self.n_kv_heads]).astype(x.dtype)
            qr, kr = apply_rope(q[..., :rd], k[..., :rd], cos, sin)
            q = jnp.concatenate([qr, q[..., rd:]], axis=-1)
            k = jnp.concatenate([kr, k[..., rd:]], axis=-1)
            if cache is None:
                o = sdpa(q, k, v, self.scale, mask)
                nxt = None
            else:
                kc, vc = cache_lib.update_layer(cxs[0], cxs[1], k, v,
                                                cache.offset)
                o = sdpa(q, kc, vc, self.scale, mask)
                nxt = (kc, vc)
            o = o.transpose(0, 2, 1, 3).reshape(B, S, -1)
            return linear(lp["attn"]["proj"], o), nxt

        def block(lp, h, cxs, moe):
            x = layer_norm(lp["ln"], h, a.rms_norm_eps)
            at, nxt = attn(lp, x, cxs)
            if moe:
                m = self._moe(lp["mlp"], x)
            else:
                m = linear(lp["mlp"]["fc2"], jax.nn.gelu(
                    linear(lp["mlp"]["fc1"], x), approximate=True))
            return h + at + m, nxt

        h = inputs_embeds
        kd = a.moe_start_layer
        if cache is None:
            def dense_nc(h, lp):
                h, _ = block(lp, h, None, False)
                return h, None

            def moe_nc(h, lp):
                h, _ = block(lp, h, None, True)
                return h, None

            if kd:
                h, _ = scan_layers(dense_nc, h, mp["dense_layers"])
            h, _ = scan_layers(moe_nc, h, mp["moe_layers"])
            return layer_norm(mp["post_ln"], h, a.rms_norm_eps), None

        cxs_all = cache.scan_arrays()
        dense_cxs = jax.tree_util.tree_map(lambda x: x[:kd], cxs_all)
        moe_cxs = jax.tree_util.tree_map(lambda x: x[kd:], cxs_all)

        def dense_layer(h, lp, cxs):
            return block(lp, h, cxs, False)

        def moe_layer(h, lp, cxs):
            return block(lp, h, cxs, True)

        if kd:
            h, cys_d = scan_layers(dense_layer, h, mp["dense_layers"],
                                   dense_cxs)
        h, cys_m = scan_layers(moe_layer, h, mp["moe_layers"], moe_cxs)
        if kd:
            cys = jax.tree_util.tree_map(
                lambda x, y: jnp.concatenate([x, y], axis=0), cys_d, cys_m)
        else:
            cys = cys_m
        h = layer_norm(mp["post_ln"], h, a.rms_norm_eps)
        return h, cache.with_arrays(cys, S)
