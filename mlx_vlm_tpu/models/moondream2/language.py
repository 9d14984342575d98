"""Moondream2 text decoder: phi-style parallel blocks with partial rotary.

Role parity: reference mlx_vlm/models/moondream2/language.py —
Attention:12 (fused qkv + bias, partial_rotary_factor rope), parallel
residual TransformerBlock:68 (x + attn(ln(x)) + mlp(ln(x))), LayerNorm
everywhere, biased lm_head.

TPU design: scan-stacked layers over a fixed-capacity cursor cache like
every decoder here; the partial rope rotates only the first
`head_dim * partial_rotary_factor` lanes — a static slice XLA fuses away.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import layer_norm, linear
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, make_rope


@dataclasses.dataclass
class TextConfig:
    model_type: str = "moondream2"
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_hidden_layers: int = 24
    vocab_size: int = 51200
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    rope_theta: float = 10000.0
    partial_rotary_factor: float = 0.5
    rms_norm_eps: float = 1e-5
    max_position_embeddings: int = 2048

    @classmethod
    def from_dict(cls, d: dict) -> "TextConfig":
        import inspect

        sig = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in d.items() if k in sig})


class LanguageModel:
    """params = {"model": {"embed_tokens", "layers" (stacked: ln/attn/mlp),
    "post_ln"}, "lm_head"}."""

    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.hidden_size // args.num_attention_heads
        self.rope_dim = int(self.head_dim * args.partial_rotary_factor)
        self.scale = self.head_dim**-0.5
        self.rope = make_rope(self.rope_dim, args.rope_theta)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None):
        return cache_lib.init_cache(
            self.args.num_hidden_layers, batch_size, self.n_kv_heads,
            self.head_dim, capacity, dtype, left_pad)

    def embed(self, params, input_ids):
        return jnp.take(params["model"]["embed_tokens"]["weight"], input_ids,
                        axis=0)

    def logits(self, params, hidden):
        return linear(params["lm_head"], hidden)

    def __call__(self, params, inputs_embeds, cache, position_ids,
                 prefix_len: Optional[jax.Array] = None):
        from ...ops.attention import sdpa

        B, S, _ = inputs_embeds.shape
        pos = position_ids[0] if position_ids.ndim == 3 else position_ids
        cos, sin = self.rope.cos_sin(pos)
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
            # moondream prefix attention: BOS+image tokens attend
            # bidirectionally (reference _create_prefix_attention_mask:83)
            j = jnp.arange(mask.shape[-1])[None, None, None, :]
            i = jnp.arange(S)[None, None, :, None]
            bidir = (i < prefix_len) & (j < prefix_len)
            mask = mask | bidir

        def attn(lp, x, cxs):
            qkv = linear(lp["attn"]["qkv"], x)
            q = qkv[..., :q_dim].reshape(B, S, self.n_heads, hd).transpose(
                0, 2, 1, 3)
            k = qkv[..., q_dim:q_dim + kv_dim].reshape(
                B, S, self.n_kv_heads, hd).transpose(0, 2, 1, 3)
            v = qkv[..., q_dim + kv_dim:].reshape(
                B, S, self.n_kv_heads, hd).transpose(0, 2, 1, 3)
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

        def mlp(lp, x):
            return linear(lp["mlp"]["fc2"], jax.nn.gelu(
                linear(lp["mlp"]["fc1"], x), approximate=True))

        h = inputs_embeds
        if cache is None:
            def layer_nc(h, lp):
                x = layer_norm(lp["ln"], h, self.args.rms_norm_eps)
                a, _ = attn(lp, x, None)
                return h + a + mlp(lp, x), None

            h, _ = jax.lax.scan(layer_nc, h, mp["layers"])
            return layer_norm(mp["post_ln"], h, self.args.rms_norm_eps), None

        def layer(h, xs):
            lp, cxs = xs
            x = layer_norm(lp["ln"], h, self.args.rms_norm_eps)
            a, nxt = attn(lp, x, cxs)
            return h + a + mlp(lp, x), nxt

        h, cys = jax.lax.scan(layer, h, (mp["layers"], cache.scan_arrays()))
        h = layer_norm(mp["post_ln"], h, self.args.rms_norm_eps)
        return h, cache.with_arrays(cys, S)
