"""Florence-2 BART-style encoder-decoder language model.

Role parity: reference mlx_vlm/models/florence2/language.py —
Florence2Encoder:218, Florence2Decoder:264 (post-norm residual blocks,
learned positions with offset 2), cross-attention K/V cached once per
generation (Florence2Attention:16).

TPU design:
- Encoder and decoder layer stacks are scan-stacked (one compiled body per
  stack) like every decoder here.
- The decoder keeps a fixed-capacity index-written self-attention cache
  plus a cross-attention K/V block computed ONCE from the encoder output at
  cache init (the reference computes it lazily on the first decode step);
  decode steps are then pure cached attention with zero recompute.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import layer_norm, linear
from ...core.mask import causal_cache_mask


@dataclasses.dataclass
class TextConfig:
    model_type: str = "florence2"
    d_model: int = 768
    encoder_attention_heads: int = 8
    decoder_attention_heads: int = 8
    encoder_ffn_dim: int = 3072
    decoder_ffn_dim: int = 3072
    encoder_layers: int = 6
    decoder_layers: int = 6
    scale_embedding: bool = False
    max_position_embeddings: int = 1024
    vocab_size: int = 51289
    pad_token_id: int = 1
    bos_token_id: int = 0
    eos_token_id: int = 2
    decoder_start_token_id: int = 2

    @classmethod
    def from_dict(cls, d: dict) -> "TextConfig":
        import inspect

        sig = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in d.items() if k in sig})


@dataclasses.dataclass
class _Fl2Cache:
    """Decoder self-attn KV (cursor-written) + fixed cross-attn K/V."""

    k: jax.Array        # [L, B, H, C, D] self-attn keys
    v: jax.Array
    cross_k: jax.Array  # [L, B, H, S_enc, D]
    cross_v: jax.Array
    enc_mask: jax.Array  # [B, S_enc] bool
    offset: jax.Array
    left_pad: jax.Array

    @property
    def capacity(self) -> int:
        return self.k.shape[3]


jax.tree_util.register_dataclass(
    _Fl2Cache,
    data_fields=["k", "v", "cross_k", "cross_v", "enc_mask", "offset",
                 "left_pad"],
    meta_fields=[],
)

_POS_OFFSET = 2  # BART's learned-position offset (reference :228)


class LanguageModel:
    """params = {"model": {"shared", "encoder": {...}, "decoder": {...}},
    "lm_head"}."""

    is_encoder_decoder = True

    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.enc_heads = args.encoder_attention_heads
        self.dec_heads = args.decoder_attention_heads
        self.head_dim = args.d_model // args.decoder_attention_heads
        self.embed_scale = (args.d_model ** 0.5 if args.scale_embedding
                            else 1.0)

    # ------------------------------------------------------------- embedding
    def embed(self, params, input_ids):
        w = params["model"]["shared"]["weight"]
        return jnp.take(w, input_ids, axis=0) * self.embed_scale

    def logits(self, params, hidden):
        return linear(params["lm_head"], hidden)

    # --------------------------------------------------------------- encoder
    def encode(self, params, inputs_embeds: jax.Array,
               enc_mask: Optional[jax.Array] = None) -> jax.Array:
        """[B, S, D] embeddings (text and/or image features) -> encoder
        hidden states (reference Florence2Encoder:236)."""
        ep = params["model"]["encoder"]
        B, S, D = inputs_embeds.shape
        pos = jnp.arange(S) + _POS_OFFSET
        h = inputs_embeds + jnp.take(ep["embed_positions"]["weight"], pos,
                                     axis=0)
        h = layer_norm(ep["layernorm_embedding"], h)
        if enc_mask is None:
            enc_mask = jnp.ones((B, S), bool)
        mask4 = enc_mask[:, None, None, :]

        def layer(h, lp):
            a = self._attention(lp["self_attn"], h, h, self.enc_heads, mask4)
            h = layer_norm(lp["self_attn_layer_norm"], h + a)
            f = linear(lp["fc2"], jax.nn.gelu(linear(lp["fc1"], h),
                                              approximate=False))
            h = layer_norm(lp["final_layer_norm"], h + f)
            return h, None

        h, _ = jax.lax.scan(layer, h, ep["layers"])
        return h

    # --------------------------------------------------------------- decoder
    def init_cache(self, params, encoder_hidden: jax.Array,
                   enc_mask: Optional[jax.Array], capacity: int,
                   dtype=jnp.float32) -> _Fl2Cache:
        """Precompute every layer's cross-attn K/V from the encoder output
        and allocate the self-attn ring."""
        dp = params["model"]["decoder"]
        B, S_enc, D = encoder_hidden.shape
        L = self.args.decoder_layers
        H, hd = self.dec_heads, self.head_dim

        def cross_kv(_, lp):
            att = lp["encoder_attn"]
            k = linear(att["k_proj"], encoder_hidden).reshape(
                B, S_enc, H, hd).transpose(0, 2, 1, 3)
            v = linear(att["v_proj"], encoder_hidden).reshape(
                B, S_enc, H, hd).transpose(0, 2, 1, 3)
            return None, (k, v)

        _, (ck, cv) = jax.lax.scan(cross_kv, None, dp["layers"])
        if enc_mask is None:
            enc_mask = jnp.ones((B, S_enc), bool)
        return _Fl2Cache(
            k=jnp.zeros((L, B, H, capacity, hd), dtype),
            v=jnp.zeros((L, B, H, capacity, hd), dtype),
            cross_k=ck.astype(dtype), cross_v=cv.astype(dtype),
            enc_mask=enc_mask,
            offset=jnp.zeros((), jnp.int32),
            left_pad=jnp.zeros((B,), jnp.int32),
        )

    def decode(self, params, cache: _Fl2Cache,
               decoder_input_ids: jax.Array) -> Tuple[jax.Array, _Fl2Cache]:
        """One decoder forward over S new tokens -> (hidden, cache)."""
        dp = params["model"]["decoder"]
        B, S = decoder_input_ids.shape
        h = self.embed(params, decoder_input_ids)
        pos = cache.offset + jnp.arange(S) + _POS_OFFSET
        h = h + jnp.take(dp["embed_positions"]["weight"], pos, axis=0)
        h = layer_norm(dp["layernorm_embedding"], h)
        self_mask = causal_cache_mask(cache.offset, cache.left_pad, S,
                                      cache.capacity)
        cross_mask = cache.enc_mask[:, None, None, :]

        def layer(h, xs):
            lp, kc, vc, ck, cv = xs
            q, k, v = self._qkv(lp["self_attn"], h, self.dec_heads)
            kc, vc = cache_lib.update_layer(kc, vc, k, v, cache.offset)
            a = self._sdpa(q, kc, vc, self_mask)
            a = linear(lp["self_attn"]["out_proj"],
                       a.transpose(0, 2, 1, 3).reshape(B, S, -1))
            h = layer_norm(lp["self_attn_layer_norm"], h + a)
            qx = linear(lp["encoder_attn"]["q_proj"], h).reshape(
                B, S, self.dec_heads, self.head_dim).transpose(0, 2, 1, 3)
            x = self._sdpa(qx, ck, cv, cross_mask)
            x = linear(lp["encoder_attn"]["out_proj"],
                       x.transpose(0, 2, 1, 3).reshape(B, S, -1))
            h = layer_norm(lp["encoder_attn_layer_norm"], h + x)
            f = linear(lp["fc2"], jax.nn.gelu(linear(lp["fc1"], h),
                                              approximate=False))
            h = layer_norm(lp["final_layer_norm"], h + f)
            return h, (kc, vc)

        h, (ks, vs) = jax.lax.scan(
            layer, h, (dp["layers"], cache.k, cache.v, cache.cross_k,
                       cache.cross_v))
        cache = dataclasses.replace(cache, k=ks, v=vs,
                                    offset=cache.offset + S)
        return h, cache

    # --------------------------------------------------------------- helpers
    def _qkv(self, p, x, heads):
        B, S, _ = x.shape
        hd = self.head_dim
        q = linear(p["q_proj"], x).reshape(B, S, heads, hd).transpose(
            0, 2, 1, 3)
        k = linear(p["k_proj"], x).reshape(B, S, heads, hd).transpose(
            0, 2, 1, 3)
        v = linear(p["v_proj"], x).reshape(B, S, heads, hd).transpose(
            0, 2, 1, 3)
        return q, k, v

    def _sdpa(self, q, k, v, mask):
        from ...ops.attention import sdpa

        return sdpa(q, k, v, self.head_dim**-0.5, mask)

    def _attention(self, p, xq, xkv, heads, mask):
        B, S, _ = xq.shape
        q, k, v = self._qkv(p, xq, heads)
        o = self._sdpa(q, k, v, mask)
        return linear(p["out_proj"], o.transpose(0, 2, 1, 3).reshape(
            B, S, -1))
