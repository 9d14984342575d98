"""EAGLE-3 style drafter: a one-layer speculator over captured target
hidden states.

Role parity: reference mlx_vlm/speculative/eagle3.py (:344 rounds) +
drafters/eagle3/ (565 LoC model def): the drafter consumes the
concatenation of 3 captured target layers through an fc, then runs a single
llama decoder layer autoregressively, feeding its own hidden state back as
the feature for the next draft position.

TPU design: the whole k-step draft is one jitted scan; the drafter keeps a
single-layer fixed-capacity KV cache with free rollback like the target.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import linear, rms_norm, swiglu_mlp
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, make_rope
from ...ops.attention import sdpa


@dataclasses.dataclass
class Eagle3Config:
    hidden_size: int
    intermediate_size: int
    num_attention_heads: int
    num_key_value_heads: int
    vocab_size: int
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    capture_layers: Tuple[int, int, int] = (1, 2, 3)  # target layer indexes


class Eagle3Drafter:
    """params = {"fc": Linear(3D->D), "embed_tokens", "midlayer" (llama layer:
    input_layernorm/self_attn/post_attention_layernorm/mlp), "norm",
    "lm_head"}."""

    def __init__(self, config: Eagle3Config):
        self.config = config
        c = config
        self.n_heads = c.num_attention_heads
        self.n_kv_heads = c.num_key_value_heads
        self.head_dim = c.hidden_size // c.num_attention_heads
        self.scale = self.head_dim**-0.5
        self.rope = make_rope(self.head_dim, c.rope_theta)
        self._draft_fn = None

    def init_cache(self, batch_size: int, capacity: int, dtype=jnp.float32):
        return cache_lib.init_cache(
            1, batch_size, self.n_kv_heads, self.head_dim, capacity, dtype
        )

    def fuse_features(self, params, hiddens: jax.Array) -> jax.Array:
        """hiddens [L, B, S, D] (captured target stack) -> features [B, S, D]."""
        picks = [hiddens[i] for i in self.config.capture_layers]
        cat = jnp.concatenate(picks, axis=-1)  # [B, S, 3D]
        return linear(params["fc"], cat)

    def _step(self, params, cache, tok, feature, pos):
        """One draft step: (token, feature) -> (next_token, next_feature)."""
        c = self.config
        emb = jnp.take(params["embed_tokens"]["weight"], tok, axis=0)  # [B, D]
        x = emb + feature  # EAGLE conditioning: token embed + fused feature
        x = x[:, None, :]  # [B, 1, D]
        B = x.shape[0]
        lp = params["midlayer"]
        pos_b = jnp.broadcast_to(jnp.reshape(pos, (1, 1)), (B, 1))
        cos, sin = self.rope.cos_sin(pos_b)
        mask = causal_cache_mask(cache.offset, cache.left_pad, 1, cache.capacity)
        h = x
        y = rms_norm(lp["input_layernorm"], h, c.rms_norm_eps)
        q = linear(lp["self_attn"]["q_proj"], y).reshape(
            B, 1, self.n_heads, self.head_dim).transpose(0, 2, 1, 3)
        k = linear(lp["self_attn"]["k_proj"], y).reshape(
            B, 1, self.n_kv_heads, self.head_dim).transpose(0, 2, 1, 3)
        v = linear(lp["self_attn"]["v_proj"], y).reshape(
            B, 1, self.n_kv_heads, self.head_dim).transpose(0, 2, 1, 3)
        q, k = apply_rope(q, k, cos, sin)
        kb, vb = cache_lib.update_layer(cache.k[0], cache.v[0], k, v, cache.offset)
        out = sdpa(q, kb, vb, self.scale, mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, 1, -1)
        h = h + linear(lp["self_attn"]["o_proj"], out)
        y = rms_norm(lp["post_attention_layernorm"], h, c.rms_norm_eps)
        h = h + swiglu_mlp(lp["mlp"], y)
        cache = dataclasses.replace(
            cache, k=cache.k.at[0].set(kb), v=cache.v.at[0].set(vb),
            offset=cache.offset + 1,
        )
        hn = rms_norm(params["norm"], h, c.rms_norm_eps)
        logits = linear(params["lm_head"], hn)[:, 0]
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return nxt, h[:, 0], cache

    def draft_fn(self, k_steps: int):
        if self._draft_fn is not None:
            return self._draft_fn

        @partial(jax.jit, donate_argnums=(1,))
        def draft(params, cache, tok, feature, start_pos):
            def body(carry, i):
                cache, tok, feat = carry
                nxt, feat, cache = self._step(
                    params, cache, tok, feat, start_pos + i
                )
                return (cache, nxt, feat), nxt

            (cache, _, _), toks = jax.lax.scan(
                body, (cache, tok, feature), jnp.arange(k_steps)
            )
            return toks.T, cache  # [B, k]

        self._draft_fn = draft
        return draft


def init_eagle3_params(config: Eagle3Config, seed: int = 0, scale: float = 0.05,
                       dtype=jnp.float32) -> dict:
    """Random drafter params (checkpoint loading maps the same tree)."""
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return jnp.asarray(rng.standard_normal(shape) * scale, dtype)

    c = config
    D, I, V = c.hidden_size, c.intermediate_size, c.vocab_size
    hd = D // c.num_attention_heads
    return {
        "fc": {"weight": rand(D, 3 * D)},
        "embed_tokens": {"weight": rand(V, D)},
        "midlayer": {
            "input_layernorm": {"weight": jnp.ones(D, dtype)},
            "post_attention_layernorm": {"weight": jnp.ones(D, dtype)},
            "self_attn": {
                "q_proj": {"weight": rand(c.num_attention_heads * hd, D)},
                "k_proj": {"weight": rand(c.num_key_value_heads * hd, D)},
                "v_proj": {"weight": rand(c.num_key_value_heads * hd, D)},
                "o_proj": {"weight": rand(D, c.num_attention_heads * hd)},
            },
            "mlp": {
                "gate_proj": {"weight": rand(I, D)},
                "up_proj": {"weight": rand(I, D)},
                "down_proj": {"weight": rand(D, I)},
            },
        },
        "norm": {"weight": jnp.ones(D, dtype)},
        "lm_head": {"weight": rand(V, D)},
    }
