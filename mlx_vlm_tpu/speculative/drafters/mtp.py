"""MTP (multi-token prediction) drafter: one decoder block conditioned on
[enorm(embed(token)) | hnorm(target hidden)] -> eh_proj.

Role parity: reference mlx_vlm/speculative/mtp.py (:523 rounds) +
drafters/{deepseek_v4_mtp,qwen3_5_mtp,...} — the drafter head shipped inside
MTP-trained checkpoints (DeepSeek-V3/V4, Qwen3.5, GLM4): token embedding
and lm_head are SHARED with the target (reference bind(), drafters/
deepseek_v4_mtp/deepseek_v4_mtp.py:95).

TPU design: same shape as the EAGLE-3 drafter — the whole k-step draft is
one jitted lax.scan with a one-layer fixed-capacity KV cache, and the
drafter duck-types Eagle3Drafter's interface (init_cache / fuse_features /
draft_fn) so `eagle3_generate_step` drives either kind.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import linear, rms_norm, swiglu_mlp
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, make_rope
from ...ops.attention import sdpa


@dataclasses.dataclass
class MTPConfig:
    hidden_size: int
    intermediate_size: int
    num_attention_heads: int
    num_key_value_heads: int
    vocab_size: int
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0


class MTPDrafter:
    """params = {"enorm", "hnorm", "eh_proj" (2D->D), "layer" (llama block),
    "norm", "embed_tokens", "lm_head"} — the last two typically shared from
    the target checkpoint."""

    def __init__(self, config: MTPConfig):
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
        """MTP conditions on the target's FINAL hidden state only."""
        return hiddens[-1]

    def _step(self, params, cache, tok, feature, pos):
        c = self.config
        eps = c.rms_norm_eps
        emb = jnp.take(params["embed_tokens"]["weight"], tok, axis=0)
        e = rms_norm(params["enorm"], emb, eps)
        hcond = rms_norm(params["hnorm"], feature, eps)
        x = linear(params["eh_proj"], jnp.concatenate([e, hcond], axis=-1))
        x = x[:, None, :]
        B = x.shape[0]
        lp = params["layer"]
        pos_b = jnp.broadcast_to(jnp.reshape(pos, (1, 1)), (B, 1))
        cos, sin = self.rope.cos_sin(pos_b)
        mask = causal_cache_mask(cache.offset, cache.left_pad, 1,
                                 cache.capacity)
        h = x
        y = rms_norm(lp["input_layernorm"], h, eps)
        q = linear(lp["self_attn"]["q_proj"], y).reshape(
            B, 1, self.n_heads, self.head_dim).transpose(0, 2, 1, 3)
        k = linear(lp["self_attn"]["k_proj"], y).reshape(
            B, 1, self.n_kv_heads, self.head_dim).transpose(0, 2, 1, 3)
        v = linear(lp["self_attn"]["v_proj"], y).reshape(
            B, 1, self.n_kv_heads, self.head_dim).transpose(0, 2, 1, 3)
        q, k = apply_rope(q, k, cos, sin)
        kb, vb = cache_lib.update_layer(cache.k[0], cache.v[0], k, v,
                                        cache.offset)
        out = sdpa(q, kb, vb, self.scale, mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, 1, -1)
        h = h + linear(lp["self_attn"]["o_proj"], out)
        y = rms_norm(lp["post_attention_layernorm"], h, eps)
        h = h + swiglu_mlp(lp["mlp"], y)
        cache = dataclasses.replace(
            cache, k=cache.k.at[0].set(kb), v=cache.v.at[0].set(vb),
            offset=cache.offset + 1,
        )
        hn = rms_norm(params["norm"], h, eps)
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
            return toks.T, cache

        self._draft_fn = draft
        return draft


def init_mtp_params(config: MTPConfig, seed: int = 0, scale: float = 0.05,
                    dtype=jnp.float32,
                    shared_embed: Optional[jax.Array] = None,
                    shared_lm_head: Optional[jax.Array] = None) -> dict:
    """Random drafter params; pass the target's embed/lm_head to share them
    (reference bind())."""
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return jnp.asarray(rng.standard_normal(shape) * scale, dtype)

    c = config
    D, I, V = c.hidden_size, c.intermediate_size, c.vocab_size
    hd = D // c.num_attention_heads
    return {
        "enorm": {"weight": jnp.ones(D, dtype)},
        "hnorm": {"weight": jnp.ones(D, dtype)},
        "eh_proj": {"weight": rand(D, 2 * D)},
        "embed_tokens": {
            "weight": shared_embed if shared_embed is not None else rand(V, D)
        },
        "layer": {
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
        "lm_head": {
            "weight": shared_lm_head if shared_lm_head is not None
            else rand(V, D)
        },
    }
