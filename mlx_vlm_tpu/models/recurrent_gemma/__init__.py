"""RecurrentGemma (Griffin) text model.

Role parity: reference mlx_vlm/models/recurrent_gemma/language.py — an
alternating stack (block_types cycling per layer) of RG-LRU recurrent
blocks and local sliding-window MQA attention blocks.  The recurrent
block: gelu(linear_y) gate x (conv1d(K=4) -> RG-LRU) -> linear_out,
where the RG-LRU computes per-head block-diagonal sigmoid input/
recurrence gates, a = exp(-8 * gate_a * softplus(recurrent_param)),
and normalizes inputs by sqrt(1 - a^2) except at sequence position 0
(RGLRU:103-137).  Attention blocks are MQA (1 kv head) with rope on
HALF the head dim and an o_proj bias.  Gemma conventions: (1+w)
RMSNorms, sqrt(D) embed scale, final logit softcap.

TPU design: trace-time loop; the RG-LRU recurrence runs as one
`jax.lax.associative_scan` over the (decay, increment) pairs — O(log S)
depth on-chip instead of a sequential time loop; conv1d(K=4) is
shift-and-blend.  A custom pytree cache carries conv tails [K-1],
recurrence states, and the attention KV buffers together.
"""

from __future__ import annotations

import dataclasses
import inspect
from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp

from ...core.layers import embedding, embedding_as_linear, linear, rms_norm
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, make_rope
from ...core.ssm import _assoc_op
from ...core.config import BaseModelConfig
from ..llama.llama import text_position_ids


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "recurrent_gemma"
    attention_bias: bool = False
    conv1d_width: int = 4
    hidden_size: int = 2560
    intermediate_size: int = 15360
    logits_soft_cap: float = 30.0
    num_attention_heads: int = 10
    num_hidden_layers: int = 26
    num_key_value_heads: int = 1
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    attention_window_size: int = 2048
    vocab_size: int = 256000
    embeddings_scale_by_sqrt_dim: bool = True
    block_types: Optional[List[str]] = None
    _block_types: Optional[List[str]] = None

    def __post_init__(self):
        if self.block_types is None:
            self.block_types = self._block_types or ["recurrent",
                                                     "recurrent",
                                                     "attention"]

    @classmethod
    def from_dict(cls, params: dict):
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})

    def block_type(self, i: int) -> str:
        return self.block_types[i % len(self.block_types)]


ModelConfig = TextConfig


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["conv", "h", "k", "v", "offset", "left_pad"],
    meta_fields=[],
)
@dataclasses.dataclass
class GriffinCache:
    """conv tails [L,B,K-1,lru], RG-LRU states [L,B,lru], KV buffers."""

    conv: jax.Array
    h: jax.Array
    k: jax.Array  # [L, B, 1, C, hd]
    v: jax.Array
    offset: jax.Array
    left_pad: jax.Array

    @property
    def capacity(self) -> int:
        return self.k.shape[3]

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]

    def attend(self, cxs, q, k, v, scale, mask, **kw):
        from ...core.cache import KVCache

        return KVCache.attend(self, cxs, q, k, v, scale, mask, **kw)


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.head_dim = args.hidden_size // args.num_attention_heads
        self.scale = self.head_dim**-0.5
        # rope on HALF the head dim (reference LocalAttentionBlock:206)
        self.rot = self.head_dim // 2
        self.rope = make_rope(self.rot, args.rope_theta, None, 8192)

    def _rglru(self, p, x, h0, position_ids):
        """x [B,S,lru] -> (y, h_last).  reference RGLRU:103-137."""
        a = self.args
        B, S, W = x.shape
        H = a.num_attention_heads
        hd = W // H
        xf = x.astype(jnp.float32)

        def block_gate(w, b):
            hh = xf.reshape(B, S, H, hd)
            g = jnp.einsum("bshd,hde->bshe", hh, w.astype(jnp.float32))
            g = g + b.astype(jnp.float32)[None, None]
            return jax.nn.sigmoid(g.reshape(B, S, W))

        gate_x = block_gate(p["input_gate_weight"], p["input_gate_bias"])
        gate_a = block_gate(p["recurrent_gate_weight"],
                            p["recurrent_gate_bias"])
        log_a = -8.0 * gate_a * jax.nn.softplus(
            p["recurrent_param"].astype(jnp.float32))[None, None]
        decay = jnp.exp(log_a)
        mult = jnp.sqrt(1.0 - jnp.exp(2.0 * log_a))
        # sequence position 0 keeps the raw gated input (reference :130)
        first = (position_ids[:, :, None] == 0)
        mult = jnp.where(first, 1.0, mult)
        inc = xf * gate_x * mult
        # fold carried state into step 0's increment, then assoc-scan
        inc = inc.at[:, 0].add(decay[:, 0] * h0.astype(jnp.float32))
        _, states = jax.lax.associative_scan(_assoc_op, (decay, inc), axis=1)
        return states.astype(x.dtype), states[:, -1]

    def _conv1d(self, p, x, state):
        """Depthwise causal conv, kernel K (reference Conv1d:53-75).
        x [B,S,W], state [B,K-1,W] -> (y, new_state)."""
        K = self.args.conv1d_width
        w = p["weight"].astype(jnp.float32)  # [W, K, 1] (channels-first)
        full = jnp.concatenate([state.astype(x.dtype), x], axis=1)
        xf = full.astype(jnp.float32)
        S = x.shape[1]
        y = sum(xf[:, k: k + S] * w[:, k, 0][None, None]
                for k in range(K))
        y = y + p["bias"].astype(jnp.float32)[None, None]
        return y.astype(x.dtype), full[:, -(K - 1):]

    def __call__(self, params, inputs_embeds, cache, position_ids):
        a = self.args
        B, S, D = inputs_embeds.shape
        eps = a.rms_norm_eps
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos, sin = self.rope.cos_sin(position_ids)
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask = causal_cache_mask(cache.offset, cache.left_pad, S,
                                 cache.capacity,
                                 window=a.attention_window_size)
        h = inputs_embeds
        mp = params["model"]
        conv_all, h_all = cache.conv, cache.h
        ks, vs = cache.k, cache.v
        for i in range(a.num_hidden_layers):
            lp = mp["layers"][str(i)]
            tb = lp["temporal_block"]
            x = rms_norm(lp["temporal_pre_norm"], h, eps, offset=1.0)
            if a.block_type(i) == "recurrent":
                y = jax.nn.gelu(linear(tb["linear_y"], x), approximate=True)
                xr = linear(tb["linear_x"], x)
                xr, conv_new = self._conv1d(tb["conv_1d"], xr, conv_all[i])
                xr, h_new = self._rglru(tb["rg_lru"], xr, h_all[i],
                                        position_ids)
                conv_all = conv_all.at[i].set(conv_new)
                h_all = h_all.at[i].set(h_new)
                r = linear(tb["linear_out"], xr * y)
            else:
                q = linear(tb["q_proj"], x).reshape(B, S, self.n_heads,
                                                    self.head_dim)
                k = linear(tb["k_proj"], x).reshape(B, S, 1, self.head_dim)
                v = linear(tb["v_proj"], x).reshape(B, S, 1, self.head_dim)
                q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
                qr, kr = apply_rope(q[..., :self.rot], k[..., :self.rot],
                                    cos, sin)
                q = jnp.concatenate([qr, q[..., self.rot:]], -1)
                k = jnp.concatenate([kr, k[..., self.rot:]], -1)
                attn, (k_b, v_b) = cache.attend((ks[i], vs[i]), q, k, v,
                                                self.scale, mask)
                ks = ks.at[i].set(k_b)
                vs = vs.at[i].set(v_b)
                attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
                r = linear(tb["o_proj"], attn)
            h = h + r
            x = rms_norm(lp["channel_pre_norm"], h, eps, offset=1.0)
            mb = lp["mlp_block"]
            gate = jax.nn.gelu(linear(mb["gate_proj"], x), approximate=True)
            h = h + linear(mb["down_proj"], gate * linear(mb["up_proj"], x))
        h = rms_norm(mp["final_norm"], h, eps, offset=1.0)
        if made:
            return h, None
        return h, dataclasses.replace(
            cache, conv=conv_all, h=h_all, k=ks, v=vs,
            offset=cache.offset + S)

    def logits(self, params, hidden):
        if "lm_head" in params:
            out = linear(params["lm_head"], hidden)
        else:
            out = embedding_as_linear(params["model"]["embed_tokens"],
                                      hidden)
        c = self.args.logits_soft_cap
        if c:
            out = jnp.tanh(out / c) * c
        return out

    def embed(self, params, input_ids):
        h = embedding(params["model"]["embed_tokens"], input_ids)
        if self.args.embeddings_scale_by_sqrt_dim:
            h = h * self.args.hidden_size**0.5
        return h

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None):
        a = self.args
        L = a.num_hidden_layers
        W = a.hidden_size  # lru_width defaults to hidden_size
        K = a.conv1d_width
        hd = a.hidden_size // a.num_attention_heads
        if left_pad is None:
            left_pad = jnp.zeros((batch_size,), jnp.int32)
        return GriffinCache(
            conv=jnp.zeros((L, batch_size, K - 1, W), dtype),
            h=jnp.zeros((L, batch_size, W), dtype),
            k=jnp.zeros((L, batch_size, 1, capacity, hd), dtype),
            v=jnp.zeros((L, batch_size, 1, capacity, hd), dtype),
            offset=jnp.zeros((), jnp.int32),
            left_pad=left_pad,
        )


class Model:
    CONFIG_CLS = TextConfig

    def __init__(self, config: TextConfig):
        self.config = config
        self.language_model = LanguageModel(config)

    def get_input_embeddings(self, params, input_ids, pixel_values=None,
                             **aux):
        return self.language_model.embed(params["language_model"], input_ids)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache,
                                            position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return text_position_ids(input_ids, attention_mask)

    def vision_aux_inputs(self, grid_thw):
        return {}

    def sanitize(self, weights: dict) -> dict:
        import numpy as np

        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            if "conv_1d.weight" in k:
                v = np.asarray(v)
                if v.ndim == 3 and v.shape[-1] != 1:
                    # HF stores [W, 1, K]; runtime wants [W, K, 1]
                    v = np.moveaxis(v, 2, 1)
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return ()


__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel"]
