"""Baichuan-M1 text model.

Role parity: reference mlx_vlm/models/baichuan_m1/language.py — fused
W_pack qkv, a depthwise 2-tap causal convolution over the RAW (pre-rope)
keys and values whose single-token state persists across decode steps
(_custom_convolution:58, conv state in an ArraysCache:213), mixed
sliding/global layers with optionally different head counts on sliding
layers, and an L2-NORMALIZED lm_head (sanitize:223 — rows divided by
their norm at load).

TPU design: heterogeneous head counts run as a trace-time Python loop;
the cache is a custom pytree dataclass carrying the usual [L,B,H,C,D]
KV buffers at max head count PLUS [L,B,H,1,D] raw-token conv states, so
one jitted step threads everything.  The 2-tap conv is expressed as
shift-and-blend (w0 * u[t-1] + w1 * u[t]) — no conv primitive needed.
"""

from __future__ import annotations

import dataclasses
import inspect
import re
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import (embedding, embedding_as_linear, linear, rms_norm,
                            swiglu_mlp)
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, make_rope
from ...core.config import BaseModelConfig
from ..llama.llama import text_position_ids


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "baichuan_m1"
    vocab_size: int = 133120
    hidden_size: int = 5120
    intermediate_size: int = 17408
    num_hidden_layers: int = 40
    num_attention_heads: int = 20
    num_key_value_heads: int = 2
    rope_theta: float = 100000.0
    sliding_window: int = 2048
    sliding_window_layers: List[int] = field(default_factory=list)
    conv_window: int = 2
    rms_norm_eps: float = 1e-6
    num_swa_attention_heads: Optional[int] = None
    num_swa_key_value_heads: Optional[int] = None
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 32768

    @classmethod
    def from_dict(cls, params: dict):
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})

    def heads_for(self, i: int):
        swa = i in self.sliding_window_layers
        nh = (self.num_swa_attention_heads
              if swa and self.num_swa_attention_heads
              else self.num_attention_heads)
        nkv = (self.num_swa_key_value_heads
               if swa and self.num_swa_key_value_heads
               else self.num_key_value_heads)
        return nh, nkv


ModelConfig = TextConfig


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "raw_k", "raw_v", "offset", "left_pad"],
    meta_fields=[],
)
@dataclasses.dataclass
class BaichuanCache:
    """KV buffers + last raw-token conv state per layer."""

    k: jax.Array  # [L, B, maxH, C, D]
    v: jax.Array
    raw_k: jax.Array  # [L, B, maxH, 1, D] — pre-conv last token
    raw_v: jax.Array
    offset: jax.Array
    left_pad: jax.Array

    @property
    def capacity(self) -> int:
        return self.k.shape[3]

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]

    def attend(self, cxs, q, k, v, scale, mask, **kw):
        # reuse the shared per-layer update+sdpa (KVCache.attend semantics)
        from ...core.cache import KVCache

        return KVCache.attend(self, cxs, q, k, v, scale, mask, **kw)


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.head_dim = args.hidden_size // args.num_attention_heads
        self.scale = self.head_dim**-0.5
        self.max_kv = max(args.heads_for(i)[1]
                          for i in range(args.num_hidden_layers))
        self.rope = make_rope(self.head_dim, args.rope_theta, None,
                              args.max_position_embeddings)

    @staticmethod
    def _conv2(u, w, state):
        """w0 * u[t-1] + w1 * u[t] over the time axis (reference
        _custom_convolution:58).  u: [B,H,S,D], w: [H,2], state: [B,H,1,D]."""
        w0 = w[:, 0][None, :, None, None]
        w1 = w[:, 1][None, :, None, None]
        u_prev = jnp.concatenate([state.astype(u.dtype), u[:, :, :-1]],
                                 axis=2)
        return u_prev * w0 + u * w1

    def __call__(self, params, inputs_embeds, cache, position_ids):
        a = self.args
        B, S, _ = inputs_embeds.shape
        eps = a.rms_norm_eps
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos, sin = self.rope.cos_sin(position_ids)
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask_f = causal_cache_mask(cache.offset, cache.left_pad, S,
                                   cache.capacity)
        mask_s = causal_cache_mask(cache.offset, cache.left_pad, S,
                                   cache.capacity, window=a.sliding_window)
        h = inputs_embeds
        mp = params["model"]
        ks, vs = cache.k, cache.v
        rks, rvs = cache.raw_k, cache.raw_v
        swa_set = set(a.sliding_window_layers)
        for i in range(a.num_hidden_layers):
            lp = mp["layers"][str(i)]
            nh, nkv = a.heads_for(i)
            x = rms_norm(lp["input_layernorm"], h, eps)
            sa = lp["self_attn"]
            q = linear(sa["q_proj"], x).reshape(B, S, nh, self.head_dim)
            k = linear(sa["k_proj"], x).reshape(B, S, nkv, self.head_dim)
            v = linear(sa["v_proj"], x).reshape(B, S, nkv, self.head_dim)
            q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            # stash raw last token, then conv with the previous state
            k_c = self._conv2(k, sa["conv_k"], rks[i][:, :nkv])
            v_c = self._conv2(v, sa["conv_v"], rvs[i][:, :nkv])
            rks = rks.at[i, :, :nkv].set(k[:, :, -1:].astype(rks.dtype))
            rvs = rvs.at[i, :, :nkv].set(v[:, :, -1:].astype(rvs.dtype))
            q, k_c = apply_rope(q, k_c, cos, sin)
            mask = mask_s if i in swa_set else mask_f
            attn, (k_b, v_b) = cache.attend(
                (ks[i][:, :nkv], vs[i][:, :nkv]), q, k_c, v_c, self.scale,
                mask)
            ks = ks.at[i, :, :nkv].set(k_b)
            vs = vs.at[i, :, :nkv].set(v_b)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
            h = h + linear(sa["o_proj"], attn)
            x = rms_norm(lp["post_attention_layernorm"], h, eps)
            h = h + swiglu_mlp(lp["mlp"], x)
        h = rms_norm(mp["norm"], h, eps)
        if made:
            return h, None
        return h, dataclasses.replace(cache, k=ks, v=vs, raw_k=rks,
                                      raw_v=rvs, offset=cache.offset + S)

    def logits(self, params, hidden):
        if self.args.tie_word_embeddings or "lm_head" not in params:
            return embedding_as_linear(params["model"]["embed_tokens"],
                                       hidden)
        return linear(params["lm_head"], hidden)

    def embed(self, params, input_ids):
        return embedding(params["model"]["embed_tokens"], input_ids)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None):
        a = self.args
        L = a.num_hidden_layers
        if left_pad is None:
            left_pad = jnp.zeros((batch_size,), jnp.int32)
        kv = (L, batch_size, self.max_kv, capacity, self.head_dim)
        raw = (L, batch_size, self.max_kv, 1, self.head_dim)
        return BaichuanCache(
            k=jnp.zeros(kv, dtype), v=jnp.zeros(kv, dtype),
            raw_k=jnp.zeros(raw, dtype), raw_v=jnp.zeros(raw, dtype),
            offset=jnp.zeros((), jnp.int32), left_pad=left_pad,
        )


_PACK_RE = re.compile(r"^model\.layers\.(\d+)\.self_attn\.W_pack\.weight$")
_CONV_RE = re.compile(r"^model\.layers\.(\d+)\.self_attn\.(conv_k|conv_v)$")


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
        a = self.config
        hd = a.hidden_size // a.num_attention_heads
        out = {}
        for k, v in weights.items():
            m = _PACK_RE.match(k)
            if m:
                i = int(m.group(1))
                nh, nkv = a.heads_for(i)
                base = f"language_model.model.layers.{i}.self_attn"
                out[f"{base}.q_proj.weight"] = v[: nh * hd]
                out[f"{base}.k_proj.weight"] = v[nh * hd: (nh + nkv) * hd]
                out[f"{base}.v_proj.weight"] = v[(nh + nkv) * hd:]
                continue
            m = _CONV_RE.match(k)
            if m:
                # stored [1,1,H,1,2] -> [H,2]
                i, name = m.group(1), m.group(2)
                out[(f"language_model.model.layers.{i}.self_attn.{name}"
                     )] = np.asarray(v).reshape(-1, 2)
                continue
            if k == "lm_head.weight":
                # normed head (reference sanitize:223)
                w = np.asarray(v, np.float32)
                w = w / (np.linalg.norm(w, axis=-1, keepdims=True) + 1e-7)
                out["language_model.lm_head.weight"] = w.astype(v.dtype)
                continue
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return ()


__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel"]
