"""HRM-Text (Hierarchical Recurrent Model) text model.

Role parity: reference mlx_vlm/models/hrm_text/language.py — TWO
weight-shared decoder stacks (L_module / H_module of
num_layers_per_stack layers each, each ending in a weightless RMSNorm)
cycled hierarchically: per high cycle, the L stack runs L_cycles times
on (z_L + z_H) and then the H stack updates z_H from (z_H + z_L)
(HrmTextModel:245-263).  Every stack APPLICATION gets its own KV cache
slice, so the effective cache depth is stack * H_cycles * (L_cycles+1).
Attention is llama-shaped GQA with a per-head sigmoid output gate
(gate_proj, :138-139); norms are weightless RMS; embeds scale by
1/initializer_range; z_L starts from a learned z_L_init vector.

TPU design: trace-time loop over cycles reusing the SAME param subtree
per stack (weight sharing costs nothing under jit — XLA sees one
constant) while cache layers advance per application.
"""

from __future__ import annotations

import dataclasses
import inspect
from dataclasses import dataclass
from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import embedding, embedding_as_linear, linear, swiglu_mlp
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, make_rope
from ...core.config import BaseModelConfig
from ..llama.llama import text_position_ids


def _rms(x, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "hrm_text"
    vocab_size: int = 151808
    hidden_size: int = 1536
    intermediate_size: int = 4096
    num_hidden_layers: int = 16
    num_attention_heads: int = 12
    num_key_value_heads: int = 12
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    max_position_embeddings: int = 2048
    initializer_range: float = 0.02
    rope_theta: float = 10000.0
    attention_bias: bool = False
    mlp_bias: bool = False
    tie_word_embeddings: bool = False
    H_cycles: int = 2
    L_cycles: int = 3
    L_bp_cycles: Optional[List[int]] = None
    embedding_scale: Optional[float] = None
    prefix_lm: bool = True
    num_layers_per_stack: Optional[int] = None
    eos_token_id: Optional[Union[int, list]] = None

    def __post_init__(self):
        if self.embedding_scale is None:
            self.embedding_scale = 1.0 / self.initializer_range
        if self.num_layers_per_stack is None:
            self.num_layers_per_stack = self.num_hidden_layers
            self.num_hidden_layers = (
                self.num_layers_per_stack * self.H_cycles
                * (self.L_cycles + 1))

    @classmethod
    def from_dict(cls, params: dict):
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


ModelConfig = TextConfig


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.head_dim
        self.scale = args.head_dim**-0.5
        self.rope = make_rope(args.head_dim, args.rope_theta, None,
                              args.max_position_embeddings)

    def _layer(self, lp, h, cos, sin, mask, cache, ks, vs, ci):
        a = self.args
        B, S, _ = h.shape
        eps = a.rms_norm_eps
        x = _rms(h, eps)
        sa = lp["self_attn"]
        q = linear(sa["q_proj"], x).reshape(B, S, self.n_heads,
                                            self.head_dim)
        k = linear(sa["k_proj"], x).reshape(B, S, self.n_kv_heads,
                                            self.head_dim)
        v = linear(sa["v_proj"], x).reshape(B, S, self.n_kv_heads,
                                            self.head_dim)
        gate = linear(sa["gate_proj"], x).reshape(B, S, self.n_heads,
                                                  self.head_dim)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        q, k = apply_rope(q, k, cos, sin)
        attn, (k_b, v_b) = cache.attend((ks[ci], vs[ci]), q, k, v,
                                        self.scale, mask)
        ks = ks.at[ci].set(k_b)
        vs = vs.at[ci].set(v_b)
        attn = attn.transpose(0, 2, 1, 3) * jax.nn.sigmoid(
            gate.astype(jnp.float32)).astype(attn.dtype)
        h = h + linear(sa["o_proj"], attn.reshape(B, S, -1))
        x = _rms(h, eps)
        return h + swiglu_mlp(lp["mlp"], x), ks, vs

    def _stack(self, sp, h, cos, sin, mask, cache, ks, vs, base):
        a = self.args
        for j in range(a.num_layers_per_stack):
            h, ks, vs = self._layer(sp["layers"][str(j)], h, cos, sin,
                                    mask, cache, ks, vs, base + j)
        return _rms(h, a.rms_norm_eps), ks, vs

    def __call__(self, params, inputs_embeds, cache, position_ids):
        a = self.args
        B, S, D = inputs_embeds.shape
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos, sin = self.rope.cos_sin(position_ids)
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask = causal_cache_mask(cache.offset, cache.left_pad, S,
                                 cache.capacity)
        mp = params["model"]
        z_h = inputs_embeds  # embed() already applied embedding_scale
        z_l = jnp.broadcast_to(
            mp["z_L_init"].astype(z_h.dtype), z_h.shape)
        ks, vs = cache.k, cache.v
        n = a.num_layers_per_stack
        for hc in range(a.H_cycles):
            for lc in range(a.L_cycles):
                base = (hc * (a.L_cycles + 1) + lc) * n
                z_l, ks, vs = self._stack(mp["L_module"], z_l + z_h, cos,
                                          sin, mask, cache, ks, vs, base)
            base = (hc * (a.L_cycles + 1) + a.L_cycles) * n
            z_h, ks, vs = self._stack(mp["H_module"], z_h + z_l, cos, sin,
                                      mask, cache, ks, vs, base)
        if made:
            return z_h, None
        return z_h, dataclasses.replace(cache, k=ks, v=vs,
                                        offset=cache.offset + S)

    def logits(self, params, hidden):
        if self.args.tie_word_embeddings or "lm_head" not in params:
            return embedding_as_linear(params["model"]["embed_tokens"],
                                       hidden)
        return linear(params["lm_head"], hidden)

    def embed(self, params, input_ids):
        h = embedding(params["model"]["embed_tokens"], input_ids)
        return h * self.args.embedding_scale

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None):
        return cache_lib.init_cache(
            self.args.num_hidden_layers, batch_size, self.n_kv_heads,
            self.head_dim, capacity, dtype, left_pad,
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

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return ()


__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel"]
