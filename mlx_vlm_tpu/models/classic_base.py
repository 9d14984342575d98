"""Shared decoder for the classic GPT-era text families.

Role parity: reference mlx_vlm/models/{gpt2,gpt_neox,starcoder2,stablelm,
nemotron}/language.py — small pre-rope/partial-rope decoders differing in
norm flavour, residual topology, MLP activation and positional scheme.

TPU design: one scan-stacked decoder parameterised by static config
flags; each family canonicalises its checkpoint keys to
  model.{wte, wpe?, ln_f} layers.{i}.{ln1, ln2?, attn.{q,k,v,o}_proj,
  attn.{q,k}_norms?, mlp.*}
at sanitize time so the hot path is a single compiled program shape.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..core import cache as cache_lib
from ..core.layers import layer_norm, linear, rms_norm
from ..core.mask import causal_cache_mask
from ..core.quant_scan import scan_layers
from ..core.rope import apply_rope, default_inv_freq
from ..ops.attention import sdpa


@dataclasses.dataclass
class ClassicConfig:
    model_type: str = "gpt2"
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    num_key_value_heads: Optional[int] = None
    head_dim: Optional[int] = None
    intermediate_size: Optional[int] = None
    vocab_size: int = 50257
    layer_norm_eps: float = 1e-5
    max_position_embeddings: int = 2048
    tie_word_embeddings: bool = True
    # positional scheme
    rope_pct: float = 0.0  # 0 => learned absolute positions (wpe)
    rope_theta: float = 10000.0
    rope_scale: float = 1.0
    # topology / flavour
    norm: str = "layer"  # layer | layer1p | rms
    parallel: bool = False  # x + attn(ln1 x) + mlp(ln x) vs sequential
    parallel_shared_ln: bool = False  # parallel branches share ln1
    act: str = "gelu"  # gelu | gelu_tanh | relu2 | swiglu
    qk_headnorm: bool = False  # per-head LayerNorm stacks on q/k

    def __post_init__(self):
        if self.num_key_value_heads is None:
            self.num_key_value_heads = self.num_attention_heads
        if self.head_dim is None:
            self.head_dim = self.hidden_size // self.num_attention_heads
        if self.intermediate_size is None:
            self.intermediate_size = 4 * self.hidden_size

    @classmethod
    def from_dict(cls, d: dict) -> "ClassicConfig":
        import inspect

        sig = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in d.items() if k in sig})


def _per_head_layer_norm(w, x, eps):
    """x [B, S, H, hd] normalized per head then scaled by w [H, hd]."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xn * w.astype(jnp.float32)[None, None]).astype(x.dtype)


class ClassicLanguageModel:
    def __init__(self, args: ClassicConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.head_dim
        self.scale = args.head_dim**-0.5
        self.rope_dim = int(args.head_dim * args.rope_pct)
        self.inv_freq = (
            jnp.asarray(default_inv_freq(self.rope_dim, args.rope_theta))
            * args.rope_scale if self.rope_dim else None)

    def _norm(self, p, x):
        a = self.args
        if a.norm == "rms":
            return rms_norm(p, x, a.layer_norm_eps)
        if a.norm == "layer1p":
            # NemotronLayerNorm1P: weight + 1 (reference nemotron :20)
            p = dict(p, weight=p["weight"] + 1.0)
        return layer_norm(p, x, a.layer_norm_eps)

    def _mlp(self, p, x):
        a = self.args
        if a.act == "swiglu":
            g = linear(p["gate_proj"], x)
            u = linear(p["up_proj"], x)
            return linear(p["down_proj"], jax.nn.silu(g) * u)
        if a.act == "relu2":
            h = jax.nn.relu(linear(p["up_proj"], x)) ** 2
            return linear(p["down_proj"], h)
        h = linear(p["fc1"], x)
        h = jax.nn.gelu(h, approximate=(a.act == "gelu_tanh"))
        return linear(p["fc2"], h)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None):
        return cache_lib.init_cache(
            self.args.num_hidden_layers, batch_size, self.n_kv_heads,
            self.head_dim, capacity, dtype, left_pad)

    def embed(self, params, input_ids):
        return jnp.take(params["model"]["wte"]["weight"], input_ids, axis=0)

    def logits(self, params, hidden):
        if self.args.tie_word_embeddings or "lm_head" not in params:
            w = params["model"]["wte"]["weight"]
            return jax.lax.dot_general(
                hidden, w, (((hidden.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(hidden.dtype)
        return linear(params["lm_head"], hidden)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        a = self.args
        B, S, _ = inputs_embeds.shape
        pos = position_ids[0] if position_ids.ndim == 3 else position_ids
        mp = params["model"]
        h = inputs_embeds
        if "wpe" in mp:
            h = h + jnp.take(mp["wpe"]["weight"], pos, axis=0).astype(
                h.dtype)
        cos = sin = None
        if self.inv_freq is not None:
            ang = pos.astype(jnp.float32)[..., None] * self.inv_freq
            cos, sin = jnp.cos(ang), jnp.sin(ang)

        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask = causal_cache_mask(cache.offset, cache.left_pad, S,
                                 cache.capacity)
        hd = self.head_dim

        def attn(lp, x, cxs):
            ap = lp["attn"]
            q = linear(ap["q_proj"], x).reshape(B, S, self.n_heads, hd)
            k = linear(ap["k_proj"], x).reshape(B, S, self.n_kv_heads, hd)
            v = linear(ap["v_proj"], x).reshape(B, S, self.n_kv_heads, hd)
            if a.qk_headnorm:
                q = _per_head_layer_norm(ap["q_norms"]["weight"], q,
                                         a.layer_norm_eps)
                k = _per_head_layer_norm(ap["k_norms"]["weight"], k,
                                         a.layer_norm_eps)
            q = q.transpose(0, 2, 1, 3)
            k = k.transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
            if cos is not None:
                qr, kr = apply_rope(q[..., :self.rope_dim],
                                    k[..., :self.rope_dim], cos, sin)
                q = jnp.concatenate([qr, q[..., self.rope_dim:]], axis=-1)
                k = jnp.concatenate([kr, k[..., self.rope_dim:]], axis=-1)
            kc, vc = cache_lib.update_layer(cxs[0], cxs[1], k, v,
                                            cache.offset)
            o = sdpa(q, kc, vc, self.scale, mask)
            o = o.transpose(0, 2, 1, 3).reshape(B, S, -1)
            return linear(ap["o_proj"], o), (kc, vc)

        def layer(h, lp, cxs):
            if a.parallel:
                x1 = self._norm(lp["ln1"], h)
                x2 = x1 if a.parallel_shared_ln else self._norm(lp["ln2"],
                                                                h)
                at, nxt = attn(lp, x1, cxs)
                return h + at + self._mlp(lp["mlp"], x2), nxt
            x = self._norm(lp["ln1"], h)
            at, nxt = attn(lp, x, cxs)
            h = h + at
            x = self._norm(lp["ln2"], h)
            return h + self._mlp(lp["mlp"], x), nxt

        h, cys = scan_layers(layer, h, mp["layers"], cache.scan_arrays())
        h = self._norm(mp["ln_f"], h)
        return h, (None if made else cache.with_arrays(cys, S))


class ClassicModel:
    """Framework-uniform wrapper; subclasses set CONFIG_CLS + sanitize."""

    CONFIG_CLS = ClassicConfig

    def __init__(self, config):
        self.config = config
        self.language_model = ClassicLanguageModel(config, config)

    def get_input_embeddings(self, params, input_ids, pixel_values=None,
                             **aux):
        return self.language_model.embed(params["language_model"],
                                         input_ids)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache,
                                            position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        from .llama.llama import text_position_ids

        return text_position_ids(input_ids, attention_mask)

    def vision_aux_inputs(self, grid_thw):
        return {}

    @property
    def stack_patterns(self):
        return ("language_model.model.layers",)
