"""Phi-3-small text model.

Role parity: reference mlx_vlm/models/phi3small/language.py — fused
query_key_value in kv-group-interleaved layout ([nkv, q_per_kv+2, hd]
row blocks, :135-138), gegelu MLP on channel-interleaved up_proj
(gelu = even channels, linear = odd, :32-34) with clipping limit, muP
scalings (embed * mup_embedding_multiplier, attn scale
mup_attn_multiplier/head_dim, logits / mup_width_multiplier), LayerNorm
(with bias) everywhere, tied output head with dummy-tokenizer ids masked
to -inf (on the vocab axis — HF semantics; reference :258 indexes the
wrong axis), and per-head blocksparse attention on every layer where
layer_idx % dense_attention_every_n_layers == 0: block (q,k) is visible
iff causal AND (local: q_blk - k_blk < num_local_blocks OR vertical:
(k_blk + head + 1) % vert_stride == 0) (:80-105).

TPU design: one `lax.scan` over uniform stacked layers; the blocksparse
pattern is evaluated from token positions as a [H, S, C] boolean plane
ANDed with the causal/validity mask, selected per layer by a scanned
flag — XLA folds the select, no gather/scatter.  Fused qkv and
interleaved gegelu channels are re-laid-out once at sanitize so the
runtime consumes plain q/k/v + [gate|up] linears.
"""

from __future__ import annotations

import inspect
import re
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import (embedding, embedding_as_linear, layer_norm,
                            linear)
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, make_rope
from ...core.config import BaseModelConfig
from ..llama.llama import text_position_ids

_DUMMY_IDS = ([100256, 100258, 100259, 100260, 100264, 100265]
              + list(range(100267, 100352)))


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "phi3small"
    hidden_size: int = 4096
    dense_attention_every_n_layers: int = 2
    ff_intermediate_size: int = 14336
    gegelu_limit: float = 20.0
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    layer_norm_epsilon: float = 1e-5
    vocab_size: int = 100352
    num_key_value_heads: int = 8
    mup_attn_multiplier: float = 1.0
    mup_use_scaling: bool = True
    mup_embedding_multiplier: float = 10.0
    mup_width_multiplier: float = 8.0
    rope_embedding_base: float = 1000000
    rope_position_scale: float = 1.0
    blocksparse_block_size: int = 64
    blocksparse_num_local_blocks: int = 16
    blocksparse_vert_stride: int = 8
    max_position_embeddings: int = 8192

    @classmethod
    def from_dict(cls, params: dict):
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})

    def is_block_sparse(self, i: int) -> bool:
        return i % self.dense_attention_every_n_layers == 0

    @property
    def rms_norm_eps(self):
        return self.layer_norm_epsilon


ModelConfig = TextConfig


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.hidden_size // args.num_attention_heads
        if args.mup_use_scaling:
            self.scale = args.mup_attn_multiplier / self.head_dim
        else:
            self.scale = self.head_dim**-0.5
        scaling = None
        if args.rope_position_scale != 1.0:
            scaling = {"type": "linear",
                       "factor": 1.0 / args.rope_position_scale}
        self.rope = make_rope(self.head_dim, args.rope_embedding_base,
                              scaling, args.max_position_embeddings)
        self.sparse_flags = np.asarray(
            [args.is_block_sparse(i) for i in range(args.num_hidden_layers)])

    def _blocksparse_plane(self, position_ids, capacity):
        """[H, S, C] visibility of kv slot j to query position p per head."""
        a = self.args
        bs = a.blocksparse_block_size
        q_blk = position_ids[0] // bs  # [S] (shared across batch rows)
        k_blk = jnp.arange(capacity, dtype=jnp.int32) // bs  # [C]
        h = jnp.arange(self.n_heads, dtype=jnp.int32)
        local = (q_blk[:, None] - k_blk[None, :]
                 < a.blocksparse_num_local_blocks)  # [S, C]
        vert = ((k_blk[None, :] + h[:, None] + 1)
                % a.blocksparse_vert_stride == 0)  # [H, C]
        causal = q_blk[:, None] >= k_blk[None, :]  # [S, C]
        return causal[None] & (local[None] | vert[:, None, :])  # [H, S, C]

    def __call__(self, params, inputs_embeds, cache, position_ids):
        a = self.args
        B, S, _ = inputs_embeds.shape
        eps = a.layer_norm_epsilon
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos, sin = self.rope.cos_sin(position_ids)
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask_d = causal_cache_mask(cache.offset, cache.left_pad, S,
                                   cache.capacity)  # [B,1,S,C]
        bs_plane = self._blocksparse_plane(position_ids, cache.capacity)
        mask_s = mask_d & bs_plane[None]  # [B,H,S,C]
        flags = jnp.asarray(self.sparse_flags)
        h = inputs_embeds
        mp = params["model"]

        def layer(h, xs):
            lp, cxs, sparse = xs
            mask = jnp.where(sparse, mask_s, mask_d)
            x = layer_norm(lp["input_layernorm"], h, eps)
            sa = lp["self_attn"]
            q = linear(sa["q_proj"], x).reshape(B, S, self.n_heads,
                                                self.head_dim)
            k = linear(sa["k_proj"], x).reshape(B, S, self.n_kv_heads,
                                                self.head_dim)
            v = linear(sa["v_proj"], x).reshape(B, S, self.n_kv_heads,
                                                self.head_dim)
            q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            q, k = apply_rope(q, k, cos, sin)
            attn, cxs = cache.attend(cxs, q, k, v, self.scale, mask,
                                     flash_ok=False)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
            h = h + linear(sa["dense"], attn)
            x = layer_norm(lp["post_attention_layernorm"], h, eps)
            mlp = lp["mlp"]
            g = linear(mlp["gate_proj"], x)
            u = linear(mlp["up_proj"], x)
            lim = a.gegelu_limit
            g = jnp.minimum(g, lim)
            u = jnp.clip(u, -lim, lim)
            act = g * jax.nn.sigmoid(1.702 * g) * (u + 1.0)
            h = h + linear(mlp["down_proj"], act)
            return h, cxs

        h, cys = jax.lax.scan(layer, h,
                              (mp["layers"], cache.scan_arrays(), flags))
        h = layer_norm(mp["final_layernorm"], h, eps)
        return h, (None if made else cache.with_arrays(cys, S))

    def logits(self, params, hidden):
        a = self.args
        out = embedding_as_linear(params["model"]["embed_tokens"], hidden)
        if a.mup_width_multiplier:
            out = out / a.mup_width_multiplier
        dummy = [i for i in _DUMMY_IDS if i < a.vocab_size]
        if dummy:
            out = out.at[..., jnp.asarray(dummy)].set(-jnp.inf)
        return out

    def embed(self, params, input_ids):
        h = embedding(params["model"]["embed_tokens"], input_ids)
        if self.args.mup_embedding_multiplier:
            h = h * self.args.mup_embedding_multiplier
        return h

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None):
        return cache_lib.init_cache(
            self.args.num_hidden_layers, batch_size, self.n_kv_heads,
            self.head_dim, capacity, dtype, left_pad,
        )


_QKV_RE = re.compile(
    r"^model\.layers\.(\d+)\.self_attn\.query_key_value\.(weight|bias)$")
_UP_RE = re.compile(r"^model\.layers\.(\d+)\.mlp\.up_proj\.(weight|bias)$")


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
        nkv = a.num_key_value_heads
        qpk = a.num_attention_heads // nkv
        out = {}
        for k, v in weights.items():
            if k.startswith("language_model."):
                k = k[len("language_model."):]
            m = _QKV_RE.match(k)
            if m:
                i, suf = m.group(1), m.group(2)
                w = np.asarray(v)
                blk = w.reshape(nkv, qpk + 2, hd, *w.shape[1:])
                base = f"language_model.model.layers.{i}.self_attn"
                out[f"{base}.q_proj.{suf}"] = blk[:, :qpk].reshape(
                    nkv * qpk * hd, *w.shape[1:])
                out[f"{base}.k_proj.{suf}"] = blk[:, qpk].reshape(
                    nkv * hd, *w.shape[1:])
                out[f"{base}.v_proj.{suf}"] = blk[:, qpk + 1].reshape(
                    nkv * hd, *w.shape[1:])
                continue
            m = _UP_RE.match(k)
            if m:
                # de-interleave gegelu channels: even rows -> gate (gelu
                # branch), odd rows -> up (linear branch)
                i, suf = m.group(1), m.group(2)
                w = np.asarray(v)
                base = f"language_model.model.layers.{i}.mlp"
                out[f"{base}.gate_proj.{suf}"] = w[0::2]
                out[f"{base}.up_proj.{suf}"] = w[1::2]
                continue
            if "rotary_emb.inv_freq" in k or k == "lm_head.weight":
                continue
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return ("language_model.model.layers",)


__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel"]
