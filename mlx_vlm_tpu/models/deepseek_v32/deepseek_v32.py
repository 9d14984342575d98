"""DeepSeek-V3.2: MLA + MoE decoder with DSA sparse attention.

Role parity: reference mlx_vlm/models/deepseek_v32/language.py — the
lightning Indexer (:21) scores every cached position per query with a
small relu-gated multi-head product, and attention is restricted to the
top `index_topk` positions (:171-196).  Built on the deepseek_v2 module
(MLA latent cache, noaux_tc MoE, first-k-dense python loop).

TPU design: the indexer keeps its own per-position key cache (ik in
DSACache) and the top-k restriction is applied as a scatter mask over the
fixed-capacity latent buffer (`jnp.put_along_axis` of a static-k
`lax.top_k`) — static shapes throughout, and a trace-time no-op when the
cache capacity is not above index_topk (matching the reference's
`k.shape[2] <= index_topk` early-out).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ...core.layers import layer_norm, linear, rms_norm
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope
from ..deepseek_v2.deepseek_v2 import LanguageModel as _V2LM
from ..deepseek_v2.deepseek_v2 import MLACache
from ..deepseek_v2.deepseek_v2 import Model as _V2Model
from ..deepseek_v2.deepseek_v2 import ModelConfig as _V2Config


@dataclass
class ModelConfig(_V2Config):
    model_type: str = "deepseek_v32"
    index_head_dim: int = 128
    index_n_heads: int = 64
    index_topk: int = 2048


@dataclasses.dataclass
class DSACache(MLACache):
    """MLA latent cache + indexer key cache ik [L, B, C, index_head_dim]."""

    ik: jax.Array = None


jax.tree_util.register_dataclass(
    DSACache, data_fields=["c", "kpe", "offset", "left_pad", "ik"],
    meta_fields=[])


class LanguageModel(_V2LM):
    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None):
        base = super().init_cache(batch_size, capacity, dtype, left_pad)
        a = self.args
        return DSACache(
            c=base.c, kpe=base.kpe, offset=base.offset,
            left_pad=base.left_pad,
            ik=jnp.zeros((a.num_hidden_layers, batch_size, capacity,
                          a.index_head_dim), dtype),
        )

    def _index_mask(self, sa, x, cos, sin, mask, cache, layer_idx):
        """-> (sparse attention mask, updated indexer-key buffer)."""
        a = self.args
        B, S, _ = x.shape
        Hi, Di = a.index_n_heads, a.index_head_dim
        idxp = sa["indexer"]
        qr = rms_norm(sa["q_a_layernorm"], linear(sa["q_a_proj"], x), 1e-6)
        q_i = linear(idxp["wq_b"], qr).reshape(B, S, Hi, Di).transpose(
            0, 2, 1, 3)
        k_i = layer_norm(idxp["k_norm"], linear(idxp["wk"], x))  # [B, S, Di]
        # partial rope over the first qk_rope_head_dim lanes (shared angles)
        q_i, k_i4 = apply_rope(q_i, k_i[:, None], cos, sin)
        k_i = k_i4[:, 0]
        zero = jnp.zeros((), jnp.int32)
        ik_buf = jax.lax.dynamic_update_slice(
            cache.ik[layer_idx], k_i.astype(cache.ik.dtype),
            (zero, cache.offset, zero))
        C = ik_buf.shape[1]
        if C <= a.index_topk:
            return mask, ik_buf  # dense attention is already exact
        scores = jnp.maximum(
            jnp.einsum("bhsd,bjd->bhsj", q_i.astype(jnp.float32),
                       ik_buf.astype(jnp.float32),
                       preferred_element_type=jnp.float32), 0.0)
        w = linear(idxp["weights_proj"], x).astype(jnp.float32)  # [B, S, Hi]
        w = w * (Hi**-0.5) * (Di**-0.5)
        scores = jnp.einsum("bhsj,bsh->bsj", scores, w)[:, None]  # [B,1,S,C]
        scores = jnp.where(mask, scores, -jnp.inf)
        _, top_idx = jax.lax.top_k(scores, a.index_topk)  # [B,1,S,k]
        sparse = jnp.put_along_axis(
            jnp.zeros(scores.shape, bool), top_idx, True, axis=-1,
            inplace=False)
        return jnp.logical_and(sparse, mask), ik_buf

    def _mla(self, lp, x, cos, sin, mask, cache, layer_idx):
        sparse_mask, ik_buf = self._index_mask(
            lp["self_attn"], x, cos, sin, mask, cache, layer_idx)
        attn, c_buf, kpe_buf = super()._mla(
            lp, x, cos, sin, sparse_mask, cache, layer_idx)
        return attn, c_buf, kpe_buf, ik_buf

    def __call__(self, params, inputs_embeds, cache: DSACache,
                 position_ids):
        a = self.args
        B, S, _ = inputs_embeds.shape
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos, sin = self.rope.cos_sin(position_ids)
        mask = causal_cache_mask(cache.offset, cache.left_pad, S,
                                 cache.capacity)
        h = inputs_embeds
        mp = params["model"]
        c_all, kpe_all, ik_all = cache.c, cache.kpe, cache.ik
        for i in range(a.num_hidden_layers):
            lp = mp["layers"][str(i)]
            x = rms_norm(lp["input_layernorm"], h, a.rms_norm_eps)
            attn, c_buf, kpe_buf, ik_buf = self._mla(lp, x, cos, sin, mask,
                                                     cache, i)
            c_all = c_all.at[i].set(c_buf)
            kpe_all = kpe_all.at[i].set(kpe_buf)
            ik_all = ik_all.at[i].set(ik_buf)
            h = h + attn
            x = rms_norm(lp["post_attention_layernorm"], h, a.rms_norm_eps)
            h = h + self._moe_or_dense(lp, x)
        h = rms_norm(mp["norm"], h, a.rms_norm_eps)
        new_cache = dataclasses.replace(
            cache, c=c_all, kpe=kpe_all, ik=ik_all, offset=cache.offset + S)
        return h, new_cache


class Model(_V2Model):
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config, config)
