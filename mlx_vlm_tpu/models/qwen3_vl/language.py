"""Qwen3-VL language model (Qwen3 decoder: q/k norms + interleaved M-RoPE
+ deepstack visual injection).

Role parity: reference mlx_vlm/models/qwen3_vl/language.py — q_norm/k_norm
(RMSNorm over head_dim):59-60, interleaved mrope style:19-37,
_deepstack_process (add visual embeds to the first N layers' outputs):233-266,
get_rope_index:282 (shared numpy routine, qwen2_vl/language.py).

TPU design: deepstack features arrive CHANNEL-PACKED in inputs_embeds
([B, S, D*(1+n_ds)]; layers i<n_ds each get slice i added after their
output).  This keeps the engine interface a single array — prefill chunking
slices positions, which stays aligned — and turns the reference's per-row
masked scatter into a pre-scattered dense add.  The layer scan is split in
two: the first n_ds layers consume the deepstack slices as scan xs, the
rest run the plain body.  Decode steps pass plain [B, 1, D] embeds and take
the single-scan path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import embedding, embedding_as_linear, linear, rms_norm, swiglu_mlp
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, make_rope
from ...ops.attention import sdpa
from ..qwen2_vl.language import mrope_position_ids
from .config import ModelConfig, TextConfig


class LanguageModel:
    def __init__(self, args: TextConfig, config: Optional[ModelConfig] = None):
        self.args = args
        self.config = config
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.head_dim
        self.scale = self.head_dim**-0.5
        self.rope = make_rope(
            self.head_dim,
            args.rope_theta,
            args.rope_scaling,
            args.max_position_embeddings or 262144,
            mrope_style="interleaved",  # reference language.py:32
        )

    def __call__(self, params, inputs_embeds, cache, position_ids):
        args = self.args
        D = args.hidden_size
        B, S, width = inputs_embeds.shape
        ds = None
        if width != D:  # channel-packed deepstack prefill
            n_ds = width // D - 1
            ds = inputs_embeds[..., D:].reshape(B, S, n_ds, D)
            ds = jnp.moveaxis(ds, 2, 0)  # [n_ds, B, S, D]
            inputs_embeds = inputs_embeds[..., :D]
        cos, sin = self.rope.cos_sin(position_ids)
        h = inputs_embeds
        mp = params["model"]
        eps = args.rms_norm_eps

        if cache is None:
            zero = jnp.zeros((), jnp.int32)
            mask = causal_cache_mask(zero, jnp.zeros((B,), jnp.int32), S, S)
        else:
            mask = causal_cache_mask(cache.offset, cache.left_pad, S, cache.capacity)

        def body(h, lp, cxs, ds_l):
            x = rms_norm(lp["input_layernorm"], h, eps)
            q, k, v = self._qkv(lp["self_attn"], x)
            q, k = apply_rope(q, k, cos, sin)
            if cache is None:
                attn = sdpa(q, k, v, self.scale, mask)
            else:
                attn, cxs = cache.attend(cxs, q, k, v, self.scale, mask)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
            h = h + linear(lp["self_attn"]["o_proj"], attn)
            x = rms_norm(lp["post_attention_layernorm"], h, eps)
            h = h + self._mlp(lp["mlp"], x)
            if ds_l is not None:  # reference language.py:220-229
                h = h + ds_l.astype(h.dtype)
            return h, cxs

        layers = mp["layers"]
        if cache is None:
            if ds is None:
                h, _ = jax.lax.scan(lambda c, lp: body(c, lp, None, None), h, layers)
            else:
                n = ds.shape[0]
                first = jax.tree.map(lambda a: a[:n], layers)
                rest = jax.tree.map(lambda a: a[n:], layers)
                h, _ = jax.lax.scan(
                    lambda c, xs: body(c, xs[0], None, xs[1]), h, (first, ds)
                )
                h, _ = jax.lax.scan(lambda c, lp: body(c, lp, None, None), h, rest)
            return rms_norm(mp["norm"], h, eps), None

        cxs_all = cache.scan_arrays()
        if ds is None:
            h, cys = jax.lax.scan(
                lambda c, xs: body(c, xs[0], xs[1], None), h, (layers, cxs_all)
            )
        else:
            n = ds.shape[0]
            first = jax.tree.map(lambda a: a[:n], layers)
            rest = jax.tree.map(lambda a: a[n:], layers)
            c1 = jax.tree.map(lambda a: a[:n], cxs_all)
            c2 = jax.tree.map(lambda a: a[n:], cxs_all)
            h, cys1 = jax.lax.scan(
                lambda c, xs: body(c, xs[0], xs[1], xs[2]), h, (first, c1, ds)
            )
            h, cys2 = jax.lax.scan(
                lambda c, xs: body(c, xs[0], xs[1], None), h, (rest, c2)
            )
            cys = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b], axis=0), cys1, cys2
            )
        h = rms_norm(mp["norm"], h, eps)
        return h, cache.with_arrays(cys, S)

    def _mlp(self, p, x):  # overridden by the MoE variant
        return swiglu_mlp(p, x)

    def _qkv(self, p, x):
        B, S, _ = x.shape
        eps = self.args.rms_norm_eps
        q = linear(p["q_proj"], x).reshape(B, S, self.n_heads, self.head_dim)
        k = linear(p["k_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        v = linear(p["v_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        q = rms_norm(p["q_norm"], q, eps)
        k = rms_norm(p["k_norm"], k, eps)
        return q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)

    def logits(self, params, hidden):
        if self.args.tie_word_embeddings or "lm_head" not in params:
            return embedding_as_linear(params["model"]["embed_tokens"], hidden)
        return linear(params["lm_head"], hidden)

    def embed(self, params, input_ids):
        return embedding(params["model"]["embed_tokens"], input_ids)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16, left_pad=None):
        return cache_lib.init_cache(
            self.args.num_hidden_layers, batch_size, self.n_kv_heads,
            self.head_dim, capacity, dtype, left_pad,
        )

    # ----------------------------------------------------------------- host
    def get_rope_index(
        self,
        input_ids: np.ndarray,
        image_grid_thw: Optional[np.ndarray] = None,
        video_grid_thw: Optional[np.ndarray] = None,
        attention_mask: Optional[np.ndarray] = None,
    ):
        cfg = self.config
        return mrope_position_ids(
            input_ids, image_grid_thw, video_grid_thw, attention_mask,
            merge=cfg.vision_config.spatial_merge_size,
            image_token_id=cfg.image_token_id,
            video_token_id=cfg.video_token_id,
        )
