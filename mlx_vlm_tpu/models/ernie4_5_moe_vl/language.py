"""ERNIE 4.5 VL MoE language model.

Role parity: reference mlx_vlm/models/ernie4_5_moe_vl/language.py —
Ernie4_5RotaryEmbedding (pre-rotated 3-D RoPE, :24), Ernie4_5_MoeMLP (dual
text/multimodal expert groups + correction bias, :193), mixed dense/MoE
decoder layers (:308), get_rope_index (:503).

TPU design decisions:
- The interleaved 3-D RoPE is expressed as a static per-frequency section
  map (freq j < dim/2 - freq_allocation: even j -> h, odd j -> w; tail -> t)
  feeding the shared `mrope_cos_sin` gather + an even/odd pair rotation —
  equivalent to the reference's pre-rotated inv_freq + interleaved selectors
  but with zero data reshuffling at runtime.
- Dense and MoE layers run as separate `lax.scan` groups over contiguous
  [dense-prefix][MoE][dense-suffix] spans (homogeneous scan bodies); the KV
  cache is sliced per group along the layer axis and re-concatenated.
- Dual-expert routing is trace-time conditional: decode programs (3-channel
  position_ids, all-text) never trace the multimodal expert pass, so the
  vision experts cost nothing at decode time.  Prefill passes a 4th
  position_ids channel carrying token_type (0=text, 1=vision).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import embedding, embedding_as_linear, linear, rms_norm, swiglu_mlp
from ...core.mask import causal_cache_mask
from ...core.moe import switch_glu
from ...core.rope import apply_rope_traditional, default_inv_freq, mrope_cos_sin
from .config import ModelConfig, TextConfig


def ernie_section_map(dim_half: int, freq_allocation: int) -> np.ndarray:
    """freq index -> position stream (0=t, 1=h, 2=w).

    Matches the reference's pre-rotated inv_freq + interleaved (h, w)
    selectors (language.py:40-63 + rope_utils.py:896): frequency j below
    dim/2 - freq_allocation rotates by h when j is even, w when j is odd;
    the freq_allocation lowest frequencies rotate by t.
    """
    out = np.zeros(dim_half, np.int32)
    hw = dim_half - freq_allocation
    out[:hw:2] = 1
    out[1:hw:2] = 2
    return out


def ernie_router(
    x: jax.Array,  # [N, D]
    gate_w: jax.Array,  # [E, D]
    bias: jax.Array,  # [E]
    top_k: int,
    norm_min: float,
):
    """Softmax router with aux-free load-balance bias (reference
    _route_experts language.py:262-276): bias affects SELECTION only; the
    returned weights are the original softmax probs renormalized over the
    selected experts."""
    logits = linear({"weight": gate_w}, x).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    _, indices = jax.lax.top_k(probs + bias.astype(jnp.float32)[None], top_k)
    weights = jnp.take_along_axis(probs, indices, axis=-1)
    weights = weights / jnp.maximum(
        weights.sum(axis=-1, keepdims=True), norm_min
    )
    return indices, weights


class LanguageModel:
    def __init__(self, args: TextConfig, config: Optional[ModelConfig] = None):
        self.args = args
        self.config = config
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.head_dim or args.hidden_size // args.num_attention_heads
        self.scale = self.head_dim**-0.5
        self.inv_freq = jnp.asarray(
            default_inv_freq(self.head_dim, args.rope_theta), jnp.float32
        )
        self.section_map = jnp.asarray(
            ernie_section_map(self.head_dim // 2, args.freq_allocation)
        )
        flags = args.moe_layer_flags()
        self.n_pre = flags.index(True) if True in flags else len(flags)
        self.n_moe = sum(flags)
        self.n_post = len(flags) - self.n_pre - self.n_moe
        if flags[self.n_pre : self.n_pre + self.n_moe] != [True] * self.n_moe:
            raise ValueError(
                "ernie4_5_moe_vl requires a contiguous MoE layer span "
                f"(got flags {flags})"
            )

    # ------------------------------------------------------------------ jit
    def __call__(
        self,
        params: dict,
        inputs_embeds: jax.Array,  # [B, S, D]
        cache: Optional[cache_lib.KVCache],
        position_ids: jax.Array,  # [3, B, S] or [4, B, S] (+token_type)
    ):
        B, S, _ = inputs_embeds.shape
        if position_ids.ndim == 3 and position_ids.shape[0] == 4:
            token_type = position_ids[3]  # [B, S]
            position_ids = position_ids[:3]
        else:
            token_type = None  # decode / text-only trace: no mm experts
            if position_ids.ndim == 2:
                position_ids = jnp.broadcast_to(
                    position_ids[None], (3, *position_ids.shape)
                )
        cos, sin = mrope_cos_sin(position_ids, self.inv_freq, self.section_map)
        h = inputs_embeds
        mp = params["model"]

        if cache is None:
            zero = jnp.zeros((), jnp.int32)
            mask = causal_cache_mask(zero, jnp.zeros((B,), jnp.int32), S, S)

            def run(group, body):
                nonlocal h
                if group in mp:
                    h, _ = jax.lax.scan(body, h, mp[group])

            run("dense_pre", self._dense_body_nc(cos, sin, mask))
            run("moe_layers", self._moe_body_nc(cos, sin, mask, token_type))
            run("dense_post", self._dense_body_nc(cos, sin, mask))
            return rms_norm(mp["norm"], h, self.args.rms_norm_eps), None

        mask = causal_cache_mask(cache.offset, cache.left_pad, S, cache.capacity)
        kv = cache.scan_arrays()
        spans = [
            ("dense_pre", 0, self.n_pre),
            ("moe_layers", self.n_pre, self.n_pre + self.n_moe),
            ("dense_post", self.n_pre + self.n_moe,
             self.n_pre + self.n_moe + self.n_post),
        ]
        ys_parts = []
        for group, i0, i1 in spans:
            if i1 == i0:
                continue
            part = jax.tree.map(lambda a: a[i0:i1], kv)
            if group == "moe_layers":
                body = self._moe_body(cos, sin, mask, cache, token_type)
            else:
                body = self._dense_body(cos, sin, mask, cache)
            h, ys = jax.lax.scan(body, h, (mp[group], part))
            ys_parts.append(ys)
        ys = jax.tree.map(lambda *p: jnp.concatenate(p, axis=0), *ys_parts)
        h = rms_norm(mp["norm"], h, self.args.rms_norm_eps)
        return h, cache.with_arrays(ys, S)

    # ----------------------------------------------------------- layer bodies
    def _attention(self, p, x, cos, sin, mask, cache, cxs):
        B, S, _ = x.shape
        q = linear(p["q_proj"], x).reshape(B, S, self.n_heads, self.head_dim)
        k = linear(p["k_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        v = linear(p["v_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        q, k = apply_rope_traditional(q, k, cos, sin)
        if cache is None:
            from ...ops.attention import sdpa

            out = sdpa(q, k, v, self.scale, mask)
            cxs = None
        else:
            out, cxs = cache.attend(cxs, q, k, v, self.scale, mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, -1)
        return linear(p["o_proj"], out), cxs

    def _moe_mlp(self, p, x, token_type):
        """Dual-expert-group MoE (reference Ernie4_5_MoeMLP.__call__:278)."""
        args = self.args
        B, S, D = x.shape
        flat = x.reshape(B * S, D)
        inds, wts = ernie_router(
            flat, p["gate"]["weight"], p["e_score_correction_bias"],
            args.moe_k, args.moe_norm_min,
        )
        e = p["experts"]
        y = switch_glu(
            flat, e["gate_proj"]["weight"], e["up_proj"]["weight"],
            e["down_proj"]["weight"], inds, wts,
        )
        if token_type is not None and "mm_experts" in p:
            inds_mm, wts_mm = ernie_router(
                flat, p["gate_1"]["weight"], p["e_score_correction_bias_1"],
                args.moe_k, args.moe_norm_min,
            )
            em = p["mm_experts"]
            y_mm = switch_glu(
                flat, em["gate_proj"]["weight"], em["up_proj"]["weight"],
                em["down_proj"]["weight"], inds_mm, wts_mm,
            )
            is_text = (token_type.reshape(B * S) == 0)[:, None]
            y = jnp.where(is_text, y, y_mm)
        if "shared_experts" in p:
            y = y + swiglu_mlp(p["shared_experts"], flat)
        return y.reshape(B, S, D)

    def _dense_body(self, cos, sin, mask, cache):
        def body(h, xs):
            lp, cxs = xs
            x = rms_norm(lp["input_layernorm"], h, self.args.rms_norm_eps)
            attn, cxs = self._attention(lp["self_attn"], x, cos, sin, mask, cache, cxs)
            h = h + attn
            x = rms_norm(lp["post_attention_layernorm"], h, self.args.rms_norm_eps)
            h = h + swiglu_mlp(lp["mlp"], x)
            return h, cxs

        return body

    def _moe_body(self, cos, sin, mask, cache, token_type):
        def body(h, xs):
            lp, cxs = xs
            x = rms_norm(lp["input_layernorm"], h, self.args.rms_norm_eps)
            attn, cxs = self._attention(lp["self_attn"], x, cos, sin, mask, cache, cxs)
            h = h + attn
            x = rms_norm(lp["post_attention_layernorm"], h, self.args.rms_norm_eps)
            h = h + self._moe_mlp(lp["mlp"], x, token_type)
            return h, cxs

        return body

    def _dense_body_nc(self, cos, sin, mask):
        def body(h, lp):
            x = rms_norm(lp["input_layernorm"], h, self.args.rms_norm_eps)
            attn, _ = self._attention(lp["self_attn"], x, cos, sin, mask, None, None)
            h = h + attn
            x = rms_norm(lp["post_attention_layernorm"], h, self.args.rms_norm_eps)
            h = h + swiglu_mlp(lp["mlp"], x)
            return h, None

        return body

    def _moe_body_nc(self, cos, sin, mask, token_type):
        def body(h, lp):
            x = rms_norm(lp["input_layernorm"], h, self.args.rms_norm_eps)
            attn, _ = self._attention(lp["self_attn"], x, cos, sin, mask, None, None)
            h = h + attn
            x = rms_norm(lp["post_attention_layernorm"], h, self.args.rms_norm_eps)
            h = h + self._moe_mlp(lp["mlp"], x, token_type)
            return h, None

        return body

    # --------------------------------------------------------------- helpers
    def logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        if self.args.tie_word_embeddings:
            return embedding_as_linear(params["model"]["embed_tokens"], hidden)
        return linear(params["lm_head"], hidden)

    def embed(self, params: dict, input_ids: jax.Array) -> jax.Array:
        return embedding(params["model"]["embed_tokens"], input_ids)

    def init_cache(self, batch_size: int, capacity: int, dtype=jnp.bfloat16,
                   left_pad=None):
        return cache_lib.init_cache(
            self.args.num_hidden_layers,
            batch_size,
            self.n_kv_heads,
            self.head_dim,
            capacity,
            dtype,
            left_pad,
        )

    # ----------------------------------------------------------------- host
    def get_rope_index(
        self,
        input_ids: np.ndarray,
        image_grid_thw: Optional[np.ndarray] = None,
        video_grid_thw: Optional[np.ndarray] = None,
        attention_mask: Optional[np.ndarray] = None,
    ):
        """Ernie 3-D positions follow the same text/vision-span walk as
        Qwen2-VL (reference language.py:503-600 vs qwen2_vl language.py:216);
        reuse the shared vectorized routine."""
        from ..qwen2_vl.language import mrope_position_ids

        cfg = self.config
        return mrope_position_ids(
            input_ids, image_grid_thw, video_grid_thw, attention_mask,
            merge=cfg.vision_config.spatial_merge_size,
            image_token_id=cfg.image_token_id,
            video_token_id=cfg.video_token_id,
        )
