"""Qwen2-VL language model (Qwen2 decoder with M-RoPE).

Role parity: reference mlx_vlm/models/qwen2_vl/language.py.

TPU design decisions vs the reference:
- Decoder layers run under `lax.scan` over stacked weights; the KV cache for
  all layers is one pair of [L,B,H,C,D] buffers carried through the scan.
- `get_rope_index` (language.py:216, a token-scanning Python loop in the
  reference) is a host-side numpy routine — it runs once per prompt during
  preprocessing; decode positions come from `offset + rope_delta` inside jit.
- M-RoPE is applied as a gather over the precomputed section map
  (core/rope.py:mrope_cos_sin) fused into the step program.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import embedding, embedding_as_linear, linear, rms_norm, swiglu_mlp
from ...core.mask import causal_cache_mask
from ...core.quant_scan import scan_layers
from ...core.rope import make_rope
from ...ops.attention import sdpa
from .config import ModelConfig, TextConfig

STACK_PREFIX = "model.layers"


class LanguageModel:
    # eligible for the whole-stack fused int4 decode path (w4grp loads)
    supports_fused_decode = True

    def __init__(self, args: TextConfig, config: Optional[ModelConfig] = None):
        self.args = args
        self.config = config
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.hidden_size // args.num_attention_heads
        self.scale = self.head_dim**-0.5
        scaling = args.rope_scaling
        self.rope = make_rope(
            self.head_dim,
            args.rope_theta,
            scaling,
            args.max_position_embeddings or 131072,
        )

    # ------------------------------------------------------------------ jit
    def __call__(
        self,
        params: dict,
        inputs_embeds: jax.Array,  # [B, S, D]
        cache: Optional[cache_lib.KVCache],
        position_ids: jax.Array,  # [3, B, S] (M-RoPE) or [B, S]
    ):
        """Pure forward step: returns (hidden [B,S,D], new_cache).

        cache=None runs the cache-free (training / full-sequence) path with a
        plain causal mask and no KV buffers.
        """
        B, S, _ = inputs_embeds.shape
        cos, sin = self.rope.cos_sin(position_ids)  # [B, S, hd/2]
        h = inputs_embeds
        mp = params["model"]

        self._fused_logits = None
        if (B == 1 and S == 1 and "fused_decode" in params
                and type(cache).__name__ == "KVCache"):
            # whole-stack fused int4 decode step (ops/fused_decode.py):
            # one Pallas call streams every weight byte of the step
            from ...ops.fused_decode import fused_decode_step_auto

            outs = fused_decode_step_auto(
                params["fused_decode"], inputs_embeds, cos[0, 0], sin[0, 0],
                cache.k, cache.v, cache.offset)
            if len(outs) == 4:
                # lm_head streamed inside the kernel — logits() consumes
                # the stash within the SAME jit trace (decode step program)
                h_out, k_new, v_new, logits = outs
                self._fused_logits = logits[:, None, :]
            else:
                h_out, k_new, v_new = outs
            h = rms_norm(mp["norm"], h_out.astype(inputs_embeds.dtype),
                         self.args.rms_norm_eps)
            L, _, H, _, hd = cache.k.shape
            zero = jnp.zeros((), jnp.int32)
            idx = (zero, zero, zero, cache.offset, zero)
            k_buf = jax.lax.dynamic_update_slice(
                cache.k,
                k_new[:, :H].reshape(L, 1, H, 1, hd).astype(cache.k.dtype),
                idx)
            v_buf = jax.lax.dynamic_update_slice(
                cache.v,
                v_new[:, :H].reshape(L, 1, H, 1, hd).astype(cache.v.dtype),
                idx)
            import dataclasses as _dc

            return h, _dc.replace(
                cache, k=k_buf, v=v_buf, offset=cache.offset + 1)

        # pack-only loads (w4grp + fused decode): the pack is the sole copy
        # of the layer linears; every non-fused forward rebuilds per-layer
        # Int4GroupedTensors from pack slices inside the scan (bit-exact
        # relayout, one layer of transients at a time — ops/fused_decode.py
        # layer_params_from_pack).  Halves resident HBM vs keeping both.
        layers_xs = mp.get("layers")
        unpack = None
        if layers_xs is None and "fused_decode" in params:
            from ...ops.fused_decode import (
                layer_params_from_pack, pack_scan_tree)

            pack = params["fused_decode"]
            layers_xs = pack_scan_tree(pack)
            unpack = lambda pl: layer_params_from_pack(pack, pl)  # noqa: E731

        if cache is None:
            zero = jnp.zeros((), jnp.int32)
            mask = causal_cache_mask(zero, jnp.zeros((B,), jnp.int32), S, S)

            def layer_nc(h, lp):
                if unpack is not None:
                    lp = unpack(lp)
                x = rms_norm(lp["input_layernorm"], h, self.args.rms_norm_eps)
                attn_out = self._attention_nocache(lp["self_attn"], x, cos, sin, mask)
                h = h + attn_out
                x = rms_norm(lp["post_attention_layernorm"], h, self.args.rms_norm_eps)
                h = h + swiglu_mlp(lp["mlp"], x)
                return h, None

            h, _ = scan_layers(
                layer_nc, h, layers_xs,
                remat=getattr(self, "remat", False))
            h = rms_norm(mp["norm"], h, self.args.rms_norm_eps)
            return h, None

        mask = causal_cache_mask(cache.offset, cache.left_pad, S, cache.capacity)

        def layer(h, lp, cxs):
            if unpack is not None:
                lp = unpack(lp)
            x = rms_norm(lp["input_layernorm"], h, self.args.rms_norm_eps)
            attn_out, cxs = self._attention(lp["self_attn"], x, cos, sin, mask, cache, cxs)
            h = h + attn_out
            x = rms_norm(lp["post_attention_layernorm"], h, self.args.rms_norm_eps)
            h = h + swiglu_mlp(lp["mlp"], x)
            return h, cxs

        h, cys = scan_layers(layer, h, layers_xs, cache.scan_arrays())
        h = rms_norm(mp["norm"], h, self.args.rms_norm_eps)
        return h, cache.with_arrays(cys, S)

    def _project_qkv(self, p, x):
        B, S, _ = x.shape
        q = linear(p["q_proj"], x).reshape(B, S, self.n_heads, self.head_dim)
        k = linear(p["k_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        v = linear(p["v_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        return (
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
        )

    def _attention_nocache(self, p, x, cos, sin, mask):
        from ...core.rope import apply_rope

        B, S, _ = x.shape
        q, k, v = self._project_qkv(p, x)
        q, k = apply_rope(q, k, cos, sin)
        out = sdpa(q, k, v, self.scale, mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, -1)
        return linear(p["o_proj"], out)

    def _attention(self, p, x, cos, sin, mask, cache, cxs):
        B, S, _ = x.shape
        q, k, v = self._project_qkv(p, x)
        from ...core.rope import apply_rope

        q, k = apply_rope(q, k, cos, sin)
        out, cxs = cache.attend(cxs, q, k, v, self.scale, mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, -1)
        return linear(p["o_proj"], out), cxs

    def logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        fused = getattr(self, "_fused_logits", None)
        if fused is not None:
            # produced by the fused decode megakernel in THIS trace
            self._fused_logits = None
            return fused
        if self.args.tie_word_embeddings:
            return embedding_as_linear(params["model"]["embed_tokens"], hidden)
        return linear(params["lm_head"], hidden)

    def embed(self, params: dict, input_ids: jax.Array) -> jax.Array:
        return embedding(params["model"]["embed_tokens"], input_ids)

    def init_cache(self, batch_size: int, capacity: int, dtype=jnp.bfloat16, left_pad=None):
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
        input_ids: np.ndarray,  # [B, S]
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


def mrope_position_ids(
    input_ids: np.ndarray,  # [B, S]
    image_grid_thw: Optional[np.ndarray] = None,
    video_grid_thw: Optional[np.ndarray] = None,
    attention_mask: Optional[np.ndarray] = None,
    *,
    merge: int,
    image_token_id: int,
    video_token_id: int,
):
    """3-D (t/h/w) position ids for M-RoPE — host-side, once per prompt.

    Numpy re-derivation of reference qwen2_vl language.py:216-402 (same
    semantics as qwen3_vl language.py:282-468): text tokens get sequential
    positions on all three streams; each vision span gets a (t, h, w) grid
    offset from the running position; positions after a span continue from
    its max + 1.  Returns (position_ids [3,B,S], rope_deltas [B,1]).
    """
    input_ids = np.asarray(input_ids)
    B, S = input_ids.shape
    if image_grid_thw is None and video_grid_thw is None:
        if attention_mask is not None:
            am = np.asarray(attention_mask)
            pos = np.cumsum(am, axis=-1) - 1
            pos = np.where(am == 0, 1, pos)
            deltas = pos.max(axis=-1, keepdims=True) + 1 - S
        else:
            pos = np.broadcast_to(np.arange(S), (B, S)).copy()
            deltas = np.zeros((B, 1), np.int64)
        return (
            np.broadcast_to(pos[None], (3, B, S)).astype(np.int32).copy(),
            deltas.astype(np.int32),
        )

    img_tok, vid_tok = image_token_id, video_token_id
    if attention_mask is None:
        attention_mask = np.ones_like(input_ids)
    attention_mask = np.asarray(attention_mask)
    position_ids = np.ones((3, B, S), np.int32)
    deltas = np.zeros((B, 1), np.int32)
    img_idx = vid_idx = 0
    igrid = None if image_grid_thw is None else np.asarray(image_grid_thw)
    vgrid = None if video_grid_thw is None else np.asarray(video_grid_thw)

    for b in range(B):
        keep = attention_mask[b].astype(bool)
        toks = input_ids[b][keep]
        n = len(toks)
        pos_chunks = []
        st = 0
        cur = 0  # next position value
        while st < n:
            # find next vision token at/after st
            vis_pos = np.nonzero((toks[st:] == img_tok) | (toks[st:] == vid_tok))[0]
            if len(vis_pos) == 0:
                text_len = n - st
                pos_chunks.append(
                    np.broadcast_to(np.arange(text_len) + cur, (3, text_len))
                )
                cur += text_len
                st = n
                break
            ed = st + int(vis_pos[0])
            if toks[ed] == img_tok:
                t, h, w = igrid[img_idx]
                img_idx += 1
            else:
                t, h, w = vgrid[vid_idx]
                vid_idx += 1
            gt, gh, gw = int(t), int(h) // merge, int(w) // merge
            text_len = ed - st
            if text_len:
                pos_chunks.append(
                    np.broadcast_to(np.arange(text_len) + cur, (3, text_len))
                )
                cur += text_len
            t_idx = np.repeat(np.arange(gt), gh * gw)
            h_idx = np.tile(np.repeat(np.arange(gh), gw), gt)
            w_idx = np.tile(np.arange(gw), gt * gh)
            pos_chunks.append(np.stack([t_idx, h_idx, w_idx]) + cur)
            cur += max(gt, gh, gw)
            st = ed + gt * gh * gw
        if pos_chunks:
            compact = np.concatenate(pos_chunks, axis=1)  # [3, n]
            full = np.ones((3, S), np.int64)
            full[:, keep] = compact
            position_ids[:, b, :] = full
            deltas[b, 0] = compact.max() + 1 - n
    return position_ids, deltas
