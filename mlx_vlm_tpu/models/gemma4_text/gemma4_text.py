"""Gemma-4 text decoder.

Role parity: reference mlx_vlm/models/gemma4_text/ — config defaults
(config.py:8), Attention:121 (per-type head dims: sliding 256 / global 512
partial-0.25 "proportional" rope, q/k RMSNorm + scale-free v-norm, optional
k==v global layers, scale 1.0), DecoderLayer:222 (sandwich norms, per-layer
input gating, layer_scalar, optional MoE branch), KV-shared tail reusing
the last concrete layer's KV per type (Gemma4TextModel:371), double-wide
GeGLU MLP on shared layers, softcapped tied lm_head.

TPU design: layers run as SUPER-BLOCK scans over the repeating
[sliding x (p-1), full] pattern — one compiled block body for the concrete
region and one for the KV-shared tail (which reads the last concrete KV of
each type instead of writing).  Four role stacks hold the heterogeneous
params (per-type head dims and MLP widths make a single stack impossible).
"""

from __future__ import annotations

import dataclasses
import re
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.config import BaseModelConfig
from ...core.layers import embedding_as_linear, linear, rms_norm
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, make_rope
from ...ops.attention import sdpa
from ..llama.llama import text_position_ids


@dataclasses.dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "gemma4_text"
    hidden_size: int = 1536
    num_hidden_layers: int = 35
    intermediate_size: int = 6144
    num_attention_heads: int = 8
    head_dim: int = 256
    global_head_dim: int = 512
    rms_norm_eps: float = 1e-6
    vocab_size: int = 262144
    vocab_size_per_layer_input: int = 262144
    num_key_value_heads: int = 1
    num_global_key_value_heads: Optional[int] = None
    num_kv_shared_layers: int = 20
    hidden_size_per_layer_input: int = 256
    rope_parameters: Optional[dict] = None
    sliding_window: int = 512
    sliding_window_pattern: int = 5
    max_position_embeddings: int = 131072
    attention_k_eq_v: bool = False
    final_logit_softcapping: float = 30.0
    use_double_wide_mlp: bool = True
    enable_moe_block: bool = False
    num_experts: Optional[int] = None
    top_k_experts: Optional[int] = None
    moe_intermediate_size: Optional[int] = None
    tie_word_embeddings: bool = True

    def __post_init__(self):
        if self.rope_parameters is None:
            self.rope_parameters = {
                "full_attention": {
                    "partial_rotary_factor": 0.25,
                    "rope_theta": 1000000.0,
                    "rope_type": "proportional",
                },
                "sliding_attention": {
                    "partial_rotary_factor": 1.0,
                    "rope_theta": 10000.0,
                    "rope_type": "default",
                },
            }


ModelConfig = TextConfig


@dataclasses.dataclass
class Gemma4Cache:
    """Per-role KV buffers (different head dims per type)."""

    k_s: jax.Array  # [L_slide_concrete, B, H, C, hd]
    v_s: jax.Array
    k_f: jax.Array  # [L_full_concrete, B, Hg, C, hd_g]
    v_f: jax.Array
    offset: jax.Array
    left_pad: jax.Array

    @property
    def capacity(self) -> int:
        return self.k_s.shape[3]


jax.tree_util.register_dataclass(
    Gemma4Cache,
    data_fields=["k_s", "v_s", "k_f", "v_f", "offset", "left_pad"],
    meta_fields=[],
)


def _rms_noscale(x, eps):
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
            ).astype(x.dtype)


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        a = args
        self.p = a.sliding_window_pattern  # block = (p-1) sliding + 1 full
        L = a.num_hidden_layers
        M = L - a.num_kv_shared_layers  # concrete region
        if M % self.p or a.num_kv_shared_layers % self.p:
            raise ValueError(
                "num_hidden_layers and num_kv_shared_layers must align to "
                "the sliding_window_pattern")
        self.n_concrete_blocks = M // self.p
        self.n_shared_blocks = a.num_kv_shared_layers // self.p
        self.n_heads = a.num_attention_heads
        self.n_kv_heads = a.num_key_value_heads
        self.n_kv_heads_g = (a.num_global_key_value_heads
                             if a.attention_k_eq_v
                             and a.num_global_key_value_heads is not None
                             else a.num_key_value_heads)
        self.head_dim = a.head_dim
        self.head_dim_g = a.global_head_dim or a.head_dim
        rp = a.rope_parameters
        self.rope_s = make_rope(a.head_dim,
                                rp["sliding_attention"].get("rope_theta",
                                                            10000.0))
        fa = dict(rp["full_attention"])
        fa.setdefault("type", fa.pop("rope_type", "proportional"))
        self.rope_f = make_rope(self.head_dim_g,
                                fa.get("rope_theta", 1e6), fa,
                                a.max_position_embeddings)
        self.Dp = a.hidden_size_per_layer_input

    # --------------------------------------------------------------- embeds
    def embed(self, params, input_ids):
        """[B, S, D + L*Dp]: scaled token embeds | raw per-layer embeds
        (the gemma3n channel-packing pattern — avoids the reference's
        argmin id-recovery when only embeddings reach the decoder)."""
        mp = params["model"]
        a = self.args
        w = mp["embed_tokens"]["weight"]
        h = jnp.take(w, input_ids, axis=0) * jnp.asarray(
            a.hidden_size ** 0.5, jnp.float32).astype(w.dtype)
        if not self.Dp or "embed_tokens_per_layer" not in mp:
            return h
        ids = jnp.where(input_ids < a.vocab_size_per_layer_input,
                        input_ids, 0)
        pl = jnp.take(mp["embed_tokens_per_layer"]["weight"], ids,
                      axis=0) * (self.Dp ** 0.5)
        return jnp.concatenate([h, pl.astype(h.dtype)], axis=-1)

    def logits(self, params, hidden):
        w = params["model"]["embed_tokens"]
        out = embedding_as_linear(w, hidden)
        cap = self.args.final_logit_softcapping
        if cap:
            out = jnp.tanh(out / cap) * cap
        return out

    owns_cache_factory = True  # heterogeneous per-role head dims

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None, kv_bits=None, kv_group_size=64):
        if kv_bits:
            raise ValueError(
                "gemma4 role-split cache does not support kv quantization "
                "yet")
        a = self.args
        n_s = self.n_concrete_blocks * (self.p - 1)
        n_f = self.n_concrete_blocks
        if left_pad is None:
            left_pad = jnp.zeros((batch_size,), jnp.int32)
        return Gemma4Cache(
            k_s=jnp.zeros((n_s, batch_size, self.n_kv_heads, capacity,
                           self.head_dim), dtype),
            v_s=jnp.zeros((n_s, batch_size, self.n_kv_heads, capacity,
                           self.head_dim), dtype),
            k_f=jnp.zeros((n_f, batch_size, self.n_kv_heads_g, capacity,
                           self.head_dim_g), dtype),
            v_f=jnp.zeros((n_f, batch_size, self.n_kv_heads_g, capacity,
                           self.head_dim_g), dtype),
            offset=jnp.zeros((), jnp.int32),
            left_pad=left_pad,
        )

    # ------------------------------------------------------------- internals
    def _attn(self, lp, x, cos, sin, mask, is_global, kv=None, cache_kv=None,
              offset=None):
        """One attention; returns (out, (k, v) written or reused)."""
        a = self.args
        ap = lp["self_attn"]
        B, S, _ = x.shape
        hd = self.head_dim_g if is_global else self.head_dim
        nkv = self.n_kv_heads_g if is_global else self.n_kv_heads
        q = linear(ap["q_proj"], x).reshape(B, S, self.n_heads, hd)
        q = rms_norm(ap["q_norm"], q, a.rms_norm_eps).transpose(0, 2, 1, 3)
        q, _ = apply_rope(q, q, cos, sin)
        if kv is None:
            k = linear(ap["k_proj"], x).reshape(B, S, nkv, hd)
            k = rms_norm(ap["k_norm"], k, a.rms_norm_eps)
            if is_global and a.attention_k_eq_v or "v_proj" not in ap:
                v = k  # k==v global layers (reference :141)
            else:
                v = linear(ap["v_proj"], x).reshape(B, S, nkv, hd)
            v = _rms_noscale(v, a.rms_norm_eps)
            k = k.transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
            k, _ = apply_rope(k, k, cos, sin)
            if cache_kv is not None:
                kb, vb = cache_lib.update_layer(cache_kv[0], cache_kv[1],
                                                k, v, offset)
            else:
                kb, vb = k, v
        else:
            kb, vb = kv  # KV-shared tail layer
        o = sdpa(q, kb, vb, 1.0, mask)  # scale fixed at 1.0 (reference)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, -1)
        return linear(ap["o_proj"], o), (kb, vb)

    def _mlp(self, lp, x):
        m = lp["mlp"]
        return linear(m["down_proj"], jax.nn.gelu(
            linear(m["gate_proj"], x), approximate=True)
            * linear(m["up_proj"], x))

    def _moe(self, lp, x):
        """Router (scaled rms -> topk softmax -> per-expert scale) +
        GeGLU experts (reference Router:62 / Experts:98)."""
        a = self.args
        D = a.hidden_size
        scale = lp["router"]["scale"] * (D ** -0.5)
        xr = _rms_noscale(x, a.rms_norm_eps) * scale
        scores = linear(lp["router"]["proj"], xr)
        k = a.top_k_experts
        w_top, idx = jax.lax.top_k(scores, k)  # [B,S,k]
        w_top = jax.nn.softmax(w_top, axis=-1)
        w_top = w_top * jnp.take(lp["router"]["per_expert_scale"], idx)
        gate_w = lp["experts"]["gate_proj"]["weight"]   # [E, I, D]
        up_w = lp["experts"]["up_proj"]["weight"]
        down_w = lp["experts"]["down_proj"]["weight"]   # [E, D, I]
        gsel = jnp.einsum("bsd,bskid->bski", x,
                          jnp.take(gate_w, idx, axis=0))
        usel = jnp.einsum("bsd,bskid->bski", x,
                          jnp.take(up_w, idx, axis=0))
        act = jax.nn.gelu(gsel, approximate=True) * usel
        y = jnp.einsum("bski,bskdi->bskd", act,
                       jnp.take(down_w, idx, axis=0))
        return (y * w_top[..., None]).sum(axis=2).astype(x.dtype)

    def _layer(self, lp, h, pl_i, attn_out_kv):
        """Residual block around a precomputed attention closure."""
        a = self.args
        eps = a.rms_norm_eps
        x = rms_norm(lp["input_layernorm"], h, eps)
        att, kv = attn_out_kv(lp, x)
        h = h + rms_norm(lp["post_attention_layernorm"], att, eps)
        res = h
        if "router" in lp:
            h1 = rms_norm(lp["pre_feedforward_layernorm"], h, eps)
            h1 = self._mlp(lp, h1)
            h1 = rms_norm(lp["post_feedforward_layernorm_1"], h1, eps)
            h2 = rms_norm(lp["pre_feedforward_layernorm_2"], h, eps)
            h2 = self._moe(lp, h2)
            h2 = rms_norm(lp["post_feedforward_layernorm_2"], h2, eps)
            hf = h1 + h2
        else:
            hf = self._mlp(lp, rms_norm(lp["pre_feedforward_layernorm"], h,
                                        eps))
        h = res + rms_norm(lp["post_feedforward_layernorm"], hf, eps)
        if "per_layer_input_gate" in lp and pl_i is not None:
            res = h
            g = jax.nn.gelu(linear(lp["per_layer_input_gate"], h),
                            approximate=True)
            g = g * pl_i
            g = linear(lp["per_layer_projection"], g)
            h = res + rms_norm(lp["post_per_layer_input_norm"], g, eps)
        if "layer_scalar" in lp:
            h = h * lp["layer_scalar"]
        return h, kv

    # ----------------------------------------------------------------- main
    def __call__(self, params, inputs_embeds, cache, position_ids):
        a = self.args
        D = a.hidden_size
        B, S, width = inputs_embeds.shape
        eps = a.rms_norm_eps
        pos = position_ids[0] if position_ids.ndim == 3 else position_ids
        cos_s, sin_s = self.rope_s.cos_sin(pos)
        cos_f, sin_f = self.rope_f.cos_sin(pos)
        mp = params["model"]
        own_cache = cache is None
        if own_cache:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        offset = cache.offset
        C = cache.capacity
        full_mask = causal_cache_mask(offset, cache.left_pad, S, C)
        j = jnp.arange(C)[None, None, None, :]
        qpos = (offset + jnp.arange(S))[None, None, :, None]
        slide_mask = full_mask & (j > qpos - a.sliding_window)
        if getattr(self, "canvas_bidirectional", False) and own_cache:
            # diffusion canvas decode (diffusion_gemma): full layers see
            # the whole canvas, sliding layers a symmetric local window
            valid = j < S
            full_mask = jnp.broadcast_to(valid, full_mask.shape)
            slide_mask = full_mask & (jnp.abs(j - qpos)
                                      < a.sliding_window)

        h0 = inputs_embeds[..., :D]  # embed() already applied the scale
        # per-layer inputs (reference :381-425), channel-packed by embed()
        per_layer = None
        if (self.Dp and width > D
                and "per_layer_model_projection" in mp):
            pl_raw = inputs_embeds[..., D:].reshape(
                B, S, a.num_hidden_layers, self.Dp)
            proj = linear(mp["per_layer_model_projection"], h0) * (D ** -0.5)
            proj = proj.reshape(B, S, a.num_hidden_layers, self.Dp)
            proj = rms_norm(mp["per_layer_projection_norm"], proj, eps)
            per_layer = (proj + pl_raw.astype(proj.dtype)) * (2.0 ** -0.5)
            per_layer = jnp.moveaxis(per_layer, 2, 0)  # [L, B, S, Dp]

        p = self.p
        nsl = p - 1  # sliding layers per block

        def group(tree, n_blocks):
            return jax.tree.map(
                lambda x: x.reshape(n_blocks, -1, *x.shape[1:]), tree)

        def pl_slice(i0, count):
            if per_layer is None:
                return [None] * count
            return [per_layer[i0 + i] for i in range(count)]

        h = h0

        # ---- concrete region: write KV
        G = self.n_concrete_blocks
        sl_p = group(mp["sliding_layers"], G)
        fl_p = mp["full_layers"]
        ks, vs = cache.k_s, cache.v_s
        kf, vf = cache.k_f, cache.v_f

        def concrete_block(h, xs):
            slp, flp, ks_g, vs_g, kf_g, vf_g, pl_g_s, pl_g_f = xs

            def s_attn_factory(kv_pair):
                def fn(lp, x):
                    out, (kb, vb) = self._attn(
                        lp, x, cos_s, sin_s, slide_mask, False,
                        cache_kv=kv_pair, offset=offset)
                    return out, (kb, vb)
                return fn

            new_ks, new_vs = [], []
            for i in range(nsl):
                lp_i = jax.tree.map(lambda x: x[i], slp)
                h, (kb, vb) = self._layer(
                    lp_i, h, pl_g_s[i] if pl_g_s is not None else None,
                    s_attn_factory((ks_g[i], vs_g[i])))
                new_ks.append(kb)
                new_vs.append(vb)

            def f_attn(lp, x):
                return self._attn(lp, x, cos_f, sin_f, full_mask, True,
                                  cache_kv=(kf_g, vf_g), offset=offset)

            h, (kfb, vfb) = self._layer(
                flp, h, pl_g_f, f_attn)
            return h, (jnp.stack(new_ks), jnp.stack(new_vs), kfb, vfb)

        pl_s = pl_f = None
        if per_layer is not None:
            # layer i in block g: sliding are g*p..g*p+nsl-1, full g*p+nsl
            idx_s = np.asarray([[g * p + i for i in range(nsl)]
                                for g in range(G)])
            idx_f = np.asarray([g * p + nsl for g in range(G)])
            pl_s = per_layer[idx_s.reshape(-1)].reshape(
                G, nsl, B, S, self.Dp)
            pl_f = per_layer[idx_f]
        h, (ks, vs, kf, vf) = jax.lax.scan(
            concrete_block, h,
            (sl_p, fl_p, group(cache.k_s, G), group(cache.v_s, G),
             cache.k_f, cache.v_f, pl_s, pl_f))
        ks = ks.reshape(-1, *ks.shape[2:])
        vs = vs.reshape(-1, *vs.shape[2:])

        # ---- KV-shared tail: read the LAST concrete KV per type
        shared_kv_s = (ks[-1], vs[-1])
        shared_kv_f = (kf[-1], vf[-1])
        Gs = self.n_shared_blocks
        if Gs:
            ssl_p = group(mp["shared_sliding_layers"], Gs)
            sfl_p = mp["shared_full_layers"]
            M = G * p

            def shared_block(h, xs):
                slp, flp, pl_g_s, pl_g_f = xs

                def s_attn(lp, x):
                    return self._attn(lp, x, cos_s, sin_s, slide_mask,
                                      False, kv=shared_kv_s)

                for i in range(nsl):
                    lp_i = jax.tree.map(lambda x: x[i], slp)
                    h, _ = self._layer(
                        lp_i, h,
                        pl_g_s[i] if pl_g_s is not None else None, s_attn)

                def f_attn(lp, x):
                    return self._attn(lp, x, cos_f, sin_f, full_mask, True,
                                      kv=shared_kv_f)

                h, _ = self._layer(flp, h, pl_g_f, f_attn)
                return h, None

            pl_ss = pl_sf = None
            if per_layer is not None:
                idx_s = np.asarray([[M + g * p + i for i in range(nsl)]
                                    for g in range(Gs)])
                idx_f = np.asarray([M + g * p + nsl for g in range(Gs)])
                pl_ss = per_layer[idx_s.reshape(-1)].reshape(
                    Gs, nsl, B, S, self.Dp)
                pl_sf = per_layer[idx_f]
            h, _ = jax.lax.scan(shared_block, h,
                                (ssl_p, sfl_p, pl_ss, pl_sf))

        h = rms_norm(mp["norm"], h, eps)
        if own_cache:
            return h, None
        cache = dataclasses.replace(cache, k_s=ks, v_s=vs, k_f=kf, v_f=vf,
                                    offset=offset + S)
        return h, cache


class Model:
    def __init__(self, config: TextConfig):
        self.config = config
        self.language_model = LanguageModel(config)
        self.p = config.sliding_window_pattern
        self.concrete = (config.num_hidden_layers
                         - config.num_kv_shared_layers)

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
        """Split model.layers.N into the four role stacks."""
        p = self.p
        nsl = p - 1
        layer_re = re.compile(
            r"^(?:language_model\.)?model\.layers\.(\d+)\.(.+)$")
        out = {}
        for k, v in weights.items():
            if "rotary_emb" in k:
                continue
            m = layer_re.match(k)
            if m:
                i, rest = int(m.group(1)), m.group(2)
                rest = rest.replace("experts.switch_glu.", "experts.")
                g, r = divmod(i, p)
                concrete = i < self.concrete
                if r < nsl:
                    role = ("sliding_layers" if concrete
                            else "shared_sliding_layers")
                    j = (g * nsl + r if concrete
                         else (g - self.concrete // p) * nsl + r)
                else:
                    role = "full_layers" if concrete else "shared_full_layers"
                    j = g if concrete else g - self.concrete // p
                k = f"model.{role}.{j}.{rest}"
            if (self.config.tie_word_embeddings
                    and k.split("language_model.")[-1] == "lm_head.weight"):
                continue
            out["language_model." + k if not k.startswith("language_model.")
                else k] = v
        return out

    @property
    def stack_patterns(self):
        return (
            "language_model.model.sliding_layers",
            "language_model.model.full_layers",
            "language_model.model.shared_sliding_layers",
            "language_model.model.shared_full_layers",
        )
