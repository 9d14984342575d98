"""Zaya1 decoder: CCA (convolutional cross-token attention) + MoD/EDA MoE.

Role parity: reference mlx_vlm/models/zaya1_vl/language.py —
ResidualScaling:75, CCA (conv-mixed q/k, dual value streams):94,
ZayaAttention:272, ZayaRouter (EDA state + MoD skip expert):349,
ZayaSwitchMLP:406, ZayaModel (explicit residual stream):598.

TPU design:
- One homogeneous lax.scan over the 40 decoder blocks.  Layer 0's missing
  parameters (no residual scale on the first ResidualScaling, no EDA
  router_states_scale) are synthesized as identities at sanitize time so
  the stack stays scannable; with residual initialized to zeros the math
  is unchanged (reference handles `residual is None` in Python).
- The CCA q/k temporal convs (kernel 2 depthwise + kernel 2 head-grouped,
  reference language.py:145-158) run as shifted-window einsums over a
  carried conv tail of cca_time0+cca_time1-2 inputs — the same treatment
  qwen3_next gives its causal conv.  The dual value stream's one-token
  hidden delay (val_proj2 over hs_{t-1}) carries the last REAL hidden
  state per layer in the cache, so right-padded prefill chunks cannot
  leak garbage into decode.
- Vision-LoRA gating (reference applies LoRA adapters only at image token
  positions) is data, not trace constants: prepare_position_ids stashes
  the prompt's image-token mask and init_cache bakes it into the cache as
  a [B, capacity] plane that each step slices at the cache offset.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core.cache import update_layer_auto
from ...core.layers import embedding, embedding_as_linear, linear, rms_norm
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, make_rope
from ...ops.attention import sdpa
from .config import ModelConfig, TextConfig


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "conv", "hprev", "img", "offset", "left_pad"],
    meta_fields=[],
)
@dataclasses.dataclass
class ZayaCache:
    """KV buffers + CCA conv tails + one-token hidden delay + image-token
    plane for LoRA gating."""

    k: jax.Array  # [L, B, Hkv, C, hd]
    v: jax.Array  # [L, B, Hkv, C, hd]
    conv: jax.Array  # [L, B, pad, (Hq+Hkv)*hd] carried q/k conv inputs
    hprev: jax.Array  # [L, B, D] last real hidden per layer (val_proj2 delay)
    img: jax.Array  # [B, C] bool: image-token slots (vision LoRA gate)
    offset: jax.Array  # int32 scalar
    left_pad: jax.Array  # [B]

    @property
    def capacity(self) -> int:
        return self.k.shape[3]


def _lora(p, x):
    """Two-matmul LoRA adapter: p = {"0": A, "1": B} (reference CCA
    _apply_lora:161)."""
    return linear(p["1"], linear(p["0"], x))


class LanguageModel:
    def __init__(self, args: TextConfig, config: ModelConfig = None):
        self.args = args
        self.config = config or args
        a = args
        self.n_heads = a.num_attention_heads
        self.n_kv_heads = a.num_key_value_heads
        self.head_dim = a.head_dim
        self.groups = self.n_heads // self.n_kv_heads
        self.scale = a.head_dim**-0.5
        self.pad = a.cca_time0 + a.cca_time1 - 2
        self.conv_ch = (self.n_heads + self.n_kv_heads) * a.head_dim
        self.rot_dim = int(
            a.head_dim * a.rope_parameters["partial_rotary_factor"]
        )
        self.rope = make_rope(
            self.rot_dim,
            a.rope_parameters["rope_theta"],
            a.rope_parameters,
            a.max_position_embeddings,
        )
        # host-side prompt plan set by Model.prepare_position_ids; consumed
        # (as DATA) by init_cache — never baked into a trace
        self.pending_image_mask: Optional[np.ndarray] = None

    # ------------------------------------------------------------- cache
    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None):
        a = self.args
        if left_pad is None:
            left_pad = jnp.zeros((batch_size,), jnp.int32)
        img = np.zeros((batch_size, capacity), bool)
        pend = self.pending_image_mask
        if pend is not None and pend.shape[0] == batch_size:
            n = min(capacity, pend.shape[1])
            img[:, :n] = pend[:, :n]
        return ZayaCache(
            k=jnp.zeros((a.num_hidden_layers, batch_size, self.n_kv_heads,
                         capacity, self.head_dim), dtype),
            v=jnp.zeros((a.num_hidden_layers, batch_size, self.n_kv_heads,
                         capacity, self.head_dim), dtype),
            conv=jnp.zeros((a.num_hidden_layers, batch_size, self.pad,
                            self.conv_ch), dtype),
            hprev=jnp.zeros((a.num_hidden_layers, batch_size,
                             a.hidden_size), dtype),
            img=jnp.asarray(img),
            offset=jnp.zeros((), jnp.int32),
            left_pad=jnp.asarray(left_pad, jnp.int32),
        )

    # -------------------------------------------------------------- misc
    def embed(self, params, input_ids):
        return embedding(params["model"]["embed_tokens"], input_ids)

    def logits(self, params, hidden):
        if self.args.tie_word_embeddings or "lm_head" not in params:
            return embedding_as_linear(params["model"]["embed_tokens"], hidden)
        return linear(params["lm_head"], hidden)

    # --------------------------------------------------------------- jit
    def __call__(self, params, inputs_embeds, cache, position_ids):
        a = self.args
        B, S, D = inputs_embeds.shape
        eps = a.norm_epsilon
        mp = params["model"]

        if cache is None:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
            return_cache = False
        else:
            return_cache = True

        pos = position_ids[0] if position_ids.ndim == 3 else position_ids
        pos = jnp.broadcast_to(pos, (B, S))
        cos, sin = self.rope.cos_sin(pos)

        mask = causal_cache_mask(cache.offset, cache.left_pad, S,
                                 cache.capacity)
        slots = cache.offset + jnp.arange(S, dtype=jnp.int32)  # [S]
        # left padding (batch rows) zeroes CCA inputs (reference cca_mask);
        # right padding (chunked-prefill pow2 pads, pos==0 at slot>0) must
        # also not advance the conv tail / hidden delay
        rpad = (pos <= 0) & (slots[None, :] > 0)  # [B, S]
        valid = (slots[None, :] >= cache.left_pad[:, None]) & ~rpad
        n_real = (S - jnp.sum(rpad, axis=1)).astype(jnp.int32)  # [B]
        img = jax.lax.dynamic_slice(
            cache.img, (0, cache.offset.astype(jnp.int32)), (B, S)
        )
        img_gate = img.astype(inputs_embeds.dtype)[..., None]  # [B,S,1]
        use_lora = a.vision_lora

        h = inputs_embeds
        res = jnp.zeros_like(h)
        rs = jnp.zeros((B, S, a.zaya_mlp_expansion), h.dtype)

        def block(carry, xs):
            h, res, rs = carry
            lp, conv_st, hprev, kb, vb = xs
            ap, mlp = lp["attn"], lp["mlp"]
            # ----- attention half (reference ZayaDecoderATTLayer:513)
            if a.scale_residual_merge:
                rsc = ap["res_scale"]
                res = (res + rsc["residual_bias"]) * rsc["residual_scale"]
                h = (h + rsc["hidden_states_bias"]) * rsc["hidden_states_scale"]
            res = h + res
            x = rms_norm(ap["input_norm"], res, eps)
            h, conv_st, hprev, kb, vb = self._cca_attention(
                ap["self_attn"], x, cos, sin, mask, valid, n_real, img_gate,
                use_lora, cache.offset, conv_st, hprev, kb, vb,
            )
            # ----- MoE half (reference ZayaDecoderMLPLayer:539)
            if a.scale_residual_merge:
                rsc = mlp["res_scale"]
                res = (res + rsc["residual_bias"]) * rsc["residual_scale"]
                h = (h + rsc["hidden_states_bias"]) * rsc["hidden_states_scale"]
            res = h + res
            x = rms_norm(mlp["input_norm"], res, eps)
            h, rs = self._zaya_block(mlp["zaya_block"], x, rs, img_gate,
                                     use_lora)
            return (h, res, rs), (conv_st, hprev, kb, vb)

        (h, res, rs), (conv_y, hprev_y, k_y, v_y) = jax.lax.scan(
            block, (h, res, rs),
            (mp["layers"], cache.conv, cache.hprev, cache.k, cache.v),
        )

        if a.scale_residual_merge:
            rsc = mp["res_scale"]
            res = (res + rsc["residual_bias"]) * rsc["residual_scale"]
            h = (h + rsc["hidden_states_bias"]) * rsc["hidden_states_scale"]
        h = rms_norm(mp["final_norm"], h + res, eps)
        if not return_cache:
            return h, None
        new_cache = ZayaCache(
            k=k_y, v=v_y, conv=conv_y, hprev=hprev_y, img=cache.img,
            offset=cache.offset + S, left_pad=cache.left_pad,
        )
        return h, new_cache

    # ----------------------------------------------------- CCA attention
    def _cca_attention(self, p, x, cos, sin, mask, valid, n_real, img_gate,
                       use_lora, offset, conv_st, hprev, kb, vb):
        """Reference CCA.__call__:179 + ZayaAttention.__call__:303."""
        a = self.args
        B, S, D = x.shape
        nq, nkv, hd = self.n_heads, self.n_kv_heads, self.head_dim
        qk = p["qkv"]

        x_m = jnp.where(valid[..., None], x, 0)  # cca_mask semantics
        q = linear(qk["linear_q"], x_m)
        k = linear(qk["linear_k"], x_m)
        if use_lora:
            q = q + _lora(qk["lora_linear_q"], x_m) * img_gate
            k = k + _lora(qk["lora_linear_k"], x_m) * img_gate

        # q/k mean mixing (reference :207-213)
        q_pre = q.reshape(B, S, nq, hd)
        k_rep = jnp.repeat(k.reshape(B, S, nkv, hd), self.groups, axis=2)
        mean_q = (q_pre + k_rep) / 2
        mean_k = mean_q.reshape(B, S, nkv, self.groups, hd).mean(axis=3)

        # temporal conv over packed [q|k] channels with carried tail
        packed = jnp.concatenate([q, k], axis=-1)  # [B, S, C]
        conv_in = jnp.concatenate([conv_st.astype(packed.dtype), packed],
                                  axis=1)  # [B, pad+S, C]
        gather = (n_real[:, None] + jnp.arange(self.pad)[None])  # [B, pad]
        new_conv = jnp.take_along_axis(conv_in, gather[..., None], axis=1)
        y = self._qk_conv(qk["conv_qk"], conv_in, S)

        query = y[..., : nq * hd].reshape(B, S, nq, hd) + mean_q
        key = y[..., nq * hd:].reshape(B, S, nkv, hd) + mean_k

        # dual value stream: v1 of h_t, v2 of h_{t-1} (reference :231-249)
        v1 = linear(qk["val_proj1"], x_m)
        hs_d = jnp.concatenate(
            [hprev.astype(x_m.dtype)[:, None], x_m[:, :-1]], axis=1
        )
        v2 = linear(qk["val_proj2"], hs_d)
        if use_lora:
            v1 = v1 + _lora(qk["lora_val_proj1"], x_m) * img_gate
            v2 = v2 + _lora(qk["lora_val_proj2"], hs_d) * img_gate
        new_hprev = jnp.take_along_axis(
            x_m, (n_real - 1)[:, None, None], axis=1
        )[:, 0]
        value = jnp.concatenate([v1, v2], axis=-1).reshape(B, S, nkv, hd)

        # L2 normalize to sqrt(hd); learned per-kv-head key temperature
        f32 = jnp.float32
        qn = jnp.maximum(
            jnp.linalg.norm(query.astype(f32), axis=-1, keepdims=True),
            jnp.finfo(f32).eps,
        )
        kn = jnp.maximum(
            jnp.linalg.norm(key.astype(f32), axis=-1, keepdims=True),
            jnp.finfo(f32).eps,
        )
        sqrt_hd = float(np.sqrt(hd))
        query = (query.astype(f32) * (sqrt_hd / qn)).astype(x.dtype)
        key = (key.astype(f32) * (sqrt_hd / kn)).astype(x.dtype)
        key = key * qk["temp"][None, None, :, None].astype(key.dtype)

        query = query.transpose(0, 2, 1, 3)  # [B, H, S, hd]
        key = key.transpose(0, 2, 1, 3)
        value = value.transpose(0, 2, 1, 3)
        rd = self.rot_dim
        q_rot, k_rot = apply_rope(query[..., :rd], key[..., :rd], cos, sin)
        query = jnp.concatenate([q_rot, query[..., rd:]], axis=-1)
        key = jnp.concatenate([k_rot, key[..., rd:]], axis=-1)

        kb, vb = update_layer_auto(kb, vb, key, value, offset)
        out = sdpa(query, kb, vb, self.scale, mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, -1)
        proj = linear(p["o_proj"], out)
        if use_lora:
            proj = proj + _lora(p["lora_linear_o"], out) * img_gate
        return proj, new_conv, new_hprev, kb, vb

    def _qk_conv(self, p, conv_in, S):
        """Two stacked causal convs (depthwise k=t0, head-grouped k=t1) as
        shifted-window einsums (reference conv stack language.py:145-158;
        weights kept in torch [O, I/g, K] layout)."""
        a = self.args
        t0, t1 = a.cca_time0, a.cca_time1
        H = self.n_heads + self.n_kv_heads
        hd = self.head_dim
        # conv0: depthwise
        w0 = p["0"]["weight"][:, 0, :]  # [C, t0]
        L1 = S + t1 - 1
        win0 = jnp.stack([conv_in[:, i:i + L1] for i in range(t0)], axis=0)
        y = jnp.einsum("kblc,ck->blc", win0, w0.astype(conv_in.dtype))
        if "bias" in p["0"]:
            y = y + p["0"]["bias"].astype(y.dtype)
        # conv1: one group per head
        w1 = p["1"]["weight"]  # [C, hd, t1]
        w1 = w1.reshape(H, hd, hd, t1)  # [H, out, in, k]
        yg = y.reshape(y.shape[0], L1, H, hd)
        win1 = jnp.stack([yg[:, i:i + S] for i in range(t1)], axis=0)
        z = jnp.einsum("kbshi,hoik->bsho", win1, w1.astype(y.dtype))
        z = z.reshape(z.shape[0], S, H * hd)
        if "bias" in p["1"]:
            z = z + p["1"]["bias"].astype(z.dtype)
        return z

    # ------------------------------------------------------------ MoE
    def _zaya_block(self, p, x, rs, img_gate, use_lora):
        """Router (EDA + MoD) + switch experts (reference ZayaRouter:349,
        ZayaSwitchMLP:406)."""
        a = self.args
        B, S, D = x.shape
        r = p["router"]
        hs = linear(r["down_proj"], x)
        if a.zaya_use_eda:
            hs = hs + rs * r["router_states_scale"]
        next_rs = hs
        g = rms_norm(r["rmsnorm_eda"], hs, a.norm_epsilon)
        g = jax.nn.gelu(linear(r["router_mlp"]["0"], g), approximate=False)
        g = jax.nn.gelu(linear(r["router_mlp"]["2"], g), approximate=False)
        logits = linear(r["router_mlp"]["4"], g)  # [B,S,E(+1)]
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        biased = probs + r["balancing_biases"].astype(jnp.float32)
        k = a.moe_router_topk
        if k == 1:
            choice = jnp.argmax(biased, axis=-1)[..., None]  # [B,S,1]
        else:
            _, choice = jax.lax.top_k(biased, k)
        route_p = jnp.take_along_axis(probs, choice, axis=-1)  # [B,S,k]

        e = p["experts"]
        E = a.num_experts
        f32 = jnp.float32

        def body(acc, xs):
            e_idx, w1, w2, l1a, l1b, l2a, l2b = xs
            sel = (choice == e_idx).astype(f32) * route_p.astype(f32)
            w_tok = jnp.sum(sel, axis=-1)[..., None]  # [B,S,1]
            z = linear({"weight": w1}, x)
            if use_lora:
                z = z + linear({"weight": l1b}, linear({"weight": l1a}, x)) \
                    * img_gate
            if a.gated_linear_unit:
                z1, z2 = jnp.split(z, 2, axis=-1)
                z = jax.nn.silu(z1) * z2
            elif a.activation_func == "gelu":
                z = jax.nn.gelu(z, approximate=False)
            else:
                z = jax.nn.silu(z)
            y = linear({"weight": w2}, z)
            if use_lora:
                y = y + linear({"weight": l2b}, linear({"weight": l2a}, z)) \
                    * img_gate
            return acc + w_tok.astype(acc.dtype) * y, None

        if use_lora:
            lw = (e["lora_fc1"]["0"]["weight"], e["lora_fc1"]["1"]["weight"],
                  e["lora_fc2"]["0"]["weight"], e["lora_fc2"]["1"]["weight"])
        else:
            z1 = jnp.zeros((E, 1, 1), x.dtype)
            lw = (z1, z1, z1, z1)
        acc0 = jnp.zeros((B, S, D), x.dtype)
        e_ids = jnp.arange(E, dtype=choice.dtype)
        out, _ = jax.lax.scan(
            body, acc0,
            (e_ids, e["linear_fc1"]["weight"], e["linear_fc2"]["weight"],
             *lw),
        )
        if a.zaya_use_mod:
            # skip expert (index E): identity weighted by its route prob
            skip = (choice == E).astype(f32) * route_p.astype(f32)
            out = out + jnp.sum(skip, -1)[..., None].astype(out.dtype) * x
        return out, next_rs
