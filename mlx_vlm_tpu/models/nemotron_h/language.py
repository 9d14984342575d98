"""Nemotron-H hybrid decoder: mamba2 mixers + sparse attention + relu^2 MLP
(+ optional latent MoE), interleaved by a per-layer pattern string.

Role parity: reference mlx_vlm/models/nemotron_h/language.py —
NemotronHMamba2Mixer:34 (in_proj split gate|conv|dt, depthwise conv, SSD
scan, grouped gated RMSNorm), NemotronHAttention:180 (NoPE GQA),
NemotronHMLP:240 (relu^2), NemotronHMoE:315 (noaux_tc + latent projections),
NemotronHBlock:368 (single pre-norm + residual per block).

TPU design: the (irregular) hybrid_override_pattern is compiled as
RUN-LENGTH groups — consecutive layers of the same type are stacked and run
under one lax.scan, so a pattern like MMMM*MMMM-... costs one scan body per
run instead of one per layer.  The mamba2 prefill is a log-depth
associative scan (core/ssm.py:mamba2_scan); right-pad steps use the pos==0
sentinel like qwen3_next.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ...core.cache import update_layer_auto
from ...core.layers import embedding, embedding_as_linear, linear, rms_norm
from ...core.mask import causal_cache_mask
from ...core.moe import group_expert_select, switch_mlp
from ...core.ssm import mamba2_scan
from ...ops.attention import sdpa
from .config import ModelConfig


def _relu2(x):
    return jnp.square(jax.nn.relu(x))


def runs(pattern: List[str]) -> List[Tuple[str, int, int]]:
    """[(type, start_ordinal_within_type, count), ...] in layer order."""
    out = []
    counts = {"M": 0, "*": 0, "-": 0, "E": 0}
    i = 0
    while i < len(pattern):
        t = pattern[i]
        n = 1
        while i + n < len(pattern) and pattern[i + n] == t:
            n += 1
        out.append((t, counts[t], n))
        counts[t] += n
        i += n
    return out


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["conv", "state", "k", "v", "offset", "left_pad"],
    meta_fields=[],
)
@dataclasses.dataclass
class NemotronHCache:
    conv: jax.Array  # [L_m, B, K-1, conv_dim]
    state: jax.Array  # [L_m, B, H, P, N] fp32
    k: jax.Array  # [L_attn, B, Hkv, C, hd]
    v: jax.Array
    offset: jax.Array
    left_pad: jax.Array

    @property
    def capacity(self) -> int:
        return self.k.shape[3]


_TYPE_KEY = {"M": "m_layers", "*": "attn_layers", "-": "mlp_layers",
             "E": "moe_layers"}


class LanguageModel:
    def __init__(self, args: ModelConfig, config=None):
        self.args = args
        self.config = config or args
        a = args
        self.runs = runs(a.hybrid_override_pattern)
        self.n_m = sum(1 for c in a.hybrid_override_pattern if c == "M")
        self.n_attn = sum(1 for c in a.hybrid_override_pattern if c == "*")
        self.inter = a.mamba_num_heads * a.mamba_head_dim
        self.conv_dim = self.inter + 2 * a.n_groups * a.ssm_state_size
        self.scale = a.head_dim**-0.5

    # ------------------------------------------------------------------ jit
    def __call__(self, params, inputs_embeds, cache, position_ids):
        a = self.args
        B, S, _ = inputs_embeds.shape
        eps = a.layer_norm_epsilon
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        pos_row = jnp.broadcast_to(
            position_ids if position_ids.ndim == 2 else position_ids[None],
            (B, S),
        )
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask = causal_cache_mask(cache.offset, cache.left_pad, S, cache.capacity)
        slots = cache.offset + jnp.arange(S, dtype=jnp.int32)
        valid = (slots[None, :] >= cache.left_pad[:, None]) & (
            (pos_row > 0) | (slots[None, :] == 0)
        )

        h = inputs_embeds
        mp = params["model"]
        conv_new, state_new = cache.conv, cache.state
        k_new, v_new = cache.k, cache.v

        def m_body(h, xs):
            lp, cv, st = xs
            x = rms_norm(lp["norm"], h, eps)
            r, cv, st = self._mamba(lp["mixer"], x, cv, st, valid)
            return h + r, (cv, st)

        def attn_body(h, xs):
            lp, kb, vb = xs
            x = rms_norm(lp["norm"], h, eps)
            r, kb, vb = self._attention(lp["mixer"], x, mask, cache.offset,
                                        kb, vb)
            return h + r, (kb, vb)

        def mlp_body(h, lp):
            x = rms_norm(lp["norm"], h, eps)
            return h + self._mlp(lp["mixer"], x), None

        def moe_body(h, lp):
            x = rms_norm(lp["norm"], h, eps)
            return h + self._moe(lp["mixer"], x), None

        for t, start, n in self.runs:
            key = _TYPE_KEY[t]
            lp = jax.tree.map(lambda x: x[start:start + n], mp[key])
            if t == "M":
                cv = cache.conv[start:start + n]
                st = cache.state[start:start + n]
                h, (cv_y, st_y) = jax.lax.scan(m_body, h, (lp, cv, st))
                conv_new = jax.lax.dynamic_update_slice_in_dim(
                    conv_new, cv_y, start, 0)
                state_new = jax.lax.dynamic_update_slice_in_dim(
                    state_new, st_y, start, 0)
            elif t == "*":
                kb = cache.k[start:start + n]
                vb = cache.v[start:start + n]
                h, (k_y, v_y) = jax.lax.scan(attn_body, h, (lp, kb, vb))
                k_new = jax.lax.dynamic_update_slice_in_dim(k_new, k_y, start, 0)
                v_new = jax.lax.dynamic_update_slice_in_dim(v_new, v_y, start, 0)
            elif t == "-":
                h, _ = jax.lax.scan(mlp_body, h, lp)
            else:
                h, _ = jax.lax.scan(moe_body, h, lp)

        h = rms_norm(mp["norm_f"], h, eps)
        if made:
            return h, None
        return h, NemotronHCache(
            conv=conv_new, state=state_new, k=k_new, v=v_new,
            offset=cache.offset + S, left_pad=cache.left_pad,
        )

    # --------------------------------------------------------------- mamba2
    def _mamba(self, p, x, conv_state, state, valid):
        a = self.args
        B, S, _ = x.shape
        H, P, N, G = (a.mamba_num_heads, a.mamba_head_dim, a.ssm_state_size,
                      a.n_groups)
        proj = linear(p["in_proj"], x)
        gate = proj[..., :self.inter]
        conv_in = proj[..., self.inter:self.inter + self.conv_dim]
        dt = proj[..., self.inter + self.conv_dim:]  # [B,S,H]

        conv_in = jnp.where(valid[..., None], conv_in, 0)
        K = a.conv_kernel
        padded = jnp.concatenate([conv_state.astype(conv_in.dtype), conv_in],
                                 axis=1)
        lv = jnp.max(
            jnp.where(valid, jnp.arange(S, dtype=jnp.int32)[None], -1), axis=1
        )
        gather = lv[:, None] + 1 + jnp.arange(K - 1)[None]
        new_conv = jnp.take_along_axis(padded, gather[..., None], axis=1)
        w = p["conv1d"]["weight"]  # [conv_dim, K]
        windows = jnp.stack([padded[:, i:i + S] for i in range(K)], axis=0)
        conv_out = jnp.einsum("kbsc,ck->bsc", windows, w)
        if "bias" in p["conv1d"]:
            conv_out = conv_out + p["conv1d"]["bias"]
        conv_out = jax.nn.silu(conv_out)

        x_ssm = conv_out[..., :self.inter].reshape(B, S, H, P)
        Bm = conv_out[..., self.inter:self.inter + G * N].reshape(B, S, G, N)
        Cm = conv_out[..., self.inter + G * N:].reshape(B, S, G, N)
        y, st = mamba2_scan(
            x_ssm, p["A_log"], Bm, Cm, p["D"], dt, p["dt_bias"],
            state, a.time_step_limit, valid,
        )
        y = y.reshape(B, S, self.inter)
        # grouped gated RMSNorm (reference MambaRMSNormGated:19)
        y = (jax.nn.silu(gate.astype(jnp.float32)) * y.astype(jnp.float32))
        gsz = self.inter // G
        yg = y.reshape(B, S, G, gsz)
        var = jnp.mean(jnp.square(yg), axis=-1, keepdims=True)
        yg = yg * jax.lax.rsqrt(var + a.layer_norm_epsilon)
        y = (yg.reshape(B, S, self.inter) * p["norm"]["weight"]).astype(x.dtype)
        return linear(p["out_proj"], y), new_conv, st

    # ------------------------------------------------------------ attention
    def _attention(self, p, x, mask, offset, k_buf, v_buf):
        a = self.args
        B, S, _ = x.shape
        hd = a.head_dim
        q = linear(p["q_proj"], x).reshape(B, S, a.num_attention_heads, hd)
        k = linear(p["k_proj"], x).reshape(B, S, a.num_key_value_heads, hd)
        v = linear(p["v_proj"], x).reshape(B, S, a.num_key_value_heads, hd)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        k_buf, v_buf = update_layer_auto(k_buf, v_buf, k, v, offset)
        attn = sdpa(q, k_buf, v_buf, self.scale, mask)  # NoPE
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
        return linear(p["o_proj"], attn), k_buf, v_buf

    def _mlp(self, p, x):
        return linear(p["down_proj"], _relu2(linear(p["up_proj"], x)))

    def _moe(self, p, x):
        a = self.args
        B, S, D = x.shape
        flat = x.reshape(B * S, D)
        idx, wts = group_expert_select(
            linear({"weight": p["gate"]["weight"]}, flat),
            p["gate"]["e_score_correction_bias"],
            a.num_experts_per_tok, a.n_group or 1, a.topk_group or 1,
            a.routed_scaling_factor or 1.0, bool(a.norm_topk_prob),
        )
        z = flat
        if "fc1_latent_proj" in p:
            z = linear(p["fc1_latent_proj"], flat)
        out = switch_mlp(
            z, p["experts"]["up_proj"]["weight"],
            p["experts"]["down_proj"]["weight"], idx, wts, act=_relu2,
        )
        if "fc2_latent_proj" in p:
            out = linear(p["fc2_latent_proj"], out)
        if "shared_experts" in p:
            out = out + self._mlp(p["shared_experts"], flat)
        return out.reshape(B, S, D)

    # ---------------------------------------------------------------- misc
    def logits(self, params, hidden):
        if self.args.tie_word_embeddings or "lm_head" not in params:
            return embedding_as_linear(params["model"]["embeddings"], hidden)
        return linear(params["lm_head"], hidden)

    def embed(self, params, input_ids):
        return embedding(params["model"]["embeddings"], input_ids)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16, left_pad=None):
        a = self.args
        if left_pad is None:
            left_pad = jnp.zeros((batch_size,), jnp.int32)
        return NemotronHCache(
            conv=jnp.zeros(
                (max(self.n_m, 1), batch_size, a.conv_kernel - 1,
                 self.conv_dim), dtype,
            ),
            state=jnp.zeros(
                (max(self.n_m, 1), batch_size, a.mamba_num_heads,
                 a.mamba_head_dim, a.ssm_state_size), jnp.float32,
            ),
            k=jnp.zeros(
                (max(self.n_attn, 1), batch_size, a.num_key_value_heads,
                 capacity, a.head_dim), dtype,
            ),
            v=jnp.zeros(
                (max(self.n_attn, 1), batch_size, a.num_key_value_heads,
                 capacity, a.head_dim), dtype,
            ),
            offset=jnp.zeros((), jnp.int32),
            left_pad=left_pad,
        )
