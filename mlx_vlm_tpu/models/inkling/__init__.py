"""Inkling (omni: HMLP vision + dMel audio + hybrid-conv text) family.

Role parity: reference mlx_vlm/models/inkling —
- language.py: NoPE attention with a learned BANDED RELATIVE bias
  (r_proj(x) @ rel_proj gathered by query-key distance,
  banded_additive_mask:79), depthwise short convolutions (K=4, causal,
  fp32) over the k/v projections AND over the attention/MLP residual
  branches (InklingShortConvolution:115), per-layer sliding/full
  geometry with different head counts, log position scaling tau on full
  layers, q/k head norms, scale = 1/head_dim, and a sigmoid-gated MoE
  whose routed top-k AND always-on shared experts are weighted by a
  logsigmoid-softmax over their gate logits (InklingSparseMoE:245).
- vision.py: the HMLP patchifier — prime-factor-planned progressive
  space/time folding into channels, linear + RMS/gelu per stage, one LM
  soft token per patch, NO attention.
- audio.py: dMel front end — per-mel-channel bucket embeddings summed
  and RMS-normed into LM space.

TPU design: trace-time loop over dict-indexed layers (two attention
geometries + dense/MoE + conv states); a custom pytree cache carries KV
buffers at max head geometry plus the four per-layer conv tails; the
banded bias is a vectorized take_along_axis over a distance plane; the
HMLP planning runs host-side (numpy) at init.
"""

from __future__ import annotations

import dataclasses
import inspect
import itertools
import math
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import (embedding, embedding_as_linear, linear, rms_norm,
                            swiglu_mlp)
from ...core.moe import switch_glu
from ...ops.attention import sdpa
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "inkling"
    hidden_size: int = 6144
    num_hidden_layers: int = 66
    vocab_size: int = 201024
    unpadded_vocab_size: Optional[int] = None
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = False
    use_embed_norm: bool = True
    logits_mup_width_multiplier: float = 1.0
    max_position_embeddings: int = 1048576
    num_attention_heads: int = 64
    num_key_value_heads: int = 8
    head_dim: int = 128
    swa_num_attention_heads: int = 64
    swa_num_key_value_heads: int = 16
    swa_head_dim: int = 128
    sliding_window_size: int = 512
    local_layer_ids: Optional[List[int]] = None
    layer_types: Optional[List[str]] = None
    d_rel: int = 16
    rel_extent: int = 1024
    log_scaling_n_floor: Optional[int] = None
    log_scaling_alpha: float = 0.1
    sconv_kernel_size: int = 4
    dense_mlp_idx: int = 0
    mlp_layer_types: Optional[List[str]] = None
    intermediate_size: int = 24576
    moe_intermediate_size: int = 3072
    n_routed_experts: int = 256
    num_experts_per_tok: int = 6
    n_shared_experts: int = 2
    route_scale: float = 8.0

    @classmethod
    def from_dict(cls, params: dict):
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})

    def layer_is_sliding(self, i: int) -> bool:
        """reference config.py:layer_is_sliding."""
        if self.layer_types is not None:
            return self.layer_types[i] == "hybrid_sliding"
        if self.local_layer_ids is not None:
            return i in set(self.local_layer_ids)
        return bool((i + 1) % 6)

    def layer_is_dense(self, i: int) -> bool:
        if self.mlp_layer_types is not None:
            return self.mlp_layer_types[i] == "dense"
        return i < self.dense_mlp_idx


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "inkling_vision"
    patch_size: int = 40
    temporal_patch_size: int = 2
    num_channels: int = 3
    n_layers: int = 4
    text_hidden_size: int = 6144
    rms_norm_eps: float = 1e-6


@dataclass
class AudioConfig(BaseModelConfig):
    model_type: str = "inkling_audio"
    n_mel_bins: int = 80
    mel_vocab_size: int = 16
    text_hidden_size: int = 6144
    rms_norm_eps: float = 1e-6


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: Union[TextConfig, dict, None] = None
    vision_config: Union[VisionConfig, dict, None] = None
    audio_config: Union[AudioConfig, dict, None] = None
    model_type: str = "inkling"
    image_token_id: int = 200054
    audio_token_id: int = 200053
    vocab_size: int = 201024
    eos_token_id: Optional[List[int]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {})
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {})
        params["audio_config"] = AudioConfig.from_dict(
            params.get("audio_config", {}) or {})
        allowed = inspect.signature(cls).parameters
        out = cls(**{k: v for k, v in params.items() if k in allowed})
        out.vision_config.text_hidden_size = out.text_config.hidden_size
        out.audio_config.text_hidden_size = out.text_config.hidden_size
        return out


# ----------------------------------------------------------- HMLP vision

def _prime_factors(n: int):
    out = []
    while n % 2 == 0:
        out.append(2)
        n //= 2
    p = 3
    while p * p <= n:
        while n % p == 0:
            out.append(p)
            n //= p
        p += 2
    if n > 1:
        out.append(n)
    return out


def _assign(cost: np.ndarray):
    """Min-cost injective row->column assignment (tiny grids)."""
    R, C = cost.shape
    best_cost, best = None, None
    for perm in itertools.permutations(range(C), R):
        s = sum(cost[r, perm[r]] for r in range(R))
        if best_cost is None or s < best_cost:
            best_cost, best = s, perm
    return list(best)


def plan_out_scales(temporal_patch_size, patch_size, n_layers, n_channels):
    """Per-stage (t, h, w, c) fold grids (reference vision.py:39)."""
    h = np.cumprod(np.array(_prime_factors(patch_size)[::-1], np.int64))
    t = np.cumprod(np.array(_prime_factors(temporal_patch_size)[::-1],
                            np.int64))
    h_ch = np.ceil(h**2 * n_channels / 64).astype(np.int64) * 64
    t_ch = np.ceil(h[-1] ** 2 * n_channels * t / 64).astype(np.int64) * 64
    base = np.array([[1, 1, 1, n_channels]], np.int64)
    spatial = np.stack([np.ones_like(h), h, h, h_ch], axis=1)
    temporal = np.stack([t, np.full_like(t, h[-1]),
                         np.full_like(t, h[-1]), t_ch], axis=1)
    scales = np.concatenate([base, spatial, temporal], axis=0)
    size_red = np.prod(scales[:, :-1], axis=1).astype(np.float64)
    total = patch_size * patch_size * temporal_patch_size * n_channels
    log_ideal = np.linspace(0.0, math.log(total), n_layers + 1)
    cost = np.abs(log_ideal[:, None] - np.log(size_red)[None, :])
    if n_layers + 1 >= scales.shape[0]:
        idxs = np.argmin(cost, axis=1)
    else:
        idxs = np.array(_assign(cost))
    idxs[0] = 0
    idxs[-1] = scales.shape[0] - 1
    return scales[idxs]


def fold_timespace_to_depth(x, t_fold, hw_fold):
    """[B, T, H, W, C] -> [B, T/t, H/s, W/s, C*t*s*s]."""
    B, T, H, W, C = x.shape
    tn, hn, wn = T // t_fold, H // hw_fold, W // hw_fold
    x = x.reshape(B, tn, t_fold, hn, hw_fold, wn, hw_fold, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(B, tn, hn, wn, t_fold * hw_fold * hw_fold * C)


class VisionModel:
    def __init__(self, config: VisionConfig):
        self.config = config
        self.scales = plan_out_scales(
            config.temporal_patch_size, config.patch_size,
            config.n_layers, config.num_channels)

    def __call__(self, params, pixel_values):
        """[N, T, H, W, C] patches -> [N, text_hidden] soft tokens."""
        cfg = self.config
        h = pixel_values
        n = len(self.scales) - 1
        for i in range(n):
            s, e = self.scales[i], self.scales[i + 1]
            t_fold = int(e[0] // s[0])
            hw_fold = int(e[1] // s[1])
            if t_fold > 1 or hw_fold > 1:
                h = fold_timespace_to_depth(h, t_fold, hw_fold)
            lp = params["encoder_layers"][str(i)]
            h = linear(lp["projection"], h)
            if i != n - 1:
                h = jax.nn.gelu(rms_norm(lp["layer_norm"], h,
                                         cfg.rms_norm_eps),
                                approximate=True)
        h = rms_norm(params["final_norm"], h, cfg.rms_norm_eps)
        return h.reshape(pixel_values.shape[0], -1)


def audio_embed(params, cfg: AudioConfig, audio_input_ids):
    """[..., frames, n_mel_bins] bucket ids -> [..., frames, hidden]
    (reference audio.py dMel front end)."""
    offsets = jnp.arange(cfg.n_mel_bins, dtype=audio_input_ids.dtype) \
        * cfg.mel_vocab_size
    emb = embedding(params["embed_audio_tokens"], audio_input_ids + offsets)
    return rms_norm(params["norm"], emb.sum(axis=-2), cfg.rms_norm_eps)


# --------------------------------------------------------------- language

@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "conv_kv", "conv_h", "offset", "left_pad"],
    meta_fields=[],
)
@dataclasses.dataclass
class InklingCache:
    """KV buffers + 4 short-conv tails per layer.

    conv_kv: [L, 2, B, K-1, kv_width]  (k_sconv, v_sconv)
    conv_h:  [L, 2, B, K-1, hidden]    (attn_sconv, mlp_sconv)
    """

    k: jax.Array
    v: jax.Array
    conv_kv: jax.Array
    conv_h: jax.Array
    offset: jax.Array
    left_pad: jax.Array

    @property
    def capacity(self) -> int:
        return self.k.shape[3]

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]


def _sconv(w, x, state):
    """Depthwise causal conv + residual, fp32 (reference :115).
    w [C, 1, K] or [C, K, 1]; x [B, S, C]; state [B, K-1, C]."""
    wf = np.asarray if isinstance(w, np.ndarray) else (lambda a: a)
    w = jnp.asarray(w, jnp.float32)
    if w.ndim == 3:
        w = w.reshape(w.shape[0], -1)  # [C, K]
    K = w.shape[-1]
    xf = x.astype(jnp.float32)
    full = jnp.concatenate([state.astype(jnp.float32), xf], axis=1)
    S = x.shape[1]
    out = sum(full[:, j: j + S] * w[:, j][None, None]
              for j in range(K))
    return (out + xf).astype(x.dtype), full[:, -(K - 1):].astype(state.dtype)


def banded_bias(rel, proj, q_offset, C, sliding, rel_extent, S):
    """rel [B, S, H, d_rel]; proj [d_rel, rel_extent] -> additive
    [B, H, S, C] (reference banded_additive_mask:79)."""
    B, _, H, _ = rel.shape
    rl = jnp.einsum("bshd,de->bhse", rel.astype(jnp.float32),
                    proj.astype(jnp.float32))
    qp = q_offset + jnp.arange(S)
    kp = jnp.arange(C)
    dist = qp[:, None] - kp[None, :]  # [S, C]
    gidx = jnp.clip(dist, 0, rel_extent - 1)
    pb = jnp.take_along_axis(
        rl, jnp.broadcast_to(gidx[None, None], (B, H, S, C)), axis=-1)
    pb = jnp.where((dist >= rel_extent)[None, None], 0.0, pb)
    neg = dist < 0
    if sliding > 0:
        neg = neg | (dist >= sliding)
    return jnp.where(neg[None, None], -1e30, pb)


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        a = args
        self.max_h = max(a.num_attention_heads, a.swa_num_attention_heads)
        self.max_kv = max(a.num_key_value_heads, a.swa_num_key_value_heads)
        self.max_d = max(a.head_dim, a.swa_head_dim)
        self.kv_width = self.max_kv * self.max_d

    def _geom(self, i):
        a = self.args
        if a.layer_is_sliding(i):
            return (a.swa_num_attention_heads, a.swa_num_key_value_heads,
                    a.swa_head_dim, a.sliding_window_size)
        return (a.num_attention_heads, a.num_key_value_heads, a.head_dim, 0)

    def _moe(self, mlp, x):
        a = self.args
        B, S, D = x.shape
        flat = x.reshape(B * S, D).astype(jnp.float32)
        gw = mlp["gate_weight"].astype(jnp.float32)
        logits = flat @ gw.T  # [N, routed + shared]
        nr, ns = a.n_routed_experts, a.n_shared_experts
        scores = jax.nn.sigmoid(logits[:, :nr])
        sel = scores + mlp["e_score_correction_bias"].astype(jnp.float32)
        _, idx = jax.lax.top_k(sel, a.num_experts_per_tok)
        routed_logits = jnp.take_along_axis(logits[:, :nr], idx, axis=-1)
        tl = jnp.concatenate([routed_logits, logits[:, nr:]], axis=-1)
        lp = -jnp.logaddexp(jnp.zeros_like(tl), -tl)  # logsigmoid
        w = (jnp.exp(lp - jax.nn.logsumexp(lp, axis=-1, keepdims=True))
             * a.route_scale * mlp["global_scale"].astype(jnp.float32))
        xin = x.reshape(B * S, D)
        yr = switch_glu(
            xin,
            mlp["switch_mlp"]["gate_proj"]["weight"],
            mlp["switch_mlp"]["up_proj"]["weight"],
            mlp["switch_mlp"]["down_proj"]["weight"],
            idx, w[:, : a.num_experts_per_tok],
        )
        sh_idx = jnp.broadcast_to(jnp.arange(ns)[None], (xin.shape[0], ns))
        ys = switch_glu(
            xin,
            mlp["shared_experts"]["gate_proj"]["weight"],
            mlp["shared_experts"]["up_proj"]["weight"],
            mlp["shared_experts"]["down_proj"]["weight"],
            sh_idx, w[:, a.num_experts_per_tok:],
        )
        return (yr + ys).reshape(B, S, D)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        a = self.args
        B, S, _ = inputs_embeds.shape
        eps = a.rms_norm_eps
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        C = cache.capacity
        off = cache.offset
        h = inputs_embeds
        mp = params["model"]
        ks, vs = cache.k, cache.v
        ckv, ch = cache.conv_kv, cache.conv_h
        for i in range(a.num_hidden_layers):
            lp = mp["layers"][str(i)]
            sa = lp["self_attn"]
            nh, nkv, hd, sliding = self._geom(i)
            kvw = nkv * hd
            x = rms_norm(lp["input_layernorm"], h, eps)
            q = linear(sa["q_proj"], x)
            k_raw = linear(sa["k_proj"], x)
            v_raw = linear(sa["v_proj"], x)
            k_c, st = _sconv(sa["k_sconv"]["conv"]["weight"], k_raw,
                             ckv[i, 0][..., :kvw])
            ckv = ckv.at[i, 0, :, :, :kvw].set(st)
            v_c, st = _sconv(sa["v_sconv"]["conv"]["weight"], v_raw,
                             ckv[i, 1][..., :kvw])
            ckv = ckv.at[i, 1, :, :, :kvw].set(st)
            r = linear(sa["r_proj"], x).reshape(B, S, nh, a.d_rel)
            q = rms_norm(sa["q_norm"],
                         q.reshape(B, S, nh, hd), eps).transpose(0, 2, 1, 3)
            k = rms_norm(sa["k_norm"],
                         k_c.reshape(B, S, nkv, hd), eps
                         ).transpose(0, 2, 1, 3)
            v = v_c.reshape(B, S, nkv, hd).transpose(0, 2, 1, 3)
            # KV write at max geometry
            zero = jnp.zeros((), jnp.int32)
            k_buf = jax.lax.dynamic_update_slice(
                ks[i][:, :nkv, :, :hd], k.astype(ks.dtype),
                (zero, zero, off, zero))
            v_buf = jax.lax.dynamic_update_slice(
                vs[i][:, :nkv, :, :hd], v.astype(vs.dtype),
                (zero, zero, off, zero))
            ks = ks.at[i, :, :nkv, :, :hd].set(k_buf)
            vs = vs.at[i, :, :nkv, :, :hd].set(v_buf)
            rel_extent = sliding if sliding else a.rel_extent
            bias = banded_bias(r, sa["rel_proj"], off, C, sliding,
                               rel_extent, S)
            scale = 1.0 / hd  # reference: 1/head_dim, not rsqrt
            if not sliding and a.log_scaling_n_floor:
                qpos = (jnp.arange(S) + off + 1).astype(jnp.float32)
                tau = 1.0 + a.log_scaling_alpha * jnp.log(
                    jnp.maximum(qpos / a.log_scaling_n_floor, 1.0))
                tau = tau.reshape(1, 1, S, 1)
                q = (q * tau.astype(q.dtype))
                bias = jnp.where(bias > -1e29, bias * tau, bias)
            out = sdpa(q, k_buf, v_buf, scale, bias.astype(jnp.float32))
            out = out.transpose(0, 2, 1, 3).reshape(B, S, -1)
            attn = linear(sa["o_proj"], out)
            attn, st = _sconv(lp["attn_sconv"]["conv"]["weight"], attn,
                              ch[i, 0])
            ch = ch.at[i, 0].set(st)
            h = h + attn
            x = rms_norm(lp["post_attention_layernorm"], h, eps)
            mlp = lp["mlp"]
            if "switch_mlp" in mlp:
                r2 = self._moe(mlp, x)
            else:
                r2 = swiglu_mlp(mlp, x) * mlp["global_scale"].astype(x.dtype)
            r2, st = _sconv(lp["mlp_sconv"]["conv"]["weight"], r2, ch[i, 1])
            ch = ch.at[i, 1].set(st)
            h = h + r2
        h = rms_norm(mp["norm"], h, eps)
        if made:
            return h, None
        return h, dataclasses.replace(
            cache, k=ks, v=vs, conv_kv=ckv, conv_h=ch, offset=off + S)

    def logits(self, params, hidden):
        a = self.args
        hidden = hidden / a.logits_mup_width_multiplier
        if a.tie_word_embeddings or "lm_head" not in params:
            out = embedding_as_linear(params["model"]["embed_tokens"],
                                      hidden)
        else:
            out = linear(params["lm_head"], hidden)
        uv = a.unpadded_vocab_size
        if uv is not None and uv < out.shape[-1]:
            out = out[..., :uv]
        return out

    def embed(self, params, input_ids):
        h = embedding(params["model"]["embed_tokens"], input_ids)
        if self.args.use_embed_norm:
            h = rms_norm(params["model"]["embed_norm"], h,
                         self.args.rms_norm_eps)
        return h

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None):
        a = self.args
        L = a.num_hidden_layers
        K = a.sconv_kernel_size
        if left_pad is None:
            left_pad = jnp.zeros((batch_size,), jnp.int32)
        return InklingCache(
            k=jnp.zeros((L, batch_size, self.max_kv, capacity, self.max_d),
                        dtype),
            v=jnp.zeros((L, batch_size, self.max_kv, capacity, self.max_d),
                        dtype),
            conv_kv=jnp.zeros((L, 2, batch_size, K - 1, self.kv_width),
                              jnp.float32),
            conv_h=jnp.zeros((L, 2, batch_size, K - 1, a.hidden_size),
                             jnp.float32),
            offset=jnp.zeros((), jnp.int32),
            left_pad=left_pad,
        )


class Model:
    CONFIG_CLS = ModelConfig

    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config.text_config, config)
        self.vision_model = VisionModel(config.vision_config)

    def get_input_embeddings(self, params, input_ids, pixel_values=None,
                             audio_input_ids=None, image_features=None,
                             **aux):
        embeds = self.language_model.embed(params["language_model"],
                                           input_ids)
        if pixel_values is not None or image_features is not None:
            if image_features is None:
                image_features = self.vision_model(
                    params["vision_model"],
                    pixel_values.astype(embeds.dtype))
            embeds = merge_input_ids_with_image_features(
                self.config.image_token_id, -1, image_features, embeds,
                input_ids)
        if audio_input_ids is not None:
            af = audio_embed(params["audio_model"],
                             self.config.audio_config, audio_input_ids)
            embeds = merge_input_ids_with_image_features(
                self.config.audio_token_id, -1,
                af.reshape(-1, af.shape[-1]), embeds, input_ids)
        return embeds

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
            if k.startswith(("vision_model.", "audio_model.",
                             "language_model.")):
                out[k] = v
                continue
            if k.startswith(("vision_tower.", "visual.")):
                out["vision_model." + k.split(".", 1)[1]] = v
                continue
            if k.startswith(("audio_tower.", "audio.")):
                out["audio_model." + k.split(".", 1)[1]] = v
                continue
            out["language_model." + k] = v
        return out

    @property
    def stack_patterns(self):
        return ()


__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig",
           "AudioConfig", "LanguageModel", "VisionModel"]
