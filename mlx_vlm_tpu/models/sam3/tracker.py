"""SAM3 tracker: SAM2-style prompt encoder, two-way mask decoder, and
memory attention/encoder for video segmentation.

Role parity: reference mlx_vlm/models/sam3/{sam_components,tracker}.py.

TPU design: everything is functional over the param tree; memory
attention concatenates the memory bank into one [B, N_mem, C] tensor and
runs batched RoPE cross-attention; the memory encoder's mask
downsampler/fuser are channels-last convs (k=2/s=2 strided, 7x7
depthwise) that XLA maps straight to the MXU/VPU.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..rt_detr_v2.rt_detr_v2 import _layer_norm, _linear
from .config import (
    PromptEncoderConfig,
    TrackerConfig,
    TrackerMaskDecoderConfig,
)
from .vision import _conv, conv_transpose_2x

# ------------------------------------------------------------------ helpers


def _out_mlp(p: dict, x: jax.Array) -> jax.Array:
    """3-layer output MLP (proj_in -> layers.0 -> proj_out), ReLU between
    (reference sam_components.py OutputMLP)."""
    x = jax.nn.relu(_linear(p["proj_in"], x))
    x = jax.nn.relu(_linear(p["layers"]["0"], x))
    return _linear(p["proj_out"], x)


def _sam_attention(p: dict, q: jax.Array, k: jax.Array, v: jax.Array,
                   n_heads: int) -> jax.Array:
    B, Nq, _ = q.shape
    Nk = k.shape[1]
    qh = _linear(p["q_proj"], q)
    hd = qh.shape[-1] // n_heads
    qh = qh.reshape(B, Nq, n_heads, hd).transpose(0, 2, 1, 3)
    kh = _linear(p["k_proj"], k).reshape(B, Nk, n_heads, hd).transpose(
        0, 2, 1, 3)
    vh = _linear(p["v_proj"], v).reshape(B, Nk, n_heads, hd).transpose(
        0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * (hd ** -0.5)
    a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", a, vh).transpose(0, 2, 1, 3)
    return _linear(p["o_proj"], o.reshape(B, Nq, -1))


# ------------------------------------------------------------------ 1D rope


def rope_1d_tables(dim: int, feat_h: int, feat_w: int,
                   theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """Memory-attention RoPE freqs [(H*W, dim//2)] (reference position.py
    init_2d_freqs)."""
    half = dim // 2
    freqs = 1.0 / (theta ** (np.arange(0, half, 2, dtype=np.float32) / half))
    gy, gx = np.meshgrid(np.arange(feat_h, dtype=np.float32),
                         np.arange(feat_w, dtype=np.float32), indexing="ij")
    fy = np.outer(gy.reshape(-1), freqs)
    fx = np.outer(gx.reshape(-1), freqs)
    fa = np.concatenate([fy, fx], axis=-1)
    return np.cos(fa), np.sin(fa)


def _apply_rope_1d(x: jax.Array, cos: jax.Array, sin: jax.Array,
                   repeat: bool = False) -> jax.Array:
    """x [B, N, H, D]; cos/sin [Nf, D//2]."""
    N = x.shape[1]
    if repeat:
        Nf = cos.shape[0]
        reps = (N + Nf - 1) // Nf
        cos = jnp.tile(cos, (reps, 1))[:N]
        sin = jnp.tile(sin, (reps, 1))[:N]
    else:
        cos = cos[:N]
        sin = sin[:N]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    xr, xi = x[..., 0::2], x[..., 1::2]
    outr = xr * c - xi * s
    outi = xr * s + xi * c
    return jnp.stack([outr, outi], axis=-1).reshape(x.shape)


def _rope_attention(p: dict, q: jax.Array, k: jax.Array, v: jax.Array,
                    n_heads: int, cos, sin, rope_k_repeat: bool
                    ) -> jax.Array:
    B, Nq, _ = q.shape
    Nk = k.shape[1]
    qh = _linear(p["q_proj"], q)
    hd = qh.shape[-1] // n_heads
    qh = qh.reshape(B, Nq, n_heads, hd)
    kh = _linear(p["k_proj"], k).reshape(B, Nk, n_heads, hd)
    vh = _linear(p["v_proj"], v).reshape(B, Nk, n_heads, hd)
    qh = _apply_rope_1d(qh, cos, sin, False)
    kh = _apply_rope_1d(kh, cos, sin, rope_k_repeat)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * (hd ** -0.5)
    a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, vh).reshape(B, Nq, -1)
    return _linear(p["o_proj"], o)


# ----------------------------------------------------------- prompt encoder


def _pe_with_coords(pe_table: jax.Array, coords: jax.Array) -> jax.Array:
    """Random-fourier positional encoding of [B, N, 2] coords in [0,1]."""
    c = (2 * coords - 1) @ pe_table.astype(coords.dtype)
    c = 2 * math.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def prompt_encoder_dense_pe(p: dict, cfg: PromptEncoderConfig) -> jax.Array:
    H = W = cfg.image_size // cfg.patch_size
    gy = (jnp.arange(H, dtype=jnp.float32)) / H
    gx = (jnp.arange(W, dtype=jnp.float32)) / W
    yy, xx = jnp.meshgrid(gy, gx, indexing="ij")
    coords = jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1)[None]
    pe = p["shared_embedding"]["positional_embedding"]
    return _pe_with_coords(pe, coords)  # [1, H*W, D]


def prompt_encoder(p: dict, cfg: PromptEncoderConfig,
                   points: Optional[Tuple[jax.Array, jax.Array]] = None,
                   boxes: Optional[jax.Array] = None,
                   masks: Optional[jax.Array] = None,
                   batch: int = 1):
    """-> (sparse [B, N, D], dense [B, H*W, D])."""
    d = cfg.hidden_size
    H = W = cfg.image_size // cfg.patch_size
    pe = p["shared_embedding"]["positional_embedding"]
    sparse = jnp.zeros((batch, 0, d), jnp.float32)

    if points is not None:
        coords, labels = points
        B = coords.shape[0]
        c = (coords + 0.5) / jnp.asarray([W, H], jnp.float32)
        emb = _pe_with_coords(pe, c)
        lab = jnp.clip(labels, 0, None).astype(jnp.int32)
        emb = emb + p["point_embed"]["weight"][lab]
        emb = jnp.where((labels == -1)[..., None],
                        p["not_a_point_embed"]["weight"][0], emb)
        sparse = emb

    if boxes is not None:
        B = boxes.shape[0]
        c = boxes.reshape(B, -1, 2, 2).reshape(B, -1, 2)
        emb = _pe_with_coords(pe, c)
        n_boxes = boxes.shape[1] if boxes.ndim == 3 else 1
        corner = jnp.tile(p["point_embed"]["weight"][2:4][None],
                          (B, n_boxes, 1)).reshape(B, -1, d)
        emb = emb + corner
        sparse = emb if sparse.shape[1] == 0 else jnp.concatenate(
            [sparse, emb], axis=1)

    if masks is not None:
        x = masks  # [B, Hm, Wm, 1]
        me = p["mask_embed"]
        x = jax.nn.gelu(_layer_norm(
            me["layer_norm1"], _conv(me["conv1"], x, 2, stride=2), 1e-6))
        x = jax.nn.gelu(_layer_norm(
            me["layer_norm2"], _conv(me["conv2"], x, 2, stride=2), 1e-6))
        x = _conv(me["conv3"], x, 1)
        dense = x.reshape(x.shape[0], -1, d)
    else:
        B = sparse.shape[0] if sparse.shape[1] else batch
        dense = jnp.broadcast_to(
            p["no_mask_embed"]["weight"].reshape(1, 1, d), (B, H * W, d))
    return sparse, dense


# -------------------------------------------------------- two-way decoder


def _two_way_block(p: dict, queries, keys, qpe, kpe, n_heads):
    q = queries + qpe
    queries = _layer_norm(p["layer_norm1"],
                          queries + _sam_attention(p["self_attn"], q, q,
                                                   queries, n_heads), 1e-5)
    q = queries + qpe
    k = keys + kpe
    queries = _layer_norm(
        p["layer_norm2"],
        queries + _sam_attention(p["cross_attn_token_to_image"], q, k, keys,
                                 n_heads), 1e-5)
    m = _linear(p["mlp"]["proj_out"],
                jax.nn.relu(_linear(p["mlp"]["proj_in"], queries)))
    queries = _layer_norm(p["layer_norm3"], queries + m, 1e-5)
    q = keys + kpe
    k = queries + qpe
    keys = _layer_norm(
        p["layer_norm4"],
        keys + _sam_attention(p["cross_attn_image_to_token"], q, k, queries,
                              n_heads), 1e-5)
    return queries, keys


def sam_mask_decoder(p: dict, cfg: TrackerMaskDecoderConfig,
                     image_emb: jax.Array, image_pe: jax.Array,
                     sparse: jax.Array, dense: jax.Array,
                     multimask_output: bool = True,
                     high_res_features: Optional[List[jax.Array]] = None):
    """-> (masks [B,M,H4,W4], iou [B,M], tokens [B,T,D], obj_score [B,1])."""
    B = image_emb.shape[0]
    d = image_emb.shape[-1]
    n_mask = cfg.num_multimask_outputs + 1
    tokens = jnp.concatenate([
        jnp.broadcast_to(p["iou_token"]["weight"][None], (B, 1, d)),
        jnp.broadcast_to(p["mask_tokens"]["weight"][None], (B, n_mask, d)),
        jnp.broadcast_to(p["obj_score_token"]["weight"][None], (B, 1, d)),
    ], axis=1)
    if sparse.shape[1]:
        tokens = jnp.concatenate([tokens, sparse.astype(tokens.dtype)], 1)

    src = image_emb + dense
    queries, keys = tokens, src
    tp = p["transformer"]
    for i in range(cfg.num_hidden_layers):
        queries, keys = _two_way_block(
            tp["layers"][str(i)], queries, keys, tokens, image_pe,
            cfg.num_attention_heads)
    q = queries + tokens
    k = keys + image_pe
    queries = _layer_norm(
        tp["layer_norm_final_attn"],
        queries + _sam_attention(tp["final_attn_token_to_image"], q, k,
                                 keys, cfg.num_attention_heads), 1e-5)

    iou_tok = queries[:, 0]
    mask_toks = queries[:, 1:1 + n_mask]
    obj_tok = queries[:, 1 + n_mask]

    HW = keys.shape[1]
    H = W = int(math.isqrt(HW))
    src_sp = keys.reshape(B, H, W, d)
    up = conv_transpose_2x(p["upscale_conv1"], src_sp)
    up = jax.nn.gelu(_layer_norm(p["upscale_layer_norm"], up, 1e-6))
    if high_res_features is not None and len(high_res_features) >= 1:
        s1 = _conv(p["conv_s1"], high_res_features[0], 1)
        if s1.shape[1:3] == up.shape[1:3]:
            up = up + s1
    up = jax.nn.gelu(conv_transpose_2x(p["upscale_conv2"], up))
    if high_res_features is not None and len(high_res_features) >= 2:
        s0 = _conv(p["conv_s0"], high_res_features[1], 1)
        if s0.shape[1:3] == up.shape[1:3]:
            up = up + s0

    B, Hu, Wu, Cu = up.shape
    flat = up.reshape(B, Hu * Wu, Cu)
    hyper = jnp.stack([
        _out_mlp(p["output_hypernetworks_mlps"][str(i)], mask_toks[:, i])
        for i in range(n_mask)
    ], axis=1)                                           # [B, M, Cu]
    masks = jnp.einsum("bmc,bnc->bmn", hyper, flat).reshape(B, n_mask, Hu, Wu)
    iou = _out_mlp(p["iou_prediction_head"], iou_tok)
    obj = _out_mlp(p["pred_obj_score_head"], obj_tok)
    if multimask_output:
        return masks[:, 1:], iou[:, 1:], queries, obj
    return masks[:, :1], iou[:, :1], queries, obj


# ----------------------------------------------------------- memory modules


def memory_encoder(p: dict, cfg: TrackerConfig, features: jax.Array,
                   masks: jax.Array) -> jax.Array:
    """features [B,H,W,D] + masks [B,16H,16W,1] -> memory [B,H,W,out]."""
    md = p["mask_downsampler"]
    x = masks
    k = cfg.mask_downsampler_kernel_size
    s = cfg.mask_downsampler_stride
    pad = cfg.mask_downsampler_padding
    for i in range(4):
        lp = md["layers"][str(i)]
        x = jax.nn.gelu(_layer_norm(
            lp["layer_norm"], _conv(lp["conv"], x, k, padding=pad, stride=s),
            1e-6))
    x = _conv(md["final_conv"], x, 1)

    f = _conv(p["feature_projection"], features, 1)
    fused = f + x
    for i in range(cfg.memory_fuser_num_layers):
        lp = p["memory_fuser"]["layers"][str(i)]
        r = fused
        C = fused.shape[-1]
        y = _conv(lp["depthwise_conv"], fused, cfg.memory_fuser_kernel_size,
                  padding=cfg.memory_fuser_padding, groups=C)
        y = _layer_norm(lp["layer_norm"], y, 1e-6)
        y = _linear(lp["pointwise_conv2"],
                    jax.nn.gelu(_linear(lp["pointwise_conv1"], y)))
        fused = r + lp["scale"] * y
    return _conv(p["projection"], fused, 1)


def memory_attention(p: dict, cfg: TrackerConfig, src: jax.Array,
                     memory: jax.Array) -> jax.Array:
    """src [B, HW, D] attends to memory [B, N_mem, mem_dim]."""
    h, w = cfg.memory_attention_rope_feat_sizes
    d = cfg.memory_attention_hidden_size
    nH = cfg.memory_attention_num_attention_heads
    internal = d // cfg.memory_attention_downsample_rate
    cos, sin = (jnp.asarray(a, src.dtype) for a in rope_1d_tables(
        internal // nH, h, w, cfg.memory_attention_rope_theta))
    for i in range(cfg.memory_attention_num_layers):
        lp = p["layers"][str(i)]
        src = _layer_norm(
            lp["layer_norm1"],
            src + _rope_attention(lp["self_attn"], src, src, src, nH,
                                  cos, sin, False), 1e-5)
        src = _layer_norm(
            lp["layer_norm2"],
            src + _rope_attention(lp["cross_attn_image"], src, memory,
                                  memory, nH, cos, sin, True), 1e-5)
        src = _layer_norm(
            lp["layer_norm3"],
            src + _linear(lp["linear2"],
                          jax.nn.relu(_linear(lp["linear1"], src))), 1e-5)
    return _layer_norm(p["layer_norm"], src, 1e-5)


# --------------------------------------------------------------- track step


def track_step(p: dict, cfg: TrackerConfig, current_features: jax.Array,
               memory_bank: Optional[List[jax.Array]] = None,
               prompt_points=None, prompt_boxes=None, prompt_masks=None,
               multimask_output: bool = False,
               high_res_features: Optional[List[jax.Array]] = None) -> Dict:
    """One tracking step (reference tracker.py TrackerModel.track_step)."""
    B, H, W, D = current_features.shape
    src = current_features.reshape(B, H * W, D)
    if memory_bank:
        memory = jnp.concatenate(memory_bank, axis=1)
        src = memory_attention(p["memory_attention"], cfg, src, memory)

    pe_cfg = cfg.prompt_encoder_config
    image_pe = jnp.broadcast_to(
        prompt_encoder_dense_pe(p["prompt_encoder"], pe_cfg), (B, H * W, D))
    sparse, dense = prompt_encoder(
        p["prompt_encoder"], pe_cfg, points=prompt_points,
        boxes=prompt_boxes, masks=prompt_masks, batch=B)

    masks, iou, toks, obj = sam_mask_decoder(
        p["mask_decoder"], cfg.mask_decoder_config, src, image_pe, sparse,
        dense, multimask_output, high_res_features)

    obj_ptr = _out_mlp(p["object_pointer_proj"], toks[:, 0])

    # memory from the first predicted mask, upsampled so the stride-16
    # downsampler lands back on the feature grid
    m = masks[:, 0:1].transpose(0, 2, 3, 1)
    target_h, target_w = 16 * H, 16 * W
    if m.shape[1] != target_h:
        m = jax.image.resize(m, (B, target_h, target_w, 1), "nearest")
    mem = memory_encoder(p["memory_encoder"], cfg, current_features, m)
    mem = mem.reshape(B, -1, mem.shape[-1])

    return {"pred_masks": masks, "iou_scores": iou, "obj_scores": obj,
            "object_pointer": obj_ptr, "memory": mem}
