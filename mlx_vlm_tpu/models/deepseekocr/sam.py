"""SAM ViT encoder (windowed attention + decomposed relative positions).

Role parity: reference mlx_vlm/models/deepseekocr/sam.py — SAMEncoder:234
(abs pos + [win, win, global] x4 block pattern + conv neck + 2 downsample
convs), Attention:49 with add_decomposed_rel_pos:454 (per-axis relative
bias added to attention logits), window_partition:371.

TPU design: the 12 blocks scan as role-split super-blocks of
[window, window, global] (two compiled bodies); the relative bias is two
static einsums; window partition is a reshape (pad 64 -> 70 once).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import layer_norm, linear


@dataclasses.dataclass
class SAMConfig(BaseModelConfig):
    model_type: str = "sam_vit"
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    final_out_chans: int = 1024


def _rel_table(table: jax.Array, size: int) -> jax.Array:
    """[2*size-1, hd] table -> [size, size, hd] gathered per (q, k)."""
    idx = (np.arange(size)[:, None] - np.arange(size)[None, :]
           + size - 1)
    return jnp.take(table, jnp.asarray(idx), axis=0)


def _attn_rel(p, x, num_heads: int, rel: bool) -> jax.Array:
    """x [B, H, W, C] -> attention with optional decomposed rel bias."""
    B, H, W, C = x.shape
    hd = C // num_heads
    qkv = linear(p["qkv"], x).reshape(B, H * W, 3, num_heads, hd)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)  # [B, nh, HW, hd]
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    scale = hd**-0.5
    logits = (q.astype(jnp.float32) * scale) @ k.astype(
        jnp.float32).transpose(0, 1, 3, 2)  # [B, nh, HW, HW]
    if rel:
        Rh = _rel_table(p["rel_pos_h"].astype(jnp.float32), H)  # [H,H,hd]
        Rw = _rel_table(p["rel_pos_w"].astype(jnp.float32), W)
        rq = q.astype(jnp.float32).reshape(B, num_heads, H, W, hd)
        rel_h = jnp.einsum("bnhwc,hkc->bnhwk", rq, Rh)  # [B,nh,H,W,H]
        rel_w = jnp.einsum("bnhwc,wkc->bnhwk", rq, Rw)  # [B,nh,H,W,W]
        bias = rel_h[..., :, None] + rel_w[..., None, :]  # [B,nh,H,W,H,W]
        logits = logits + bias.reshape(B, num_heads, H * W, H * W)
    probs = jax.nn.softmax(logits, axis=-1)
    o = (probs @ v.astype(jnp.float32)).astype(x.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(B, H, W, C)
    return linear(p["proj"], o)


class SAMEncoder:
    """params mirror the HF keys: patch_embed.proj, pos_embed,
    window_blocks./global_blocks. (role-split from blocks.N), neck.{0,2},
    net_2, net_3."""

    def __init__(self, config: SAMConfig):
        self.config = config
        period = []
        g = set(config.global_attn_indexes)
        for i in range(config.depth):
            period.append("g" if i in g else "w")
        # require the repeating [w..., g] pattern for the super-block scan
        p = config.depth // len(config.global_attn_indexes)
        assert all(period[i] == ("g" if (i % p) == p - 1 else "w")
                   for i in range(config.depth)), "unsupported SAM layout"
        self.period = p

    def __call__(self, params, pixel_values: jax.Array) -> jax.Array:
        """[B, H, W, 3] (channels-last, img_size square) ->
        [B, h', w', final_out_chans] (stride 64 total)."""
        c = self.config
        w = params["patch_embed"]["proj"]["weight"]
        x = jax.lax.conv_general_dilated(
            pixel_values, w.astype(pixel_values.dtype),
            window_strides=(c.patch_size, c.patch_size), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(pixel_values.dtype)
        if "bias" in params["patch_embed"]["proj"]:
            x = x + params["patch_embed"]["proj"]["bias"].astype(x.dtype)
        B, Hg, Wg, E = x.shape
        if "pos_embed" in params:
            pe = params["pos_embed"]
            if pe.shape[1] != Hg:
                pe = jax.image.resize(pe.astype(jnp.float32),
                                      (1, Hg, Wg, E), "bilinear")
            x = x + pe.astype(x.dtype)

        ws = c.window_size
        pad_h = (ws - Hg % ws) % ws
        pad_w = (ws - Wg % ws) % ws

        def win_block(lp, x):
            shortcut = x
            y = layer_norm(lp["norm1"], x, 1e-6)
            if pad_h or pad_w:
                y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            Hp, Wp = Hg + pad_h, Wg + pad_w
            win = y.reshape(B, Hp // ws, ws, Wp // ws, ws, E).transpose(
                0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, E)
            win = _attn_rel(lp["attn"], win, c.num_heads, True)
            y = win.reshape(B, Hp // ws, Wp // ws, ws, ws, E).transpose(
                0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, E)[:, :Hg, :Wg]
            x = shortcut + y
            y = layer_norm(lp["norm2"], x, 1e-6)
            return x + linear(lp["mlp"]["lin2"], jax.nn.gelu(
                linear(lp["mlp"]["lin1"], y), approximate=False))

        def glob_block(lp, x):
            shortcut = x
            y = layer_norm(lp["norm1"], x, 1e-6)
            y = _attn_rel(lp["attn"], y, c.num_heads, True)
            x = shortcut + y
            y = layer_norm(lp["norm2"], x, 1e-6)
            return x + linear(lp["mlp"]["lin2"], jax.nn.gelu(
                linear(lp["mlp"]["lin1"], y), approximate=False))

        nw = self.period - 1

        def super_block(x, xs):
            wp, gp = xs
            for i in range(nw):
                lp = jax.tree.map(lambda t: t[i], wp)
                x = win_block(lp, x)
            x = glob_block(gp, x)
            return x, None

        G = c.depth // self.period
        wp = jax.tree.map(lambda t: t.reshape(G, nw, *t.shape[1:]),
                          params["window_blocks"])
        x, _ = jax.lax.scan(super_block, x, (wp, params["global_blocks"]))

        # neck: 1x1 conv -> LN -> 3x3 conv -> LN (reference :306)
        def conv(pw, x, k, stride=1, pad=0):
            y = jax.lax.conv_general_dilated(
                x, pw.astype(x.dtype), window_strides=(stride, stride),
                padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(x.dtype)
            return y

        x = conv(params["neck"]["0"]["weight"], x, 1)
        x = layer_norm(params["neck"]["1"], x, 1e-6)
        x = conv(params["neck"]["2"]["weight"], x, 3, pad=1)
        x = layer_norm(params["neck"]["3"], x, 1e-6)
        x = conv(params["net_2"]["weight"], x, 3, stride=2, pad=1)
        x = conv(params["net_3"]["weight"], x, 3, stride=2, pad=1)
        return x

    @staticmethod
    def split_blocks(flat: dict, config: SAMConfig, prefix: str) -> dict:
        """blocks.N.* -> window_blocks.j / global_blocks.m role keys."""
        import re

        p = config.depth // len(config.global_attn_indexes)
        out = {}
        rx = re.compile(rf"^{re.escape(prefix)}blocks\.(\d+)\.(.+)$")
        for k, v in flat.items():
            m = rx.match(k)
            if not m:
                out[k] = v
                continue
            i, rest = int(m.group(1)), m.group(2)
            g, r = divmod(i, p)
            if r == p - 1:
                out[f"{prefix}global_blocks.{g}.{rest}"] = v
            else:
                out[f"{prefix}window_blocks.{g * (p - 1) + r}.{rest}"] = v
        return out
