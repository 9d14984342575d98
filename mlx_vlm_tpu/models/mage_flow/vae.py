"""Mage-Flow "DiCo" VAE: conv encoder + conditional-decoder ("CoD") denoiser.

Role parity: reference mlx_vlm/models/mage_flow/vae.py — DConvEncoder
(patch-conv head + DiCo conv blocks -> posterior mean/logvar at 16x
downsample, 128 latent channels), CoDDecoder (resnet + 32x32 local
attention condition net), DConvDenoiser (one-shot conditional decode:
spatial DiCo trunk + per-patch NeRF-DCT MLP head), MageVAE.encode/decode.

TPU design: everything is NHWC `lax.conv_general_dilated` (channels-last is
the XLA-native layout on TPU; torch OIHW weights transpose to HWIO at load).
The 21-deep DiCo trunks are weight-stacked and run under one `lax.scan`
(one compiled block body instead of 21 inlined copies), the depthwise 3x3
rides `feature_group_count`, and the local attention's 32x32 patch windows
become a reshape + one batched MXU matmul.  The whole decode is a single
jit-compiled program per resolution.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import linear, rms_norm

__all__ = ["MageVAEConfig", "mage_vae_encode", "mage_vae_decode",
           "init_mage_vae_params", "MAGE_VAE_STACK_PATTERNS"]

# per-block param groups that load as stacked [N, ...] scan leaves
MAGE_VAE_STACK_PATTERNS = (
    "decoder_model.blocks",
    "decoder_model.dec_net.res_blocks",
    "dconv_encoder.blocks",
    "dconv_encoder.head_blocks",
)


@dataclasses.dataclass(frozen=True)
class MageVAEConfig:
    latent_channels: int = 128
    hidden_size: int = 384       # DiCo trunk width
    head_size: int = 768         # encoder patch-head width
    patch_size: int = 16         # pixel downsample factor
    num_blocks: int = 21         # DiCo trunk depth (encoder & denoiser)
    gn_groups: int = 32
    nerf_channels: int = 32      # per-patch MLP width (3 + 32 cond = 35 in)
    nerf_max_freqs: int = 8
    mlp_ratio: float = 4.0

    @classmethod
    def from_dict(cls, d: dict) -> "MageVAEConfig":
        import inspect

        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in d.items() if k in allowed})


# ------------------------------------------------------------------ prims
def _conv(p: dict, x: jax.Array, stride: int = 1, padding="SAME",
          groups: int = 1) -> jax.Array:
    out = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype),
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def _group_norm(p: dict, x: jax.Array, groups: int, eps: float = 1e-6):
    B, H, W, C = x.shape
    g = x.reshape(B, H, W, groups, C // groups).astype(jnp.float32)
    mean = g.mean(axis=(1, 2, 4), keepdims=True)
    var = g.var(axis=(1, 2, 4), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    g = g.reshape(B, H, W, C).astype(x.dtype)
    return g * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _ln(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """affine=False LayerNorm over the channel axis."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _ln_affine(p: dict, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    return _ln(x, eps) * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _timestep_embed(p: dict, t: jax.Array, dtype, freq_size: int = 256):
    """reference vae.TimestepEmbedder (decode conditions on t == 0)."""
    half = freq_size // 2
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.reshape(-1, 1).astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1).astype(dtype)
    return linear(p["linear_2"], _silu(linear(p["linear_1"], emb)))


# ------------------------------------------------------------- DiCo blocks
def _dico_block(p: dict, x: jax.Array, temb: jax.Array, C: int) -> jax.Array:
    """adaLN-conditioned depthwise-conv block (reference DiCoBlock)."""
    mods = jnp.split(linear(p["adaLN_modulation"]["linear"], _silu(temb)),
                     6, axis=-1)
    sh_a, sc_a, g_a, sh_m, sc_m, g_m = [m[:, None, None] for m in mods]
    h = _ln(x) * (1.0 + sc_a) + sh_a
    h = jax.nn.gelu(_conv(p["conv2"], _conv(p["conv1"], h), groups=C),
                    approximate=False)
    ca = jax.nn.sigmoid(_conv(p["ca_conv"], h.mean(axis=(1, 2), keepdims=True)))
    h = _conv(p["conv3"], h * ca)
    x = x + g_a * h
    r = _ln(x) * (1.0 + sc_m) + sh_m
    r = _conv(p["conv5"], jax.nn.gelu(_conv(p["conv4"], r), approximate=False))
    return x + g_m * r


def _encoder_dico_block(p: dict, x: jax.Array, C: int) -> jax.Array:
    """unconditioned variant with affine norms (reference EncoderDiCoBlock)."""
    h = jax.nn.gelu(_conv(p["conv2"], _conv(p["conv1"],
                                            _ln_affine(p["norm1"], x)),
                          groups=C), approximate=False)
    h = h * jax.nn.sigmoid(_conv(p["ca_conv"],
                                 h.mean(axis=(1, 2), keepdims=True)))
    x = x + _conv(p["conv3"], h)
    r = _conv(p["conv5"],
              jax.nn.gelu(_conv(p["conv4"], _ln_affine(p["norm2"], x)),
                          approximate=False))
    return x + r


# --------------------------------------------------------------- encoder
def mage_vae_encode(params: dict, cfg: MageVAEConfig, image: jax.Array,
                    sample_key: Optional[jax.Array] = None) -> jax.Array:
    """[B, H, W, 3] in [-1, 1] -> [B, H/16, W/16, latent] posterior sample
    (mean when sample_key is None) — reference DConvEncoder + MageVAE.encode."""
    enc = params["dconv_encoder"]
    B, H, W, _ = image.shape
    if H % cfg.patch_size or W % cfg.patch_size:
        raise ValueError(f"image dims must be multiples of {cfg.patch_size}")
    cond = _conv(enc["patch_cond_embed"], image, stride=cfg.patch_size,
                 padding="VALID")

    def head(h, lp):
        return _encoder_dico_block(lp, h, cfg.head_size), None

    cond, _ = jax.lax.scan(head, cond, enc["head_blocks"])
    cond = _conv(enc["proj_down"], cond)
    # the latent stream starts at zero: z_proj contributes only its bias
    z0 = jnp.zeros(cond.shape[:3] + (cfg.latent_channels,), cond.dtype)
    x = _conv(enc["fuse_proj"],
              jnp.concatenate([cond, _conv(enc["z_proj"], z0)], axis=-1))
    temb = _timestep_embed(enc["t_embedder"], jnp.zeros((B,), x.dtype), x.dtype)

    def trunk(h, lp):
        return _dico_block(lp, h, temb, cfg.hidden_size), None

    x, _ = jax.lax.scan(trunk, x, enc["blocks"])
    stats = _conv(enc["proj_out"], _ln_affine(enc["norm_out"], x))
    mean, logvar = jnp.split(stats, 2, axis=-1)
    if sample_key is None:
        return mean
    logvar = jnp.clip(logvar, -20.0, 10.0)
    noise = jax.random.normal(sample_key, mean.shape, mean.dtype)
    return mean + jnp.exp(0.5 * logvar.astype(jnp.float32)).astype(mean.dtype) * noise


# ------------------------------------------------------ condition decoder
def _local_attention(p: dict, x: jax.Array, C: int, groups: int,
                     patch: int = 32) -> jax.Array:
    """32x32 windowed self-attention (reference LocalAttentionBlock):
    pad-to-window, reshape to [B*r*c, p*p, C], one batched MXU matmul."""
    h = _group_norm(p["norm"], x, groups)
    B, H, W, _ = x.shape
    ph = -(-H // patch) * patch
    pw = -(-W // patch) * patch

    def patchify(t):
        if (ph, pw) != (H, W):
            t = jnp.pad(t, ((0, 0), (0, ph - H), (0, pw - W), (0, 0)),
                        mode="edge")
        t = t.reshape(B, ph // patch, patch, pw // patch, patch, C)
        return t.transpose(0, 1, 3, 2, 4, 5).reshape(-1, patch * patch, C)

    q = patchify(_conv(p["q"], h)).astype(jnp.float32)
    k = patchify(_conv(p["k"], h)).astype(jnp.float32)
    v = patchify(_conv(p["v"], h)).astype(jnp.float32)
    scores = jax.nn.softmax(q @ k.swapaxes(-1, -2) * (C ** -0.5), axis=-1)
    o = (scores @ v).astype(x.dtype)
    o = o.reshape(B, ph // patch, pw // patch, patch, patch, C)
    o = o.transpose(0, 1, 3, 2, 4, 5).reshape(B, ph, pw, C)[:, :H, :W]
    return x + _conv(p["proj_out"], o)


def _resnet(p: dict, x: jax.Array, groups: int) -> jax.Array:
    h = _conv(p["conv1"], _silu(_group_norm(p["norm1"], x, groups)))
    h = _conv(p["conv2"], _silu(_group_norm(p["norm2"], h, groups)))
    return x + h


def _cod_decoder(p: dict, cfg: MageVAEConfig, latent: jax.Array) -> jax.Array:
    """latent grid -> condition features (reference CoDDecoder:
    res / local-attn / res / local-attn / res)."""
    g = cfg.gn_groups
    h = _conv(p["conv_in"], latent)
    h = _resnet(p["block"]["0"], h, g)
    h = _local_attention(p["block"]["1"], h, cfg.hidden_size, g)
    h = _resnet(p["block"]["2"], h, g)
    h = _local_attention(p["block"]["3"], h, cfg.hidden_size, g)
    h = _resnet(p["block"]["4"], h, g)
    return _conv(p["conv_out"], _silu(_group_norm(p["norm_out"], h, g)))


# ------------------------------------------------------------- denoiser
def _nerf_dct(patch: int, max_freqs: int) -> np.ndarray:
    """per-patch DCT positional features [p*p, max_freqs^2]
    (reference NerfEmbedder)."""
    pos = np.linspace(0.0, 1.0, patch, dtype=np.float32)
    py, px = np.meshgrid(pos, pos, indexing="ij")
    px = px.reshape(-1, 1, 1)
    py = py.reshape(-1, 1, 1)
    f = np.linspace(0.0, max_freqs, max_freqs, dtype=np.float32)
    fx = f[None, :, None]
    fy = f[None, None, :]
    coef = 1.0 / (1.0 + fx * fy)
    dct = np.cos(np.pi * px * fx) * np.cos(np.pi * py * fy) * coef
    return dct.reshape(patch * patch, max_freqs * max_freqs)


def mage_vae_decode(params: dict, cfg: MageVAEConfig,
                    latent: jax.Array) -> jax.Array:
    """[B, gh, gw, latent] -> [B, gh*16, gw*16, 3] in [-1, 1]
    (reference MageVAE.decode = CoDDecoder condition + DConvDenoiser)."""
    dm = params["decoder_model"]
    cond = _cod_decoder(dm["y_embedder"]["decoder"], cfg, latent)
    B, gh, gw, _ = cond.shape
    p = cfg.patch_size
    Hd, Wd = gh * p, gw * p
    nerf = cfg.nerf_channels

    # spatial trunk over the zero noise canvas + condition
    noise = jnp.zeros((B, Hd, Wd, 3), cond.dtype)
    temb = _timestep_embed(dm["t_embedder"], jnp.zeros((B,), cond.dtype),
                           cond.dtype)
    se = dm["s_embedder"]
    spatial = _conv(se["proj2"], jnp.concatenate(
        [_conv(se["proj1"], noise, stride=p, padding="VALID"), cond], axis=-1))

    def trunk(h, lp):
        return _dico_block(lp, h, temb, cfg.hidden_size), None

    spatial, _ = jax.lax.scan(trunk, spatial, dm["blocks"])
    spatial = spatial.reshape(B * gh * gw, cfg.hidden_size)

    # per-patch MLP head: zero noise patches + projected condition + DCT
    cond_patches = _conv(dm["y_embedder_x"], cond)
    cond_patches = cond_patches.reshape(B, gh * gw, nerf, p * p)
    cond_patches = cond_patches.transpose(0, 1, 3, 2)  # [B, N, p*p, nerf]
    x = jnp.concatenate(
        [jnp.zeros((B, gh * gw, p * p, 3), cond.dtype), cond_patches],
        axis=-1).reshape(B * gh * gw, p * p, 3 + nerf)
    dct = jnp.asarray(_nerf_dct(p, cfg.nerf_max_freqs), x.dtype)
    x = jnp.concatenate(
        [x, jnp.broadcast_to(dct[None], (x.shape[0],) + dct.shape)], axis=-1)
    x = linear(dm["x_embedder"]["linear"], x)

    dn = dm["dec_net"]
    mlp_cond = linear(dn["cond_embed"], spatial).reshape(
        B * gh * gw, p * p, nerf)
    x = linear(dn["input_proj"], x)

    def res_block(h, lp):
        sh, sc, g = jnp.split(
            linear(lp["adaLN_modulation"]["linear"], _silu(mlp_cond)),
            3, axis=-1)
        r = _ln_affine(lp["in_ln"], h) * (1.0 + sc) + sh
        r = linear(lp["linear_2"], _silu(linear(lp["linear_1"], r)))
        return h + g * r, None

    x, _ = jax.lax.scan(res_block, x, dn["res_blocks"])
    fl = dm["final_layer"]
    x = linear(fl["linear"], rms_norm(fl["norm"], x, 1e-6))
    x = x.reshape(B, gh, gw, p, p, 3).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, Hd, Wd, 3)


# ---------------------------------------------------------- random init
def init_mage_vae_params(cfg: MageVAEConfig, key: jax.Array,
                         dtype=jnp.float32, include_encoder: bool = True):
    """Shape-complete random params (tests / shells)."""
    ks = iter(jax.random.split(key, 512))

    def rn(*shape, scale=0.02):
        return jax.random.normal(next(ks), shape, dtype) * scale

    def conv(o, i, k=1):
        return {"weight": rn(k, k, i, o), "bias": jnp.zeros((o,), dtype)}

    def conv_nb(o, i, k=1):
        return {"weight": rn(k, k, i, o)}

    def lin(o, i):
        return {"weight": rn(o, i), "bias": jnp.zeros((o,), dtype)}

    def norm(c):
        return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    def stack(n, fn):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                      *[fn() for _ in range(n)])

    C, hd = cfg.hidden_size, cfg.head_size
    L, mh = cfg.latent_channels, int(cfg.hidden_size * cfg.mlp_ratio)
    nerf = cfg.nerf_channels
    p = cfg.patch_size

    def dico(width, hidden):
        return {
            "conv1": conv(width, width), "conv2": conv(width, 1, 3),
            "conv3": conv(width, width), "ca_conv": conv(width, width),
            "conv4": conv(hidden, width), "conv5": conv(width, hidden),
            "adaLN_modulation": {"linear": lin(6 * width, width)},
        }

    def enc_dico(width, hidden):
        return {
            "conv1": conv(width, width), "conv2": conv(width, 1, 3),
            "conv3": conv(width, width), "ca_conv": conv(width, width),
            "conv4": conv(hidden, width), "conv5": conv(width, hidden),
            "norm1": norm(width), "norm2": norm(width),
        }

    def tstep(width):
        return {"linear_1": lin(width, 256), "linear_2": lin(width, width)}

    def resnet():
        return {"norm1": norm(C), "conv1": conv(C, C, 3),
                "norm2": norm(C), "conv2": conv(C, C, 3)}

    def lattn():
        return {"norm": norm(C), "q": conv(C, C), "k": conv(C, C),
                "v": conv(C, C), "proj_out": conv(C, C)}

    params = {
        "decoder_model": {
            "t_embedder": tstep(C),
            "y_embedder_x": conv(nerf * p * p, C),
            "x_embedder": {
                "linear": lin(nerf, 3 + nerf + cfg.nerf_max_freqs ** 2)},
            "s_embedder": {"proj1": conv_nb(L, 3, p),
                           "proj2": conv(C, L + C)},
            "blocks": stack(cfg.num_blocks, lambda: dico(C, mh)),
            "dec_net": {
                "cond_embed": lin(p * p * nerf, C),
                "input_proj": lin(nerf, nerf),
                "res_blocks": stack(3, lambda: {
                    "in_ln": norm(nerf),
                    "linear_1": lin(nerf, nerf),
                    "linear_2": lin(nerf, nerf),
                    "adaLN_modulation": {"linear": lin(3 * nerf, nerf)},
                }),
            },
            "final_layer": {"norm": {"weight": jnp.ones((nerf,), dtype)},
                            "linear": lin(3, nerf)},
            "y_embedder": {"decoder": {
                "conv_in": conv(C, L, 3),
                "block": {"0": resnet(), "1": lattn(), "2": resnet(),
                          "3": lattn(), "4": resnet()},
                "norm_out": norm(C),
                "conv_out": conv(C, C, 3),
            }},
        },
    }
    if include_encoder:
        mh_head = int(hd * cfg.mlp_ratio)
        params["dconv_encoder"] = {
            "patch_cond_embed": conv(hd, 3, p),
            "head_blocks": stack(2, lambda: enc_dico(hd, mh_head)),
            "proj_down": conv(C, hd),
            "z_proj": conv(C, L),
            "fuse_proj": conv(C, 2 * C),
            "t_embedder": tstep(C),
            "blocks": stack(cfg.num_blocks, lambda: dico(C, mh)),
            "norm_out": norm(C),
            "proj_out": conv(2 * L, C),
        }
    return params
