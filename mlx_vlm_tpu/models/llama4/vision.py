"""Llama-4 vision tower (ViT, 2-D complex rope, pixel-shuffle adapter).

Role parity: reference mlx_vlm/models/llama4/vision.py —
Llama4UnfoldConvolution:277 (unfold+linear patch embed),
Llama4VisionRotaryEmbedding:369 (x/y interleaved complex freqs, CLS zeroed),
Llama4VisionPixelShuffleMLP:40, Llama4MultiModalProjector:26.

TPU design: the patch embed is one matmul over flattened patches; the
complex rope table collapses host-side to per-pair angles
[x-angles | y-angles] applied with the shared traditional-rope kernel;
fixed-size tiles run batched under one scanned encoder.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import layer_norm, linear
from ...core.rope import apply_rope_traditional
from ...ops.attention import sdpa
from ..clip_vision import patchify_images
from .config import VisionConfig

STACK_PREFIX = "model.layers"


def _fast_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def vision_rope_angles(cfg: VisionConfig) -> np.ndarray:
    """[N+1, head_dim/2] per-pair rope angles; CLS (last row) is zero.

    The reference builds interleaved complex freqs then strides by 2
    (vision.py:369-415); that collapses to [x-angles | y-angles]."""
    side = cfg.image_size // cfg.patch_size
    hd = cfg.hidden_size // cfg.num_attention_heads
    fd = hd // 2
    rope_freq = 1.0 / (
        cfg.rope_theta ** (np.arange(0, fd, 2, dtype=np.float64)[: fd // 2] / fd)
    )
    p = np.arange(side * side)
    px, py = p % side, p // side
    ang = np.concatenate(
        [(px[:, None] + 1) * rope_freq[None], (py[:, None] + 1) * rope_freq[None]],
        axis=1,
    )  # [N, hd/2]
    ang = np.concatenate([ang, np.zeros((1, ang.shape[1]))], axis=0)  # CLS
    return ang.astype(np.float32)


def pixel_shuffle(x: jax.Array, ratio: float) -> jax.Array:
    """Transposing pixel shuffle (reference base.py:423)."""
    B, N, C = x.shape
    side = int(N**0.5)
    x = x.reshape(B, side, side, C)
    x = x.reshape(B, side, int(side * ratio), int(C / ratio))
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(B, int(side * ratio), int(side * ratio), int(C / ratio**2))
    x = x.transpose(0, 2, 1, 3)
    return x.reshape(B, -1, x.shape[-1])


class VisionModel:
    def __init__(self, config: VisionConfig):
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5
        self.angles = jnp.asarray(vision_rope_angles(config))

    def __call__(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        """pixel_values [B_tiles, C, H, W] -> adapted features [B, N', out]."""
        cfg = self.config
        patches = patchify_images(pixel_values, cfg.patch_size)
        w = params["patch_embedding"]["linear"]["weight"]
        x = jnp.einsum("bnd,ed->bne", patches.astype(w.dtype), w)
        B, N, E = x.shape
        cls = jnp.broadcast_to(
            params["class_embedding"].reshape(1, 1, E), (B, 1, E)
        ).astype(x.dtype)
        x = jnp.concatenate([x, cls], axis=1)  # CLS appended LAST
        x = x + params["positional_embedding_vlm"][None].astype(x.dtype)
        x = layer_norm(params["layernorm_pre"], x, 1e-5)

        cos = jnp.cos(self.angles)[None].astype(jnp.float32)
        sin = jnp.sin(self.angles)[None].astype(jnp.float32)

        def block(h, lp):
            y = layer_norm(lp["input_layernorm"], h, 1e-5)
            y = self._attention(lp["self_attn"], y, cos, sin)
            h = h + y
            y = layer_norm(lp["post_attention_layernorm"], h, 1e-5)
            y = linear(lp["mlp"]["fc2"], _fast_gelu(linear(lp["mlp"]["fc1"], y)))
            return h + y, None

        x, _ = jax.lax.scan(block, x, params["model"]["layers"])
        x = layer_norm(params["layernorm_post"], x, 1e-5)
        x = x[:, :-1, :]  # drop CLS
        # vision adapter: pixel shuffle + projector MLP (gelu after BOTH fcs)
        ad = params["vision_adapter"]["mlp"]
        x = pixel_shuffle(x, cfg.pixel_shuffle_ratio)
        x = _fast_gelu(linear(ad["fc1"], x))
        x = _fast_gelu(linear(ad["fc2"], x))
        return x

    def _attention(self, p, x, cos, sin):
        B, N, D = x.shape
        q = linear(p["q_proj"], x).reshape(B, N, self.num_heads, self.head_dim)
        k = linear(p["k_proj"], x).reshape(B, N, self.num_heads, self.head_dim)
        v = linear(p["v_proj"], x).reshape(B, N, self.num_heads, self.head_dim)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        q, k = apply_rope_traditional(q, k, cos, sin)
        out = sdpa(q, k, v, self.scale, None)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
        return linear(p["o_proj"], out)

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "position_ids" in k:
                continue
            out[k] = v
        return out
