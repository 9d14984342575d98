"""Mage-Flow text-to-image / image-editing pipelines (microsoft/Mage-Flow*).

Role parity: reference mlx_vlm/models/mage_flow/* — config.py variant table
(base / default / turbo x generate / edit), transformer.py MageFlowTransformer
(12-block dual-stream MMDiT with joint attention over [text; image], centered
3-axis RoPE on the image stream only), scheduler.py static-shift flow-match
Euler, text_encoder.py (Qwen3-VL hidden states behind fixed chat templates,
34/64-token prefix trim), pipeline.py MageFlowPipeline.generate_array /
edit_array (CFG with optional velocity renormalization; edit concatenates
VAE-encoded reference latents after the target tokens).

TPU design:
- The transformer blocks are weight-stacked and run under ONE `lax.scan`
  (a single compiled block body instead of 12 inlined copies); RoPE tables
  are host-precomputed per latent grid and stay device-resident.
- One `jax.jit` program per (target_len, ref_len, text_len) covers the
  whole denoise step: cond forward, uncond forward, guidance mix, optional
  renormalization and the Euler update.  CFG runs as two forwards INSIDE
  the program (the positive/negative prompts have different lengths and
  this attention has no padding mask, so row-batching them would change
  the math); XLA overlaps their schedules.
- The DiCo VAE lives in .vae (NHWC convs, scan-stacked trunks).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import math
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import linear, rms_norm
from .vae import (MAGE_VAE_STACK_PATTERNS, MageVAEConfig,
                  init_mage_vae_params, mage_vae_decode, mage_vae_encode)

__all__ = [
    "MageFlowConfig", "MageFlowVariant", "MageFlowPipeline",
    "get_variant", "mage_transformer_forward", "image_rope",
    "flow_match_sigmas", "init_mage_transformer_params",
    "GENERATION_TEMPLATE", "EDIT_TEMPLATE",
]

GENERATION_TEMPLATE = (
    "<|im_start|>system\n"
    "Describe the image by detailing the color, shape, size, texture, "
    "quantity, text, spatial relationships of the objects and background:"
    "<|im_end|>\n<|im_start|>user\n{}<|im_end|>\n"
    "<|im_start|>assistant\n"
)
EDIT_TEMPLATE = (
    "<|im_start|>system\n"
    "Describe the key features of the input image (color, shape, size, "
    "texture, objects, background), then explain how the user's text "
    "instruction should alter or modify the image. Generate a new image "
    "that meets the user's requirements while maintaining consistency with "
    "the original input where appropriate.<|im_end|>\n"
    "<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n"
)
GENERATION_PREFIX_TOKENS = 34  # reference text_encoder.py encode :34 trim
EDIT_PREFIX_TOKENS = 64


@dataclasses.dataclass(frozen=True)
class MageFlowConfig:
    """reference transformer.py MageFlowTransformer defaults."""

    in_channels: int = 128
    out_channels: int = 128
    context_in_dim: int = 2560
    hidden_size: int = 3072
    num_heads: int = 24
    depth: int = 12
    axes_dim: Tuple[int, int, int] = (16, 56, 56)
    theta: float = 10000.0
    mlp_ratio: float = 4.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def from_dict(cls, d: dict) -> "MageFlowConfig":
        import inspect

        allowed = inspect.signature(cls).parameters
        d = {k: v for k, v in d.items() if k in allowed}
        if "axes_dim" in d:
            d["axes_dim"] = tuple(d["axes_dim"])
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class MageFlowVariant:
    """reference config.py VARIANTS (generate vs edit, default steps)."""

    name: str
    repo_id: str
    task: str
    default_steps: int
    default_guidance: float


VARIANTS = {
    "mage-flow-base": MageFlowVariant(
        "mage-flow-base", "microsoft/Mage-Flow-Base", "generate", 30, 5.0),
    "mage-flow": MageFlowVariant(
        "mage-flow", "microsoft/Mage-Flow", "generate", 20, 5.0),
    "mage-flow-turbo": MageFlowVariant(
        "mage-flow-turbo", "microsoft/Mage-Flow-Turbo", "generate", 4, 1.0),
    "mage-flow-edit-base": MageFlowVariant(
        "mage-flow-edit-base", "microsoft/Mage-Flow-Edit-Base", "edit", 30, 5.0),
    "mage-flow-edit": MageFlowVariant(
        "mage-flow-edit", "microsoft/Mage-Flow-Edit", "edit", 30, 5.0),
    "mage-flow-edit-turbo": MageFlowVariant(
        "mage-flow-edit-turbo", "microsoft/Mage-Flow-Edit-Turbo", "edit", 4, 1.0),
}


def get_variant(name: str = "mage-flow") -> MageFlowVariant:
    """Name / repo-id / directory-name resolution (reference get_variant +
    variant_from_local_path name heuristics)."""
    key = str(name).strip().lower().rstrip("/")
    if key in VARIANTS:
        return VARIANTS[key]
    for v in VARIANTS.values():
        if key == v.repo_id.lower() or key == v.repo_id.rsplit("/", 1)[-1].lower():
            return v
    low = key.replace("_", "-")
    is_edit = "edit" in low
    if "turbo" in low:
        return VARIANTS["mage-flow-edit-turbo" if is_edit else "mage-flow-turbo"]
    if "base" in low:
        return VARIANTS["mage-flow-edit-base" if is_edit else "mage-flow-base"]
    return VARIANTS["mage-flow-edit" if is_edit else "mage-flow"]


def validate_dimensions(*, width: int, height: int) -> None:
    for label, value in (("width", width), ("height", height)):
        if value < 512 or value > 2048:
            raise ValueError(f"{label} must be in [512, 2048], got {value}")
        if value % 16:
            raise ValueError(f"{label} must be a multiple of 16, got {value}")


# ------------------------------------------------------------- scheduler
def flow_match_sigmas(num_steps: int, shift: float = 6.0) -> np.ndarray:
    """Static-shift flow-match sigma schedule incl. terminal 0 (reference
    scheduler.py FlowMatchEulerDiscreteScheduler)."""
    if num_steps < 1:
        raise ValueError(f"num_steps must be >= 1, got {num_steps}")
    base = np.linspace(1.0, 1.0 / num_steps, num_steps, dtype=np.float32)
    sig = shift * base / (1.0 + (shift - 1.0) * base)
    return np.concatenate([sig, np.zeros((1,), np.float32)])


# ----------------------------------------------------------------- rope
def image_rope(shapes: Sequence[Tuple[int, int, int]],
               axes_dim: Tuple[int, int, int] = (16, 56, 56),
               theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """Centered 3-axis RoPE tables for the image token stream
    (reference transformer.py image_rope_frequencies); host numpy, computed
    once per latent grid.  Returns cos/sin [sum(frames*h*w), head_dim//2]."""
    chunks = []
    for frame_index, (frames, h, w) in enumerate(shapes):
        fpos = np.arange(frame_index, frame_index + frames, dtype=np.float32)
        hpos = np.arange(h, dtype=np.float32) - (h - h // 2)
        wpos = np.arange(w, dtype=np.float32) - (w - w // 2)

        def ax(pos, dim):
            inv = 1.0 / theta ** (np.arange(0, dim, 2, np.float32) / dim)
            return pos[:, None] * inv[None]

        ff = np.broadcast_to(ax(fpos, axes_dim[0])[:, None, None, :],
                             (frames, h, w, axes_dim[0] // 2))
        fh = np.broadcast_to(ax(hpos, axes_dim[1])[None, :, None, :],
                             (frames, h, w, axes_dim[1] // 2))
        fw = np.broadcast_to(ax(wpos, axes_dim[2])[None, None, :, :],
                             (frames, h, w, axes_dim[2] // 2))
        chunks.append(np.concatenate([ff, fh, fw], axis=-1).reshape(
            -1, sum(axes_dim) // 2))
    freqs = np.concatenate(chunks, axis=0)
    return np.cos(freqs), np.sin(freqs)


def _apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Adjacent-pair complex RoPE on [B, L, H, D] (reference apply_rotary)."""
    even = x[..., 0::2].astype(jnp.float32)
    odd = x[..., 1::2].astype(jnp.float32)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    real = even * c - odd * s
    imag = even * s + odd * c
    return jnp.stack([real, imag], axis=-1).reshape(x.shape).astype(x.dtype)


# ------------------------------------------------------------ transformer
def _timestep_embedding(t: jax.Array, dim: int = 256,
                        scale: float = 1000.0) -> jax.Array:
    """[cos, sin] sinusoid with bf16-rounded frequencies — the reference
    keeps this training-era rounding quirk (transformer.timestep_embedding),
    so parity requires it."""
    half = dim // 2
    expo = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    freqs = jnp.exp(expo).astype(jnp.bfloat16).astype(jnp.float32)
    args = scale * t.reshape(-1, 1).astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _ln(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _modulate(x, mod3):
    shift, scale, gate = jnp.split(mod3, 3, axis=-1)
    return x * (1.0 + scale[:, None]) + shift[:, None], gate[:, None]


def mage_transformer_forward(params: dict, cfg: MageFlowConfig,
                             img: jax.Array, txt: jax.Array, t: jax.Array,
                             cos: jax.Array, sin: jax.Array) -> jax.Array:
    """img [B, L_img, in_ch], txt [B, L_txt, ctx_dim], t [B] (sigma in
    [0,1]) -> velocity [B, L_img, out_ch] (reference MageFlowTransformer)."""
    nh, hd = cfg.num_heads, cfg.head_dim
    image = linear(params["img_in"], img)
    dtype = image.dtype
    text = linear(params["txt_in"],
                  rms_norm(params["txt_norm"], txt.astype(dtype), 1e-6))
    te = params["time_text_embed"]["timestep_embedder"]
    temb = _timestep_embedding(t).astype(dtype)
    temb = linear(te["linear_2"], _silu(linear(te["linear_1"], temb)))
    B, Lt = text.shape[:2]
    Li = image.shape[1]

    def heads(x):
        return x.reshape(B, -1, nh, hd)

    def block(carry, lp):
        image, text = carry
        img_mod1, img_mod2 = jnp.split(
            linear(lp["img_mod"]["linear"], _silu(temb)), 2, axis=-1)
        txt_mod1, txt_mod2 = jnp.split(
            linear(lp["txt_mod"]["linear"], _silu(temb)), 2, axis=-1)
        img_n, img_g1 = _modulate(_ln(image), img_mod1)
        txt_n, txt_g1 = _modulate(_ln(text), txt_mod1)

        a = lp["attn"]
        iq = rms_norm(a["norm_q"], heads(linear(a["to_q"], img_n)), 1e-6)
        ik = rms_norm(a["norm_k"], heads(linear(a["to_k"], img_n)), 1e-6)
        iv = heads(linear(a["to_v"], img_n))
        tq = rms_norm(a["norm_added_q"],
                      heads(linear(a["add_q_proj"], txt_n)), 1e-6)
        tk = rms_norm(a["norm_added_k"],
                      heads(linear(a["add_k_proj"], txt_n)), 1e-6)
        tv = heads(linear(a["add_v_proj"], txt_n))
        iq = _apply_rotary(iq, cos, sin)
        ik = _apply_rotary(ik, cos, sin)
        q = jnp.concatenate([tq, iq], axis=1).transpose(0, 2, 1, 3)
        k = jnp.concatenate([tk, ik], axis=1).transpose(0, 2, 1, 3)
        v = jnp.concatenate([tv, iv], axis=1).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * (hd ** -0.5)
        o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1),
                       v.astype(jnp.float32)).astype(dtype)
        o = o.transpose(0, 2, 1, 3).reshape(B, Lt + Li, nh * hd)
        txt_attn = linear(a["to_add_out"], o[:, :Lt])
        img_attn = linear(a["to_out"], o[:, Lt:])

        image = image + img_g1 * img_attn
        text = text + txt_g1 * txt_attn
        img_n, img_g2 = _modulate(_ln(image), img_mod2)
        txt_n, txt_g2 = _modulate(_ln(text), txt_mod2)

        def ff(fp, x):
            return linear(fp["linear_out"],
                          jax.nn.gelu(linear(fp["linear_in"], x)))

        image = image + img_g2 * ff(lp["img_mlp"], img_n)
        text = text + txt_g2 * ff(lp["txt_mlp"], txt_n)
        return (image, text), None

    (image, _), _ = jax.lax.scan(block, (image, text),
                                 params["transformer_blocks"])
    no = params["norm_out"]
    # reference AdaptiveLayerNorm: chunks are scale THEN shift
    scale, shift = jnp.split(linear(no["linear"], _silu(temb)), 2, axis=-1)
    image = _ln(image) * (1.0 + scale[:, None]) + shift[:, None]
    return linear(params["proj_out"], image)


MAGE_TRANSFORMER_STACK_PATTERNS = ("transformer_blocks",)


# -------------------------------------------------------------- loading
def load_mage_transformer(model_path, dtype=jnp.bfloat16):
    from ...utils.loader import _nest, _read_safetensors, _stack_layers
    from ...imagegen.params import _to_device

    root = Path(model_path).expanduser() / "transformer"
    flat = _stack_layers(dict(_read_safetensors(root)),
                         MAGE_TRANSFORMER_STACK_PATTERNS)
    cfg: dict = {}
    cfgfile = root / "config.json"
    if cfgfile.exists():
        cfg = json.loads(cfgfile.read_text())
    params = _nest(_to_device(flat, dtype))
    n = int(params["transformer_blocks"]["img_mod"]["linear"]
            ["weight"].shape[0])
    cfg["depth"] = n
    cfg.setdefault("hidden_size",
                   int(params["img_in"]["weight"].shape[0]))
    cfg.setdefault("in_channels", int(params["img_in"]["weight"].shape[1]))
    cfg.setdefault("out_channels", int(params["proj_out"]["weight"].shape[0]))
    cfg.setdefault("context_in_dim", int(params["txt_in"]["weight"].shape[1]))
    return params, MageFlowConfig.from_dict(cfg)


def load_mage_vae(model_path, dtype=jnp.bfloat16, include_encoder=True):
    from ...utils.loader import _nest, _read_safetensors, _stack_layers
    from ...imagegen.params import _to_device

    root = Path(model_path).expanduser() / "vae"
    raw = _read_safetensors(root)
    flat = {}
    for k, v in raw.items():
        if not include_encoder and k.startswith("dconv_encoder."):
            continue
        v = np.asarray(v)
        if v.ndim == 4:  # torch OIHW -> HWIO
            v = v.transpose(2, 3, 1, 0)
        flat[k] = v
    flat = _stack_layers(flat, MAGE_VAE_STACK_PATTERNS)
    cfg: dict = {}
    cfgfile = root / "config.json"
    if cfgfile.exists():
        cfg = json.loads(cfgfile.read_text())
    return _nest(_to_device(flat, dtype)), MageVAEConfig.from_dict(cfg)


def init_mage_transformer_params(cfg: MageFlowConfig, key: jax.Array,
                                 dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 64))

    def rn(*shape, scale=0.02):
        return jax.random.normal(next(ks), shape, dtype) * scale

    def lin(o, i):
        return {"weight": rn(o, i), "bias": jnp.zeros((o,), dtype)}

    D, hd = cfg.hidden_size, cfg.head_dim
    mh = int(D * cfg.mlp_ratio)

    def block():
        return {
            "img_mod": {"linear": lin(6 * D, D)},
            "txt_mod": {"linear": lin(6 * D, D)},
            "attn": {
                "to_q": lin(D, D), "to_k": lin(D, D), "to_v": lin(D, D),
                "add_q_proj": lin(D, D), "add_k_proj": lin(D, D),
                "add_v_proj": lin(D, D),
                "norm_q": {"weight": jnp.ones((hd,), dtype)},
                "norm_k": {"weight": jnp.ones((hd,), dtype)},
                "norm_added_q": {"weight": jnp.ones((hd,), dtype)},
                "norm_added_k": {"weight": jnp.ones((hd,), dtype)},
                "to_out": lin(D, D), "to_add_out": lin(D, D),
            },
            "img_mlp": {"linear_in": lin(mh, D), "linear_out": lin(D, mh)},
            "txt_mlp": {"linear_in": lin(mh, D), "linear_out": lin(D, mh)},
        }

    blocks = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                    *[block() for _ in range(cfg.depth)])
    return {
        "img_in": lin(D, cfg.in_channels),
        "txt_norm": {"weight": jnp.ones((cfg.context_in_dim,), dtype)},
        "txt_in": lin(D, cfg.context_in_dim),
        "time_text_embed": {"timestep_embedder": {
            "linear_1": lin(D, 256), "linear_2": lin(D, D)}},
        "transformer_blocks": blocks,
        "norm_out": {"linear": lin(2 * D, D)},
        "proj_out": lin(cfg.out_channels, D),
    }


# -------------------------------------------------------------- pipeline
class MageFlowPipeline:
    """reference pipeline.py MageFlowPipeline (generate_array / edit_array).

    Text conditioning comes from a Qwen3 text stack when `text_params` is
    present (for text-only prompts Qwen3-VL M-RoPE with equal t/h/w
    positions reduces EXACTLY to standard RoPE, so the plain stack matches
    the reference's VL encoder); callers may instead pass precomputed
    `text_embeds` (e.g. from a full qwen3_vl model for edit prompts with
    reference images)."""

    def __init__(self, dit_params, dit_config: MageFlowConfig,
                 vae_params, vae_config: Optional[MageVAEConfig] = None,
                 text_params=None, text_config=None, tokenizer=None,
                 variant: Optional[MageFlowVariant] = None):
        self.dit_params = dit_params
        self.config = dit_config
        self.vae_params = vae_params
        self.vae_config = vae_config or MageVAEConfig()
        self.text_params = text_params
        self.text_config = text_config
        self.tokenizer = tokenizer
        self.variant = variant or VARIANTS["mage-flow"]
        cfg = dit_config

        @functools.partial(jax.jit, static_argnames=("n_target", "renorm"))
        def _step(params, target, ref, pos, neg, sigma, dt, guidance,
                  cos, sin, n_target, renorm):
            latents = jnp.concatenate([target, ref], axis=1)
            t = jnp.full((latents.shape[0],), sigma, latents.dtype)
            c = mage_transformer_forward(params, cfg, latents, pos, t,
                                         cos, sin)
            if neg is not None:
                u = mage_transformer_forward(params, cfg, latents, neg, t,
                                             cos, sin)
                v = u + guidance * (c - u)
                if renorm:
                    cn = jnp.linalg.norm(c.astype(jnp.float32), axis=-1,
                                         keepdims=True)
                    vn = jnp.linalg.norm(v.astype(jnp.float32), axis=-1,
                                         keepdims=True)
                    v = (v * (cn / (vn + 1e-6))).astype(v.dtype)
            else:
                v = c
            return target + dt * v[:, :n_target].astype(target.dtype)

        self._step = _step
        self._decode = jax.jit(
            lambda vp, z: mage_vae_decode(vp, self.vae_config, z))

    # -------------------------------------------------------- factories
    @classmethod
    def from_pretrained(cls, model_path, dtype=jnp.bfloat16,
                        include_encoder: bool = True, **_):
        root = Path(model_path).expanduser()
        dit_params, dit_cfg = load_mage_transformer(root, dtype)
        vae_params, vae_cfg = load_mage_vae(root, dtype,
                                            include_encoder=include_encoder)
        text_params = text_cfg = tokenizer = None
        te = root / "text_encoder"
        if te.exists():
            from ...imagegen.params import load_text_encoder_params
            from ...imagegen.params import get_variant as _flux_variant

            text_params, text_cfg = load_text_encoder_params(
                root, _flux_variant("flux2-klein-4b"), dtype)
            try:
                from transformers import AutoTokenizer

                tokenizer = AutoTokenizer.from_pretrained(
                    str(te), local_files_only=True)
            except Exception:
                tokenizer = None
        return cls(dit_params, dit_cfg, vae_params, vae_cfg,
                   text_params, text_cfg, tokenizer,
                   variant=get_variant(str(root.name)))

    # ------------------------------------------------------------- text
    def encode_prompt(self, prompt: str, *, edit: bool = False) -> jax.Array:
        if self.text_params is None or self.tokenizer is None:
            raise ValueError(
                "no text encoder loaded; pass text_embeds= instead")
        from ...imagegen.text_encoder import encode_text

        template = EDIT_TEMPLATE if edit else GENERATION_TEMPLATE
        trim = EDIT_PREFIX_TOKENS if edit else GENERATION_PREFIX_TOKENS
        ids = self.tokenizer(template.format(prompt), truncation=True,
                             max_length=2048 + trim,
                             return_tensors="np")["input_ids"]
        ids = jnp.asarray(ids, jnp.int32)
        nL = int(self.text_config.num_hidden_layers)
        hidden = encode_text(self.text_params, self.text_config, ids,
                             jnp.ones_like(ids),
                             hidden_state_layers=(nL,))
        hidden = rms_norm(self.text_params["norm"], hidden,
                          self.text_config.rms_norm_eps)
        if hidden.shape[1] <= trim:
            raise ValueError("prompt was empty after template trimming")
        return hidden[:, trim:]

    # -------------------------------------------------------- generation
    def generate_array(self, prompt: Optional[str] = None, *, seed: int = 42,
                       steps: Optional[int] = None, width: int = 1024,
                       height: int = 1024, guidance: Optional[float] = None,
                       negative_prompt: str = " ", static_shift: float = 6.0,
                       renormalization: bool = False,
                       text_embeds=None, negative_embeds=None) -> np.ndarray:
        validate_dimensions(width=width, height=height)
        steps = int(steps or self.variant.default_steps)
        guidance = float(self.variant.default_guidance
                         if guidance is None else guidance)
        if text_embeds is None:
            text_embeds = self.encode_prompt(prompt)
        pos = jnp.asarray(text_embeds)
        neg = None
        if guidance > 1.0:
            if negative_embeds is not None:
                neg = jnp.asarray(negative_embeds)
            elif negative_prompt:
                neg = self.encode_prompt(negative_prompt)
        gh, gw = height // 16, width // 16
        dtype = self.dit_params["img_in"]["weight"].dtype
        latents = jax.random.normal(
            jax.random.PRNGKey(seed),
            (1, gh * gw, self.config.in_channels), dtype)
        cos_np, sin_np = image_rope([(1, gh, gw)], self.config.axes_dim,
                                    self.config.theta)
        cos = jnp.asarray(cos_np, jnp.float32)
        sin = jnp.asarray(sin_np, jnp.float32)
        ref = jnp.zeros((1, 0, self.config.in_channels), dtype)
        sig = flow_match_sigmas(steps, static_shift)
        for i in range(steps):
            latents = self._step(
                self.dit_params, latents, ref, pos, neg,
                jnp.float32(sig[i]), jnp.float32(sig[i + 1] - sig[i]),
                jnp.float32(guidance), cos, sin,
                n_target=gh * gw, renorm=renormalization)
        return self._finish(latents, gh, gw)

    def edit_array(self, prompt: Optional[str] = None,
                   images: Sequence[np.ndarray] = (), *, seed: int = 42,
                   steps: Optional[int] = None, width: int = 1024,
                   height: int = 1024, guidance: Optional[float] = None,
                   static_shift: float = 6.0, renormalization: bool = False,
                   sample_posterior: bool = True, ref_latents=None,
                   text_embeds=None, negative_embeds=None) -> np.ndarray:
        """images: [H, W, 3] float arrays in [-1, 1], pre-resized to
        (height, width) — reference edit_array reference-latent path.
        `ref_latents` [n, rh, rw, C] bypasses the VAE encoder."""
        validate_dimensions(width=width, height=height)
        if ref_latents is None and not len(images):
            raise ValueError("at least one reference image is required")
        steps = int(steps or self.variant.default_steps)
        guidance = float(self.variant.default_guidance
                         if guidance is None else guidance)
        if text_embeds is None:
            text_embeds = self.encode_prompt(prompt, edit=True)
        pos = jnp.asarray(text_embeds)
        neg = jnp.asarray(negative_embeds) if (
            guidance > 1.0 and negative_embeds is not None) else None
        dtype = self.dit_params["img_in"]["weight"].dtype
        gh, gw = height // 16, width // 16
        key = jax.random.PRNGKey(seed)
        if ref_latents is None:
            refs = jnp.stack([jnp.asarray(im, dtype) for im in images])
            ref_latents = mage_vae_encode(
                self.vae_params, self.vae_config, refs,
                sample_key=key if sample_posterior else None)
        ref_latents = jnp.asarray(ref_latents)
        n, rh, rw = ref_latents.shape[:3]
        ref_tokens = ref_latents.reshape(1, n * rh * rw, -1).astype(dtype)
        target = jax.random.normal(key, (1, gh * gw, self.config.in_channels),
                                   dtype)
        cos_np, sin_np = image_rope([(1, gh, gw)] + [(1, rh, rw)] * n,
                                    self.config.axes_dim, self.config.theta)
        cos = jnp.asarray(cos_np, jnp.float32)
        sin = jnp.asarray(sin_np, jnp.float32)
        sig = flow_match_sigmas(steps, static_shift)
        for i in range(steps):
            target = self._step(
                self.dit_params, target, ref_tokens, pos, neg,
                jnp.float32(sig[i]), jnp.float32(sig[i + 1] - sig[i]),
                jnp.float32(guidance), cos, sin,
                n_target=gh * gw, renorm=renormalization)
        return self._finish(target, gh, gw)

    def _finish(self, latents, gh: int, gw: int) -> np.ndarray:
        z = latents.reshape(1, gh, gw, -1)
        decoded = self._decode(self.vae_params, z)
        img = np.clip(np.asarray(decoded[0], np.float32), -1.0, 1.0)
        return np.round(127.5 * (img + 1.0)).astype(np.uint8)
