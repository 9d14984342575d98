"""Parameter initialization and checkpoint loading for the Flux2 stack.

Role parity: reference mlx_vlm/models/flux2/weights.py (load_transformer /
load_vae / load_text_encoder from a model dir with transformer/, vae/,
text_encoder/, tokenizer/ subdirectories) and config.py variants
(flux2-klein-4b / 9b / base / 9b-kv).

TPU design: per-layer transformer weights are stacked into [L, ...] leaves
for the lax.scan bodies (utils/loader.py:_stack_layers); VAE conv weights
are converted from torch OIHW to HWIO once at load so the NHWC compute path
never transposes.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.loader import _nest, _read_safetensors, _stack_layers
from .dit import DiTConfig
from .text_encoder import TextEncoderConfig
from .vae import VAEConfig

__all__ = [
    "Flux2Variant", "get_variant", "list_variants",
    "load_transformer_params", "load_vae_params", "load_text_encoder_params",
    "init_dit_params", "init_vae_params", "init_text_encoder_params",
]


@dataclasses.dataclass(frozen=True)
class Flux2Variant:
    """Reference config.py:Flux2Variant — named transformer/text-encoder
    size presets."""
    name: str
    transformer: dict
    text_encoder: dict
    supports_edit: bool = False


_KLEIN_4B_T = dict(num_layers=5, num_single_layers=20, num_attention_heads=24,
                   joint_attention_dim=7680)
_KLEIN_9B_T = dict(num_layers=8, num_single_layers=24, num_attention_heads=32,
                   joint_attention_dim=12288)
_KLEIN_4B_E = dict(hidden_size=2560, intermediate_size=9728)
_KLEIN_9B_E = dict(hidden_size=4096, intermediate_size=12288)

VARIANTS = {
    "flux2-klein-4b": Flux2Variant("flux2-klein-4b", _KLEIN_4B_T, _KLEIN_4B_E),
    "flux2-klein-9b": Flux2Variant("flux2-klein-9b", _KLEIN_9B_T, _KLEIN_9B_E,
                                   supports_edit=True),
    "flux2-klein-base-4b": Flux2Variant("flux2-klein-base-4b", _KLEIN_4B_T,
                                        _KLEIN_4B_E),
    "flux2-klein-base-9b": Flux2Variant("flux2-klein-base-9b", _KLEIN_9B_T,
                                        _KLEIN_9B_E),
}

_ALIASES = {
    "flux2-klein": "flux2-klein-4b", "klein-4b": "flux2-klein-4b",
    "klein-9b": "flux2-klein-9b",
    "black-forest-labs/flux.2-klein-4b": "flux2-klein-4b",
    "black-forest-labs/flux.2-klein-9b": "flux2-klein-9b",
    "flux2-base-4b": "flux2-klein-base-4b",
    "flux2-base-9b": "flux2-klein-base-9b",
}


def get_variant(name) -> Flux2Variant:
    if isinstance(name, Flux2Variant):
        return name
    key = str(name).strip().lower().rstrip("/")
    key = _ALIASES.get(key, key)
    if key not in VARIANTS:
        raise ValueError(
            f"Unknown Flux2 variant {name!r}. Supported: {sorted(VARIANTS)}")
    return VARIANTS[key]


def list_variants() -> Tuple[str, ...]:
    return tuple(VARIANTS)


def infer_variant(model_path) -> Flux2Variant:
    """Reference config.py:variant_from_local_path — sniff 4B/9B from the
    path name or the shipped config.json files."""
    root = Path(model_path).expanduser()
    name = str(root).lower()
    for tag, var in (("base-9b", "flux2-klein-base-9b"),
                     ("base-4b", "flux2-klein-base-4b"),
                     ("9b", "flux2-klein-9b"), ("4b", "flux2-klein-4b")):
        if tag in name:
            return VARIANTS[var]
    tcfg = root / "transformer" / "config.json"
    if tcfg.exists():
        cfg = json.loads(tcfg.read_text())
        if cfg.get("num_layers") == 8 or cfg.get("num_attention_heads") == 32:
            return VARIANTS["flux2-klein-9b"]
        return VARIANTS["flux2-klein-4b"]
    ecfg = root / "text_encoder" / "config.json"
    if ecfg.exists():
        cfg = json.loads(ecfg.read_text())
        return VARIANTS["flux2-klein-9b" if cfg.get("hidden_size") == 4096
                        else "flux2-klein-4b"]
    raise ValueError(f"Could not infer Flux2 variant from {root}")


# ------------------------------------------------------------------ loading
def _to_device(flat: dict, dtype) -> dict:
    return {k: jnp.asarray(np.asarray(v), dtype=dtype)
            if np.asarray(v).dtype.kind == "f" or str(np.asarray(v).dtype) == "bfloat16"
            else jnp.asarray(np.asarray(v))
            for k, v in flat.items()}


def load_transformer_params(model_path, variant: Flux2Variant,
                            dtype=jnp.bfloat16) -> Tuple[dict, DiTConfig]:
    """transformer/*.safetensors -> stacked-scan param tree + DiTConfig
    (reference weights.py:load_transformer key remaps)."""
    root = Path(model_path).expanduser() / "transformer"
    raw = _read_safetensors(root)
    flat = {}
    for k, v in raw.items():
        k = k.replace("time_guidance_embed.timestep_embedder.",
                      "time_guidance_embed.")
        k = k.replace(".to_out.0.", ".to_out.")
        flat[k] = v
    flat = _stack_layers(flat, ("transformer_blocks",
                                "single_transformer_blocks"))
    cfg = dict(variant.transformer)
    cfgfile = root / "config.json"
    if cfgfile.exists():
        file_cfg = json.loads(cfgfile.read_text())
        for key in ("num_layers", "num_single_layers", "num_attention_heads",
                    "attention_head_dim", "joint_attention_dim", "in_channels",
                    "mlp_ratio", "rope_theta", "guidance_embeds"):
            if key in file_cfg:
                cfg[key] = file_cfg[key]
        if "axes_dims_rope" in file_cfg:
            cfg["axes_dims_rope"] = tuple(file_cfg["axes_dims_rope"])
    if any(k.startswith("time_guidance_embed.guidance_linear_1") for k in flat):
        cfg["guidance_embeds"] = True
    return _nest(_to_device(flat, dtype)), DiTConfig.from_dict(cfg)


def load_vae_params(model_path, *, include_encoder: bool = False,
                    dtype=jnp.bfloat16) -> Tuple[dict, VAEConfig]:
    """vae/*.safetensors -> NHWC param tree (reference weights.py:load_vae;
    torch OIHW conv weights become HWIO here, not MLX's OHWI)."""
    raw = _read_safetensors(Path(model_path).expanduser() / "vae")
    flat = {}
    for k, v in raw.items():
        if k.endswith(".num_batches_tracked"):
            continue
        keep = (k.startswith(("decoder.", "post_quant_conv.", "bn."))
                or (include_encoder and k.startswith(("encoder.",
                                                      "quant_conv."))))
        if not keep:
            continue
        k = k.replace(".to_out.0.", ".to_out.")
        v = np.asarray(v)
        if v.ndim == 4:  # OIHW -> HWIO
            v = v.transpose(2, 3, 1, 0)
        flat[k] = v
    params = _nest(_to_device(flat, dtype))
    # bn stats stay fp32 for exact denorm
    for stat in ("running_mean", "running_var"):
        params["bn"][stat] = params["bn"][stat].astype(jnp.float32)
    return params, VAEConfig()


def load_text_encoder_params(model_path, variant: Flux2Variant,
                             dtype=jnp.bfloat16
                             ) -> Tuple[dict, TextEncoderConfig]:
    """text_encoder/*.safetensors -> scan-stacked Qwen3 params
    (reference weights.py:load_text_encoder strips the 'model.' prefix)."""
    root = Path(model_path).expanduser() / "text_encoder"
    raw = _read_safetensors(root)
    flat = {}
    for k, v in raw.items():
        if not k.startswith("model."):
            continue
        k = k[len("model."):]
        if k.startswith(("embed_tokens.", "layers.", "norm.")):
            flat[k] = v
    flat = _stack_layers(flat, ("layers",))
    cfg = dict(variant.text_encoder)
    cfgfile = root / "config.json"
    if cfgfile.exists():
        file_cfg = json.loads(cfgfile.read_text())
        for key in ("vocab_size", "hidden_size", "num_hidden_layers",
                    "num_attention_heads", "num_key_value_heads",
                    "intermediate_size", "head_dim", "rope_theta",
                    "rms_norm_eps"):
            if key in file_cfg:
                cfg[key] = file_cfg[key]
    params = _nest(_to_device(flat, dtype))
    n_layers = int(params["layers"]["input_layernorm"]["weight"].shape[0])
    cfg["num_hidden_layers"] = n_layers
    return params, TextEncoderConfig.from_dict(cfg)


# ----------------------------------------------------------- random init
def _rand(key, *shape, scale=0.02, dtype=jnp.float32):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def init_dit_params(cfg: DiTConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    """Random DiT params with the exact checkpoint tree shape — used by
    tests and tiny-model benches."""
    D, C = cfg.inner_dim, cfg.timestep_guidance_channels
    mh = cfg.mlp_hidden
    ks = iter(jax.random.split(key, 64))

    def lin(out_d, in_d):
        return {"weight": _rand(next(ks), out_d, in_d, dtype=dtype)}

    def stack(n, fn):
        trees = [fn() for _ in range(n)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)

    def double_block():
        return {
            "attn": {
                "to_q": lin(D, D), "to_k": lin(D, D), "to_v": lin(D, D),
                "to_out": lin(D, D),
                "add_q_proj": lin(D, D), "add_k_proj": lin(D, D),
                "add_v_proj": lin(D, D), "to_add_out": lin(D, D),
                "norm_q": {"weight": jnp.ones(cfg.attention_head_dim, dtype)},
                "norm_k": {"weight": jnp.ones(cfg.attention_head_dim, dtype)},
                "norm_added_q": {"weight": jnp.ones(cfg.attention_head_dim, dtype)},
                "norm_added_k": {"weight": jnp.ones(cfg.attention_head_dim, dtype)},
            },
            "ff": {"linear_in": lin(2 * mh, D), "linear_out": lin(D, mh)},
            "ff_context": {"linear_in": lin(2 * mh, D),
                           "linear_out": lin(D, mh)},
        }

    def single_block():
        return {
            "attn": {
                "to_qkv_mlp_proj": lin(3 * D + 2 * mh, D),
                "to_out": lin(D, D + mh),
                "norm_q": {"weight": jnp.ones(cfg.attention_head_dim, dtype)},
                "norm_k": {"weight": jnp.ones(cfg.attention_head_dim, dtype)},
            },
        }

    params = {
        "time_guidance_embed": {"linear_1": lin(D, C), "linear_2": lin(D, D)},
        "x_embedder": lin(D, cfg.in_channels),
        "context_embedder": lin(D, cfg.joint_attention_dim),
        "double_stream_modulation_img": {"linear": lin(6 * D, D)},
        "double_stream_modulation_txt": {"linear": lin(6 * D, D)},
        "single_stream_modulation": {"linear": lin(3 * D, D)},
        "transformer_blocks": stack(cfg.num_layers, double_block),
        "single_transformer_blocks": stack(cfg.num_single_layers,
                                           single_block),
        "norm_out": {"linear": lin(2 * D, D)},
        "proj_out": lin(cfg.patch_size ** 2 * cfg.in_channels, D),
    }
    if cfg.guidance_embeds:
        params["time_guidance_embed"]["guidance_linear_1"] = lin(D, C)
        params["time_guidance_embed"]["guidance_linear_2"] = lin(D, D)
    return params


def init_vae_params(cfg: VAEConfig, key: jax.Array, *,
                    include_encoder: bool = False,
                    dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 256))
    C = cfg.latent_channels

    def conv(out_c, in_c, k=3):
        return {"weight": _rand(next(ks), k, k, in_c, out_c, dtype=dtype),
                "bias": jnp.zeros(out_c, dtype)}

    def norm(c):
        return {"weight": jnp.ones(c, dtype), "bias": jnp.zeros(c, dtype)}

    def lin(out_d, in_d):
        return {"weight": _rand(next(ks), out_d, in_d, dtype=dtype),
                "bias": jnp.zeros(out_d, dtype)}

    def resnet(in_c, out_c):
        p = {"norm1": norm(in_c), "conv1": conv(out_c, in_c),
             "norm2": norm(out_c), "conv2": conv(out_c, out_c)}
        if in_c != out_c:
            p["conv_shortcut"] = conv(out_c, in_c, k=1)
        return p

    def mid(c):
        p = {"resnets": {"0": resnet(c, c), "1": resnet(c, c)}}
        if cfg.mid_block_add_attention:
            p["attentions"] = {"0": {
                "group_norm": norm(c), "to_q": lin(c, c), "to_k": lin(c, c),
                "to_v": lin(c, c), "to_out": lin(c, c)}}
        return p

    ch = cfg.block_out_channels
    rev = list(reversed(ch))
    decoder = {"conv_in": conv(ch[-1], C), "mid_block": mid(ch[-1]),
               "up_blocks": {}, "conv_norm_out": norm(ch[0]),
               "conv_out": conv(3, ch[0])}
    for i, out_c in enumerate(rev):
        in_c = out_c if i == 0 else rev[i - 1]
        blk = {"resnets": {}}
        for j in range(cfg.layers_per_block + 1):
            blk["resnets"][str(j)] = resnet(in_c if j == 0 else out_c, out_c)
        if i != len(rev) - 1:
            blk["upsamplers"] = {"0": {"conv": conv(out_c, out_c)}}
        decoder["up_blocks"][str(i)] = blk

    params = {
        "decoder": decoder,
        "post_quant_conv": conv(C, C, k=1),
        "bn": {"running_mean": jnp.zeros(4 * C, jnp.float32),
               "running_var": jnp.ones(4 * C, jnp.float32)},
    }
    if include_encoder:
        encoder = {"conv_in": conv(ch[0], 3), "mid_block": mid(ch[-1]),
                   "down_blocks": {}, "conv_norm_out": norm(ch[-1]),
                   "conv_out": conv(2 * C, ch[-1])}
        for i, out_c in enumerate(ch):
            in_c = ch[i - 1] if i > 0 else ch[0]
            blk = {"resnets": {}}
            for j in range(cfg.layers_per_block):
                blk["resnets"][str(j)] = resnet(in_c if j == 0 else out_c,
                                                out_c)
            if i != len(ch) - 1:
                blk["downsamplers"] = {"0": {"conv": conv(out_c, out_c)}}
            encoder["down_blocks"][str(i)] = blk
        params["encoder"] = encoder
        params["quant_conv"] = conv(2 * C, 2 * C, k=1)
    return params


def init_text_encoder_params(cfg: TextEncoderConfig, key: jax.Array,
                             dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 16))
    D, hd = cfg.hidden_size, cfg.head_dim
    nh, nkv, I = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.intermediate_size)
    L = cfg.num_hidden_layers

    def lin(out_d, in_d):
        return {"weight": _rand(next(ks), L, out_d, in_d, dtype=dtype)}

    layers = {
        "self_attn": {
            "q_proj": lin(nh * hd, D), "k_proj": lin(nkv * hd, D),
            "v_proj": lin(nkv * hd, D), "o_proj": lin(D, nh * hd),
            "q_norm": {"weight": jnp.ones((L, hd), dtype)},
            "k_norm": {"weight": jnp.ones((L, hd), dtype)},
        },
        "mlp": {"gate_proj": lin(I, D), "up_proj": lin(I, D),
                "down_proj": lin(D, I)},
        "input_layernorm": {"weight": jnp.ones((L, D), dtype)},
        "post_attention_layernorm": {"weight": jnp.ones((L, D), dtype)},
    }
    return {
        "embed_tokens": {"weight": _rand(next(ks), cfg.vocab_size, D,
                                         dtype=dtype)},
        "layers": layers,
        "norm": {"weight": jnp.ones(D, dtype)},
    }
