"""DeepSeek-VL v1 ("multi_modality"): timm-SigLIP tower + llama decoder.

Role parity: reference mlx_vlm/models/multi_modality/ — timm-style
SigLIP (conv patchify, learned pos, biased-qkv pre-LN blocks with
fast-gelu MLP, final LayerNorm, vision.py:241), mlp_gelu aligner
(multi_modality.py:127), llama text decoder, image tokens spliced at
image_token_index, and the 7B HybridVisionTower (vision.py:381): a SAM
ViT-B high-res branch (sam.py:87 — windowed attention with decomposed
relative positions, global blocks at 2/5/8/11, conv neck, 96x96 resize,
strided downsamples, hd-alpha-mixed neck_hd skip) beside the SigLIP
low-res branch, fused by the low_high_hybrid_split_mlp_gelu aligner
(multi_modality.py:151).

TPU notes: the SAM branch's 384->96 resize runs on-device
(jax.image.resize bilinear) so the whole hybrid embed is one jit program;
SAM blocks keep per-index params (window and global blocks carry
different rel-pos table shapes, so they cannot weight-stack) while the
SigLIP branches scan as usual.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import layer_norm, linear
from ...ops.attention import sdpa
from ..llama.config import TextConfig as _LlamaText
from ..llama.language import LanguageModel
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features


@dataclass
class TextConfig(_LlamaText):
    model_type: str = "llama"


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "vision"
    cls: Optional[str] = None
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 384
    patch_size: int = 16
    num_channels: int = 3
    layer_norm_eps: float = 1e-6
    params: dict = field(default_factory=dict)

    def __post_init__(self):
        p = self.params or {}
        for k in ("image_size", "patch_size"):
            if k in p:
                setattr(self, k, p[k])
        if "width" in p:
            self.hidden_size = p["width"]
        if "layers" in p:
            self.num_hidden_layers = p["layers"]


@dataclass
class ProjectorConfig(BaseModelConfig):
    model_type: str = "aligner"
    cls: str = "MlpProjector"
    params: dict = field(default_factory=dict)


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    projector_config: ProjectorConfig
    model_type: str = "multi_modality"
    image_token_index: int = 100015
    num_image_tokens: int = 576
    select_layer: int = -1
    vision_feature_select_strategy: str = "default"
    eos_token_id: Optional[Union[int, List[int]]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("language_config", params.get("text_config", {}))
            or {})
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {})
        params["projector_config"] = ProjectorConfig.from_dict(
            params.get("aligner_config",
                       params.get("projector_config", {})) or {})
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


# ------------------------------------------------------- SAM high branch
def _sam_rel_pos(rel_pos: jax.Array, n: int) -> jax.Array:
    """[2n-1, hd] table -> [n, n, hd] decomposed offsets (reference
    sam.get_rel_pos with q_size == k_size — no interpolation needed)."""
    coords = np.arange(n)[:, None] - np.arange(n)[None, :] + n - 1
    return rel_pos[jnp.asarray(coords)]


def _sam_attention(p: dict, x: jax.Array, num_heads: int) -> jax.Array:
    """[B, H, W, C] windowed/global attention with decomposed rel pos
    (reference sam.Attention + add_decomposed_rel_pos)."""
    B, H, W, C = x.shape
    hd = C // num_heads
    qkv = linear(p["qkv"], x.reshape(B, H * W, C))
    qkv = qkv.reshape(B, H * W, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = (qkv[i].reshape(B * num_heads, H * W, hd) for i in range(3))
    attn = jnp.einsum("bqc,bkc->bqk", (q * hd ** -0.5).astype(jnp.float32),
                      k.astype(jnp.float32))
    rq = q.reshape(-1, H, W, hd).astype(jnp.float32)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", rq,
                       _sam_rel_pos(p["rel_pos_h"], H).astype(jnp.float32))
    rel_w = jnp.einsum("bhwc,wkc->bhwk", rq,
                       _sam_rel_pos(p["rel_pos_w"], W).astype(jnp.float32))
    attn = (attn.reshape(-1, H, W, H, W) + rel_h[..., None]
            + rel_w[..., None, :]).reshape(-1, H * W, H * W)
    o = jnp.einsum("bqk,bkc->bqc", jax.nn.softmax(attn, axis=-1),
                   v.astype(jnp.float32)).astype(x.dtype)
    o = o.reshape(B, num_heads, H, W, hd).transpose(0, 2, 3, 1, 4)
    return linear(p["proj"], o.reshape(B, H, W, C))


def _window_partition(x: jax.Array, ws: int):
    B, H, W, C = x.shape
    ph = (ws - H % ws) % ws
    pw = (ws - W % ws) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    return (x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C), (Hp, Wp))


def _window_unpartition(win: jax.Array, ws: int, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = win.shape[0] // (Hp * Wp // ws // ws)
    x = win.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def _conv(p, x, stride=1, padding="SAME"):
    out = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        out = out + p["bias"].astype(out.dtype)
    return out


class SAMEncoder:
    """SAM ViT-B image encoder (reference sam.SAMEncoder): 1024px -> 64x64
    patches -> 12 blocks (window 14 except global 2/5/8/11) -> conv neck ->
    96x96 resize -> two stride-2 downsamples -> [B, 24, 24, 1024], with the
    hd-alpha neck_hd skip from the first global block."""

    def __init__(self, embed_dim=768, depth=12, num_heads=12,
                 window_size=14, global_attn_indexes=(2, 5, 8, 11),
                 neck_size=(96, 96)):
        self.embed_dim = embed_dim
        self.depth = depth
        self.num_heads = num_heads
        self.window_size = window_size
        self.global_idx = tuple(global_attn_indexes)
        self.neck_size = neck_size

    def _neck(self, p: dict, x: jax.Array) -> jax.Array:
        x = layer_norm(p["1"], _conv(p["0"], x), 1e-5)
        return layer_norm(p["3"], _conv(p["2"], x), 1e-5)

    def __call__(self, params: dict, x: jax.Array) -> jax.Array:
        x = _conv(params["patch_embed"]["proj"], x,
                  stride=16, padding="VALID")
        x = x + params["pos_embed"].astype(x.dtype)
        first_global = None
        for i in range(self.depth):
            lp = params["blocks"][str(i)]
            shortcut = x
            h = layer_norm(lp["norm1"], x, 1e-5)
            if i not in self.global_idx:
                H, W = h.shape[1:3]
                h, pad_hw = _window_partition(h, self.window_size)
                h = _sam_attention(lp["attn"], h, self.num_heads)
                h = _window_unpartition(h, self.window_size, pad_hw, (H, W))
            else:
                h = _sam_attention(lp["attn"], h, self.num_heads)
            x = shortcut + h
            m = lp["mlp"]
            y = layer_norm(lp["norm2"], x, 1e-5)
            x = x + linear(m["lin2"],
                           jax.nn.gelu(linear(m["lin1"], y),
                                       approximate=False))
            if first_global is None and i in self.global_idx:
                first_global = x

        def branch(neck_params, feat):
            f = self._neck(neck_params, feat)
            f = jax.image.resize(
                f, f.shape[:1] + self.neck_size + f.shape[-1:],
                method="bilinear").astype(f.dtype)
            f = _conv(params["downsamples"]["0"], f, stride=2)
            return _conv(params["downsamples"]["1"], f, stride=2)

        out = branch(params["neck"], x)
        hd = branch(params["neck_hd"], first_global)
        alpha = params["hd_alpha_downsamples"].astype(out.dtype)
        return out + hd * alpha


class SigLipTower:
    def __init__(self, config: VisionConfig):
        self.config = config
        self.n_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5

    def __call__(self, params, pixel_values):
        cfg = self.config
        P = cfg.patch_size
        w = params["patch_embed"]["proj"]["weight"]  # HWIO (sanitized)
        x = jax.lax.conv_general_dilated(
            pixel_values, w.astype(pixel_values.dtype), (P, P), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(pixel_values.dtype)
        x = x + params["patch_embed"]["proj"]["bias"].astype(x.dtype)
        B = x.shape[0]
        x = x.reshape(B, -1, cfg.hidden_size)
        x = x + params["pos_embed"].astype(x.dtype)

        def block(h, lp):
            y = layer_norm(lp["norm1"], h, cfg.layer_norm_eps)
            B_, L, _ = y.shape
            qkv = linear(lp["attn"]["qkv"], y).reshape(
                B_, L, 3, self.n_heads, self.head_dim)
            q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3)
                       for i in range(3))
            o = sdpa(q, k, v, self.scale, None)
            o = o.transpose(0, 2, 1, 3).reshape(B_, L, -1)
            h = h + linear(lp["attn"]["proj"], o)
            y = layer_norm(lp["norm2"], h, cfg.layer_norm_eps)
            # timm fast-gelu MLP (reference FastGELUActivation:165)
            z = linear(lp["mlp"]["fc1"], y)
            z = 0.5 * z * (1.0 + jnp.tanh(
                z * 0.7978845608 * (1.0 + 0.044715 * z * z)))
            h = h + linear(lp["mlp"]["fc2"], z)
            return h, None

        x, _ = jax.lax.scan(block, x, params["blocks"])
        return layer_norm(params["norm"], x, 1e-5)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        vc = config.vision_config
        self.hybrid = vc.cls == "HybridVisionTower"
        if self.hybrid:
            p = dict(vc.params or {})
            low = dict(p.get("low_res_cfg", {}))
            high = dict(p.get("high_res_cfg", {}))
            low_cfg = VisionConfig.from_dict(
                {**{k: v for k, v in vc.__dict__.items()
                    if k not in ("params", "cls")},
                 "params": {**{k: v for k, v in p.items()
                               if not isinstance(v, dict)}, **low}})
            self.low_tower = SigLipTower(low_cfg)
            self.low_image_size = int(low.get("image_size", 384))
            # SAM ViT-B defaults; the extra keys only exist in tiny test
            # configs (real checkpoints carry image_size/output_dim only)
            self.high_tower = SAMEncoder(
                embed_dim=int(high.get("embed_dim", 768)),
                depth=int(high.get("depth", 12)),
                num_heads=int(high.get("num_heads", 12)),
                window_size=int(high.get("window_size", 14)),
                global_attn_indexes=tuple(
                    high.get("global_attn_indexes", (2, 5, 8, 11))),
                neck_size=tuple(high.get("neck_size", (96, 96))),
            )
            self.high_output_dim = int(high.get("output_dim", 1024))
        else:
            self.vision_model = SigLipTower(vc)
        self.language_model = LanguageModel(config.text_config, config)
        self.proj_depth = int(
            (config.projector_config.params or {}).get("depth", 2))

    def _project(self, params, x):
        al = params["aligner"]["layers"]
        x = linear(al["0"], x)
        for d in range(1, self.proj_depth):
            x = linear(al[str(2 * d)],
                       jax.nn.gelu(x, approximate=False))
        return x

    def _project_hybrid(self, params, high, low):
        """low_high_hybrid_split_mlp_gelu aligner (reference
        multi_modality.py:151): halves concat along features."""
        al = params["aligner"]
        B = high.shape[0]
        hx = linear(al["high_up_proj"], high).reshape(
            B, -1, self.config.text_config.hidden_size // 2)
        lx = linear(al["low_up_proj"], low)
        x = jnp.concatenate([hx, lx], axis=-1)
        # layers = [GELU, Linear] * (depth-1) -> weights at odd indices
        for d in range(1, self.proj_depth):
            x = linear(al["layers"][str(2 * d - 1)],
                       jax.nn.gelu(x, approximate=False))
        return x

    def vision_features(self, params, pixel_values):
        if self.hybrid:
            vm = params["vision_model"]
            high = self.high_tower(vm["high"], pixel_values)
            s = self.low_image_size
            low_img = jax.image.resize(
                pixel_values,
                pixel_values.shape[:1] + (s, s) + pixel_values.shape[-1:],
                method="bilinear").astype(pixel_values.dtype)
            low = self.low_tower(vm["low"], low_img)
            feats = self._project_hybrid(params, high, low)
        else:
            feats = self._project(
                params,
                self.vision_model(params["vision_model"], pixel_values))
        return feats.reshape(-1, self.config.text_config.hidden_size)

    def get_input_embeddings(self, params, input_ids, pixel_values=None,
                             image_features=None, **aux):
        embeds = self.language_model.embed(params["language_model"],
                                           input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        if image_features is None:
            px = pixel_values
            if px.ndim == 4 and px.shape[1] in (1, 3):
                px = px.transpose(0, 2, 3, 1)
            image_features = self.vision_features(params, px)
        return merge_input_ids_with_image_features(
            self.config.image_token_index, -1, image_features, embeds,
            input_ids)

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
        out = {}
        for k, v in weights.items():
            if ("attn_pool" in k or "position_ids" in k
                    or ".high_layer_norm." in k or ".low_layer_norm." in k):
                continue  # pooling head / dead hybrid norms unused
            if k.startswith("vision_model.vision_tower_high.vision_tower."):
                k = ("vision_model.high."
                     + k[len("vision_model.vision_tower_high."
                             "vision_tower."):])
            elif k.startswith("vision_model.vision_tower_low.vision_tower."):
                k = ("vision_model.low."
                     + k[len("vision_model.vision_tower_low."
                             "vision_tower."):])
            elif k.startswith("vision_model.vision_tower."):
                k = "vision_model." + k[len("vision_model.vision_tower."):]
            if (k.endswith("pos_embed") and "vision_model" in k
                    and "high" not in k and getattr(v, "ndim", 0) == 3):
                v = np.asarray(v)[0][None]
            tail = ".".join(k.split(".")[-3:])
            if getattr(v, "ndim", 0) == 4 and (
                    k.endswith("patch_embed.proj.weight")
                    or tail in ("neck.0.weight", "neck.2.weight",
                                "neck_hd.0.weight", "neck_hd.2.weight",
                                "downsamples.0.weight",
                                "downsamples.1.weight")):
                v = np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
            if k.startswith("language_model.model.") or k.startswith(
                    "language_model.lm_head"):
                pass
            elif k.startswith("language_model."):
                k = ("language_model.model."
                     + k[len("language_model."):])
                if "lm_head" in k:
                    k = k.replace("model.lm_head", "lm_head")
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        if self.hybrid:
            # SAM blocks keep per-index params: window and global blocks
            # carry different rel-pos table shapes and cannot stack
            return ("vision_model.low.blocks", "language_model.model.layers")
        return ("vision_model.blocks", "language_model.model.layers")
