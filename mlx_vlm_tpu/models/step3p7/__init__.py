"""Step-3p7 (StepFun) VLM.

Role parity: reference mlx_vlm/models/step3p7 — a perception-encoder
ViT (fused in_proj attention with 2-D rope over the patch grid, layer
scales, quick-gelu MLP, abs pos embeds) whose features two stride-2
convs downsample 4x before a width*4 -> LLM projector
(step3p7.py:_process_image_features), and a Step text decoder: per-head
q/k RMSNorm, mixed sliding/full layers with DIFFERENT head geometry on
sliding layers (attention_other_setting), per-layer rope theta /
partial factors / yarn gating, optional head-wise sigmoid attention
gates, clamped-SwiGLU MLPs (per-layer limits), and MoE layers
(moe_layers_enum) with a sigmoid router + router bias + shared expert
(language.py MoEGate:75, Attention:125).

TPU design: the text stack runs as a trace-time loop (two attention
geometries + dense/MoE mix) over a max-head KV buffer; the ViT is one
scan with the rope table folded in as a trace-time constant per grid;
the router rides core/moe.group_expert_select (n_group=1 == the
reference's sigmoid+bias gate).
"""

from __future__ import annotations

import dataclasses
import inspect
import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.config import BaseModelConfig
from ...core.layers import (embedding, embedding_as_linear, layer_norm,
                            linear, rms_norm)
from ...core.mask import causal_cache_mask
from ...core.moe import group_expert_select, switch_glu
from ...core.rope import apply_rope, make_rope
from ...ops.attention import sdpa
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "perception_encoder"
    width: int = 1536
    layers: int = 47
    heads: int = 16
    num_channels: int = 3
    image_size: int = 728
    mlp_ratio: float = 8960 / 1536
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    use_cls_token: bool = False
    use_ln_pre: bool = True
    use_ln_post: bool = False
    use_abs_posemb: bool = True
    use_rope2d: bool = True
    ls_init_value: Optional[float] = 0.1
    rope_theta: float = 10000.0


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "step3p5"
    hidden_size: int = 4096
    intermediate_size: int = 11264
    num_attention_heads: int = 64
    num_attention_groups: int = 8
    num_hidden_layers: int = 45
    vocab_size: int = 128896
    rms_norm_eps: float = 1e-5
    moe_intermediate_size: int = 1280
    moe_num_experts: int = 288
    moe_top_k: int = 8
    rope_theta: Union[float, List[float]] = 10000.0
    rope_scaling: Optional[Dict[str, Any]] = None
    max_position_embeddings: int = 262144
    share_expert_dim: int = 1280
    share_expert_dims: Optional[int] = None
    head_dim: int = 128
    norm_expert_weight: bool = True
    layer_types: Optional[List[str]] = None
    sliding_window: Optional[int] = None
    use_head_wise_attn_gate: bool = False
    moe_router_scaling_factor: float = 1.0
    attention_other_setting: Optional[Dict[str, Any]] = None
    swiglu_limits: Optional[List[Optional[float]]] = None
    swiglu_limits_shared: Optional[List[Optional[float]]] = None
    yarn_only_types: Optional[List[str]] = None
    partial_rotary_factors: Optional[List[float]] = None
    moe_layers_enum: Union[str, List[int], tuple] = field(
        default_factory=lambda: tuple(range(3, 45)))
    tie_word_embeddings: bool = False

    def __post_init__(self):
        if self.share_expert_dims is not None:
            self.share_expert_dim = self.share_expert_dims

    def moe_layers(self) -> set:
        if isinstance(self.moe_layers_enum, str):
            return {int(i) for i in self.moe_layers_enum.split(",")
                    if i.strip()}
        return set(self.moe_layers_enum)

    def is_sliding(self, i: int) -> bool:
        if self.layer_types:
            return self.layer_types[i] == "sliding_attention"
        return i % 2 == 0

    def heads_for(self, i: int):
        if self.is_sliding(i) and self.attention_other_setting:
            return (self.attention_other_setting["num_attention_heads"],
                    self.attention_other_setting["num_attention_groups"])
        return self.num_attention_heads, self.num_attention_groups


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig = None
    vision_config: VisionConfig = None
    model_type: str = "step3p7"
    understand_projector_stride: int = 2
    projector_bias: bool = False
    image_token_id: int = 128001
    image_token_index: Optional[int] = None
    eos_token_id: Optional[Union[int, List[int]]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {})
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {})
        allowed = inspect.signature(cls).parameters
        out = cls(**{k: v for k, v in params.items() if k in allowed})
        if out.image_token_index is None:
            out.image_token_index = out.image_token_id
        return out


def _rope2d_cos_sin(gh: int, gw: int, dim: int, theta: float):
    """[gh*gw, dim] cos/sin planes (reference vision.py EncoderRope2D:19
    — interleaved-pair rotation over [w-freqs | h-freqs])."""
    inv = 1.0 / theta ** (np.arange(0, dim // 2, 2, np.float32) / (dim // 2))
    fh = np.arange(gh, dtype=np.float32)[:, None] * inv[None]
    fw = np.arange(gw, dtype=np.float32)[:, None] * inv[None]
    fh = np.broadcast_to(fh[:, None, :], (gh, gw, fh.shape[-1]))
    fw = np.broadcast_to(fw[None, :, :], (gh, gw, fw.shape[-1]))
    freqs = np.concatenate([fw, fh], -1).reshape(gh * gw, -1)
    cos = np.repeat(np.cos(freqs), 2, axis=-1)
    sin = np.repeat(np.sin(freqs), 2, axis=-1)
    return cos, sin


def _rotate_pairs(x):
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


class VisionModel:
    def __init__(self, config: VisionConfig):
        self.config = config
        self.n_heads = config.heads
        self.head_dim = config.width // config.heads
        self.scale = self.head_dim**-0.5
        self.grid = config.image_size // config.patch_size

    def __call__(self, params, pixel_values):
        """[B, H, W, 3] -> [B, gh*gw, width] (cls dropped)."""
        cfg = self.config
        P = cfg.patch_size
        B, H, W, _ = pixel_values.shape
        gh, gw = H // P, W // P
        w = params["conv1"]["weight"]  # HWIO after sanitize
        x = jax.lax.conv_general_dilated(
            pixel_values.astype(w.dtype), w, (P, P), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x.reshape(B, gh * gw, cfg.width)
        if cfg.use_abs_posemb:
            pos = params["positional_embedding"]
            if cfg.use_cls_token:
                pos = pos[1:]
            g0 = self.grid
            if (gh, gw) != (g0, g0):
                # bilinear-resize the learned table to this patch grid
                # (reference vision.py:_pos_embed)
                pos = jax.image.resize(
                    pos.reshape(g0, g0, -1).astype(jnp.float32),
                    (gh, gw, pos.shape[-1]), method="linear")
                pos = pos.reshape(gh * gw, -1)
            x = x + pos[None].astype(x.dtype)
        if cfg.use_ln_pre and "ln_pre" in params:
            x = layer_norm(params["ln_pre"], x, cfg.layer_norm_eps)
        cos, sin = _rope2d_cos_sin(gh, gw, self.head_dim, cfg.rope_theta)
        cos = jnp.asarray(cos, jnp.float32)[None, None]
        sin = jnp.asarray(sin, jnp.float32)[None, None]

        def block(h, lp):
            y = layer_norm(lp["ln_1"], h, cfg.layer_norm_eps)
            qkv = linear(lp["attn"]["in_proj"], y).reshape(
                B, -1, 3, self.n_heads, self.head_dim)
            q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
            if cfg.use_rope2d:
                qf = q.astype(jnp.float32)
                kf = k.astype(jnp.float32)
                q = (qf * cos + _rotate_pairs(qf) * sin).astype(q.dtype)
                k = (kf * cos + _rotate_pairs(kf) * sin).astype(k.dtype)
            o = sdpa(q, k, v, self.scale, None)
            o = linear(lp["attn"]["out_proj"],
                       o.transpose(0, 2, 1, 3).reshape(B, -1, cfg.width))
            h = h + o * lp["ls_1"]["gamma"].astype(o.dtype)
            y = layer_norm(lp["ln_2"], h, cfg.layer_norm_eps)
            y = linear(lp["mlp"]["c_fc"], y)
            y = y * jax.nn.sigmoid(1.702 * y)  # quick-gelu
            y = linear(lp["mlp"]["c_proj"], y)
            return h + y * lp["ls_2"]["gamma"].astype(y.dtype), None

        x, _ = jax.lax.scan(block, x, params["transformer"])
        if cfg.use_ln_post and "ln_post" in params:
            x = layer_norm(params["ln_post"], x, cfg.layer_norm_eps)
        return x


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        a = args
        self.head_dim = a.head_dim
        self.scale = a.head_dim**-0.5
        self.max_kv = max(a.heads_for(i)[1]
                          for i in range(a.num_hidden_layers))
        self.ropes = []
        lt = a.layer_types or ["sliding_attention" if i % 2 == 0
                               else "full_attention"
                               for i in range(a.num_hidden_layers)]
        for i in range(a.num_hidden_layers):
            theta = (a.rope_theta[i] if isinstance(a.rope_theta, list)
                     else a.rope_theta)
            partial = 1.0
            if a.partial_rotary_factors and i < len(a.partial_rotary_factors):
                partial = a.partial_rotary_factors[i]
            scaling = a.rope_scaling
            if a.yarn_only_types and lt[i] not in a.yarn_only_types:
                scaling = None
            self.ropes.append(make_rope(int(a.head_dim * partial), theta,
                                        scaling,
                                        a.max_position_embeddings))

    def _mlp(self, mlp, x, limit):
        g = linear(mlp["gate_proj"], x)
        u = linear(mlp["up_proj"], x)
        if limit:
            act = jnp.minimum(jax.nn.silu(g), limit) * jnp.clip(u, -limit,
                                                                limit)
        else:
            act = jax.nn.silu(g) * u
        return linear(mlp["down_proj"], act)

    def _moe(self, mlp, x, limit, shared_limit):
        a = self.args
        B, S, D = x.shape
        flat = x.reshape(B * S, D)
        idx, wts = group_expert_select(
            linear({"weight": mlp["gate"]["gate"]["weight"]}, flat),
            mlp["gate"]["router_bias"],
            a.moe_top_k, 1, 1, a.moe_router_scaling_factor,
            a.norm_expert_weight,
        )
        if limit:
            act2 = lambda g, u: (jnp.minimum(jax.nn.silu(g), limit)  # noqa
                                 * jnp.clip(u, -limit, limit))
        else:
            act2 = None
        out = switch_glu(
            flat,
            mlp["experts"]["gate_proj"]["weight"],
            mlp["experts"]["up_proj"]["weight"],
            mlp["experts"]["down_proj"]["weight"],
            idx, wts, act2=act2,
        )
        out = out + self._mlp(mlp["share_expert"], flat, shared_limit
                              ).reshape(B * S, D)
        return out.reshape(B, S, D)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        a = self.args
        B, S, _ = inputs_embeds.shape
        eps = a.rms_norm_eps
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask_f = causal_cache_mask(cache.offset, cache.left_pad, S,
                                   cache.capacity)
        mask_s = (causal_cache_mask(cache.offset, cache.left_pad, S,
                                    cache.capacity,
                                    window=a.sliding_window)
                  if a.sliding_window else mask_f)
        h = inputs_embeds
        mp = params["model"]
        ks, vs = cache.k, cache.v
        moe_set = a.moe_layers()
        for i in range(a.num_hidden_layers):
            lp = mp["layers"][str(i)]
            sa = lp["self_attn"]
            nh, nkv = a.heads_for(i)
            cos, sin = self.ropes[i].cos_sin(position_ids)
            x = rms_norm(lp["input_layernorm"], h, eps)
            q = linear(sa["q_proj"], x).reshape(B, S, nh, self.head_dim)
            k = linear(sa["k_proj"], x).reshape(B, S, nkv, self.head_dim)
            v = linear(sa["v_proj"], x).reshape(B, S, nkv, self.head_dim)
            q = rms_norm(sa["q_norm"], q, eps).transpose(0, 2, 1, 3)
            k = rms_norm(sa["k_norm"], k, eps).transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
            q, k = apply_rope(q, k, cos, sin)
            mask = mask_s if a.is_sliding(i) else mask_f
            attn, (k_b, v_b) = cache.attend(
                (ks[i][:, :nkv], vs[i][:, :nkv]), q, k, v, self.scale, mask)
            ks = ks.at[i, :, :nkv].set(k_b)
            vs = vs.at[i, :, :nkv].set(v_b)
            attn = attn.transpose(0, 2, 1, 3)  # [B,S,nh,hd]
            if a.use_head_wise_attn_gate and "g_proj" in sa:
                gate = jax.nn.sigmoid(linear(sa["g_proj"], x))
                attn = attn * gate[..., None].astype(attn.dtype)
            h = h + linear(sa["o_proj"], attn.reshape(B, S, -1))
            x = rms_norm(lp["post_attention_layernorm"], h, eps)
            limit = (a.swiglu_limits[i] if a.swiglu_limits
                     and i < len(a.swiglu_limits) else 0) or 0
            sh_limit = (a.swiglu_limits_shared[i] if a.swiglu_limits_shared
                        and i < len(a.swiglu_limits_shared) else 0) or 0
            if i in moe_set and "experts" in lp["mlp"]:
                h = h + self._moe(lp["mlp"], x, limit, sh_limit)
            else:
                h = h + self._mlp(lp["mlp"], x, sh_limit)
        h = rms_norm(mp["norm"], h, eps)
        if made:
            return h, None
        return h, dataclasses.replace(cache, k=ks, v=vs,
                                      offset=cache.offset + S)

    def logits(self, params, hidden):
        if self.args.tie_word_embeddings or "lm_head" not in params:
            return embedding_as_linear(params["model"]["embed_tokens"],
                                       hidden)
        return linear(params["lm_head"], hidden)

    def embed(self, params, input_ids):
        return embedding(params["model"]["embed_tokens"], input_ids)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None):
        return cache_lib.init_cache(
            self.args.num_hidden_layers, batch_size, self.max_kv,
            self.head_dim, capacity, dtype, left_pad,
        )


_EXPERT_RE = re.compile(
    r"\.mlp\.(?:switch_mlp|experts)\.(\d+)\."
    r"(gate_proj|up_proj|down_proj)\.weight$")


class Model:
    CONFIG_CLS = ModelConfig

    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config.text_config, config)
        self.vision_model = VisionModel(config.vision_config)

    def _conv_s2(self, p, x):
        w = p["weight"]  # HWIO after sanitize
        y = jax.lax.conv_general_dilated(
            x.astype(w.dtype), w, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + p["bias"] if "bias" in p else y

    def vision_features(self, params, pixel_values):
        """full feature path: ViT -> 2 stride-2 convs -> projector."""
        feats = self.vision_model(params["vision_model"], pixel_values)
        B, N, C = feats.shape
        hw = int(N**0.5)
        x = feats.reshape(B, hw, hw, C)
        x = self._conv_s2(params["vision_model"]["vit_downsampler1"], x)
        x = self._conv_s2(params["vision_model"]["vit_downsampler2"], x)
        B, h2, w2, C4 = x.shape
        x = x.reshape(B, h2 * w2, C4)
        return linear(params["vit_large_projector"], x)

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
            self.config.image_token_index, -1,
            image_features.reshape(-1, image_features.shape[-1]),
            embeds, input_ids)

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
        experts = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            # step checkpoints use .moe. names (reference config.py
            # _remap_language_key)
            k = k.replace(".moe.gate_proj", ".mlp.experts.gate_proj")
            k = k.replace(".moe.up_proj", ".mlp.experts.up_proj")
            k = k.replace(".moe.down_proj", ".mlp.experts.down_proj")
            k = k.replace(".moe.router_bias", ".mlp.gate.router_bias")
            k = k.replace(".moe.gate", ".mlp.gate.gate")
            k = k.replace(".share_expert", ".mlp.share_expert")
            m = _EXPERT_RE.search(k)
            if m:
                stem = k[: m.start()]
                experts.setdefault((stem, m.group(2)), {})[
                    int(m.group(1))] = np.asarray(v)
                continue
            k = k.replace(".transformer.resblocks.", ".transformer.")
            k = k.replace("attn.in_proj_weight", "attn.in_proj.weight")
            k = k.replace("attn.in_proj_bias", "attn.in_proj.bias")
            if (k.endswith("conv1.weight") and getattr(v, "ndim", 0) == 4
                    and v.shape[-1] != 3) or (
                    "vit_downsampler" in k and k.endswith(".weight")
                    and getattr(v, "ndim", 0) == 4):
                v = np.transpose(np.asarray(v), (2, 3, 1, 0))  # OIHW->HWIO
            if not k.startswith(("vision_model.", "vit_large_projector.",
                                 "language_model.")):
                k = "language_model." + k
            out[k] = v
        for (stem, role), by_e in experts.items():
            if not stem.startswith("language_model."):
                stem = "language_model." + stem
            out[f"{stem}.mlp.experts.{role}.weight"] = np.stack(
                [by_e[e] for e in range(len(by_e))])
        return out

    @property
    def stack_patterns(self):
        return ("vision_model.transformer",)


__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig",
           "LanguageModel", "VisionModel"]
