"""Molmo: OpenAI-CLIP-style ViT with attention pooling + OLMo-style decoder.

Role parity: reference mlx_vlm/models/molmo — VisionTransformer (cls token,
interpolated pos-emb, multi-layer feature concat vit_layers):vision.py:185-
288, attention-meanq 2x2 pooling:vision.py:392-400, pad_and_partial_pad
padding embeds:vision.py:355-380, MolmoBlock (fused att_proj, SwiGLU with
value|gate split):language.py:21-92, additive image-feature merge at
image_input_idx:molmo.py:70-80.

TPU design: the tower's per-layer hidden states come from scan ys (static
vit_layers indexing); the 2x2 pooling is one batched cross-attention over
[N_blocks, 4, 2E] windows; the decoder runs under lax.scan with the fused
projections split at load.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.config import BaseModelConfig
from ...core.layers import embedding, layer_norm, linear, rms_norm
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, default_inv_freq, rope_cos_sin
from ...ops.attention import sdpa
from ..llama.llama import text_position_ids

STACK_PATTERNS = (
    "language_model.model.blocks",
    "vision_tower.image_vit.transformer.resblocks",
)


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "molmo"
    d_model: int = 3584
    n_heads: int = 28
    n_kv_heads: int = 4
    n_layers: int = 28
    mlp_hidden_size: int = 37888
    vocab_size: int = 152064
    embedding_size: int = 152064
    additional_vocab_size: int = 128
    layer_norm_eps: float = 1e-5
    rope_theta: float = 1000000.0
    weight_tying: bool = False
    max_position_embeddings: int = 4096


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "molmo"
    image_patch_size: int = 14
    image_emb_dim: int = 1024
    image_num_heads: int = 16
    image_num_key_value_heads: int = 16
    image_num_layers: int = 23
    image_head_dim: int = 64
    image_mlp_dim: int = 4096
    image_num_pos: int = 577
    image_norm_eps: float = 1e-5
    intermediate_size: int = 588  # padded patch pixel dim (C*P*P)
    hidden_size: int = 18944  # projector hidden
    d_model: int = 3584
    image_pooling_h: int = 2
    image_pooling_w: int = 2
    vit_layers: List[int] = field(default_factory=lambda: [-2, -9])
    image_padding_embed: str = "pad_and_partial_pad"


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "molmo"
    eos_token_id: Optional[List[int]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {}
        )
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {}
        )
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


class VisionBackbone:
    def __init__(self, config: VisionConfig):
        self.config = config
        self.num_heads = config.image_num_heads
        self.head_dim = config.image_head_dim
        self.scale = self.head_dim**-0.5

    def _attn(self, p, x, kv=None):
        B, L, _ = x.shape
        kv = x if kv is None else kv
        S = kv.shape[1]
        q = linear(p["wq"], x).reshape(B, L, self.num_heads, self.head_dim)
        k = linear(p["wk"], kv).reshape(B, S, -1, self.head_dim)
        v = linear(p["wv"], kv).reshape(B, S, -1, self.head_dim)
        out = sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                   v.transpose(0, 2, 1, 3), self.scale, None)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, -1)
        return linear(p["wo"], out)

    def __call__(self, params, images, grid: Tuple[int, int],
                 image_masks=None):
        """images [T_crops, N_patch, pix] -> pooled features [T, h*w, D]."""
        cfg = self.config
        vt = params["image_vit"]
        T, N, pix = images.shape
        pad = cfg.intermediate_size - pix
        x = jnp.pad(images, ((0, 0), (0, 0), (0, max(pad, 0))), mode="edge") \
            if pad > 0 else images
        x = linear(vt["patch_embedding"], x)
        cls = jnp.broadcast_to(
            vt["class_embedding"].reshape(1, 1, -1), (T, 1, x.shape[-1])
        ).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        pos = vt["positional_embedding"]
        gh, gw = grid
        side = int((pos.shape[0] - 1) ** 0.5)
        grid_pos = pos[1:].reshape(side, side, -1)
        if (gh, gw) != (side, side):
            grid_pos = jax.image.resize(
                grid_pos, (gh, gw, pos.shape[-1]), method="linear"
            )
        pos_full = jnp.concatenate(
            [pos[:1], grid_pos.reshape(gh * gw, -1)], axis=0
        )
        x = x + pos_full[None].astype(x.dtype)
        x = layer_norm(vt["pre_ln"], x, cfg.image_norm_eps)

        def block(h, lp):
            y = layer_norm(lp["attention_norm"], h, cfg.image_norm_eps)
            h = h + self._attn(lp["attention"], y)
            y = layer_norm(lp["ffn_norm"], h, cfg.image_norm_eps)
            z = linear(lp["feed_forward"]["w1"], y)
            z = z * jax.nn.sigmoid(1.702 * z)  # GELU(approx="fast")
            y = linear(lp["feed_forward"]["w2"], z)
            return h + y, h + y

        _, states = jax.lax.scan(block, x, vt["transformer"]["resblocks"])
        L = states.shape[0]
        feats = jnp.concatenate(
            [states[(i % L)] for i in self.config.vit_layers], axis=-1
        )  # [T, 1+N, n*E]
        feats = feats[:, 1:]  # drop CLS
        if image_masks is not None and "pad_embed" in params:
            pe = params["pad_embed"]  # [2, n*E]
            all_pad = (image_masks == 0).astype(feats.dtype)[..., None]
            partial = ((image_masks < 1) & (image_masks > 0)).astype(
                feats.dtype)[..., None]
            feats = feats + pe[0][None, None] * all_pad
            feats = feats + pe[1][None, None] * partial
        # 2x2 attention pooling with mean query
        ph, pw = cfg.image_pooling_h, cfg.image_pooling_w
        E2 = feats.shape[-1]
        f = feats.reshape(T, gh, gw, E2)
        f = f.reshape(T, gh // ph, ph, gw // pw, pw, E2)
        f = f.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ph * pw, E2)
        q = f.mean(axis=1, keepdims=True)
        pooled = self._pool_attn(params["image_pooling_2d"], q, f)
        pooled = pooled.reshape(T, (gh // ph) * (gw // pw), -1)
        # SwiGLU projector (reference vision MLP w1/w3/w2)
        pj = params["image_projector"]
        h = jax.nn.silu(linear(pj["w1"], pooled)) * linear(pj["w3"], pooled)
        return linear(pj["w2"], h)

    def _pool_attn(self, p, q, kv):
        B, L, _ = q.shape
        S = kv.shape[1]
        qh = linear(p["wq"], q).reshape(B, L, self.num_heads, self.head_dim)
        kh = linear(p["wk"], kv).reshape(B, S, -1, self.head_dim)
        vh = linear(p["wv"], kv).reshape(B, S, -1, self.head_dim)
        out = sdpa(qh.transpose(0, 2, 1, 3), kh.transpose(0, 2, 1, 3),
                   vh.transpose(0, 2, 1, 3), self.scale, None)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, -1)
        return linear(p["wo"], out)


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_heads = args.n_heads
        self.n_kv_heads = args.n_kv_heads
        self.head_dim = args.d_model // args.n_heads
        self.scale = self.head_dim**-0.5
        self.inv_freq = jnp.asarray(
            default_inv_freq(self.head_dim, args.rope_theta), jnp.float32
        )

    def __call__(self, params, inputs_embeds, cache, position_ids):
        args = self.args
        B, S, D = inputs_embeds.shape
        eps = args.layer_norm_eps
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos, sin = rope_cos_sin(position_ids, self.inv_freq)
        h = inputs_embeds
        mp = params["model"]
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask = causal_cache_mask(cache.offset, cache.left_pad, S, cache.capacity)

        def layer(h, xs):
            lp, cxs = xs
            x = rms_norm(lp["attn_norm"], h, eps)
            qkv = linear(lp["att_proj"], x)
            nq = self.n_heads * self.head_dim
            nkv = self.n_kv_heads * self.head_dim
            q = qkv[..., :nq].reshape(B, S, self.n_heads, self.head_dim)
            k = qkv[..., nq:nq + nkv].reshape(B, S, self.n_kv_heads,
                                              self.head_dim)
            v = qkv[..., nq + nkv:].reshape(B, S, self.n_kv_heads,
                                            self.head_dim)
            q = q.transpose(0, 2, 1, 3)
            k = k.transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
            q, k = apply_rope(q, k, cos, sin)
            attn, cxs = cache.attend(cxs, q, k, v, self.scale, mask)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
            h = h + linear(lp["attn_out"], attn)
            x = rms_norm(lp["ff_norm"], h, eps)
            ff = linear(lp["ff_proj"], x)
            val, gate = jnp.split(ff, 2, axis=-1)
            h = h + linear(lp["ff_out"], jax.nn.silu(gate) * val)
            return h, cxs

        h, cys = jax.lax.scan(layer, h, (mp["blocks"], cache.scan_arrays()))
        h = rms_norm(mp["ln_f"], h, eps)
        return h, (None if made else cache.with_arrays(cys, S))

    def logits(self, params, hidden):
        if "ff_out" in params["model"]:
            return linear(params["model"]["ff_out"], hidden)
        return hidden @ params["model"]["wte"]["embedding"].T

    def embed(self, params, input_ids):
        wte = params["model"]["wte"]
        table = jnp.concatenate(
            [wte["embedding"], wte["new_embedding"]], axis=0
        )
        return jnp.take(table, input_ids, axis=0)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16, left_pad=None):
        return cache_lib.init_cache(
            self.args.n_layers, batch_size, self.n_kv_heads, self.head_dim,
            capacity, dtype, left_pad,
        )


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = VisionBackbone(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,  # [T, N_patch, pix]
        image_input_idx: Optional[jax.Array] = None,  # [T*h*w] into sequence
        image_grid: Tuple[int, int] = (24, 24),
        image_masks: Optional[jax.Array] = None,
        **aux,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"], input_ids)
        if pixel_values is None:
            return embeds
        feats = self.vision_tower(
            params["vision_tower"], pixel_values.astype(embeds.dtype),
            image_grid, image_masks,
        )
        feats = feats.reshape(-1, feats.shape[-1])
        idx = image_input_idx.reshape(-1)
        valid = idx >= 0
        safe = jnp.where(valid, idx, 0)
        feats = jnp.where(valid[:, None], feats, 0)
        B, S, D = embeds.shape
        # additive merge (reference molmo.py:78)
        flat = embeds.reshape(B * S, D)
        flat = flat.at[safe].add(feats.astype(flat.dtype))
        return flat.reshape(B, S, D)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache, position_ids)
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
            if "rotary_emb.inv_freq" in k:
                continue
            k = k.replace("model.transformer", "language_model.model")
            k = k.replace("model.vision_backbone", "vision_tower")
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
