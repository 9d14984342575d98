"""Molmo-2 (AllenAI): SigLIP-class ViT with gather-pooled adapter over an
OLMo-2-style decoder with an extended vocabulary.

Role parity: reference mlx_vlm/models/molmo2/ — fused att_proj attention
with per-head q/k RMSNorm (language.py:43), fused ff_proj SwiGLU where
the SECOND half gates (x, gate = split; silu(gate)*x, :36), wte split
into base + new_embedding tables (:15), multi-layer ViT feature concat
(adapter vit_layers [-3, -9]) gather-pooled by processor-supplied
pooled-patch indices through a mean-query cross-attention and SwiGLU
projector (vision.py:237), ADDITIVE feature merge at image_patch_id.

TPU design: the ViT scan's per-layer hidden states come back as scan ys
(static vit_layers indexing, molmo pattern); pooling indices are
host-side aux, so the gather/pool/merge is one static program.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.config import BaseModelConfig
from ...core.layers import layer_norm, linear, rms_norm
from ...core.mask import causal_cache_mask
from ...core.quant_scan import scan_layers
from ...core.rope import apply_rope, make_rope
from ...ops.attention import sdpa
from ..llama.llama import text_position_ids


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "molmo2"
    hidden_size: int = 2560
    intermediate_size: int = 9728
    num_hidden_layers: int = 32
    num_attention_heads: int = 20
    num_key_value_heads: int = 20
    head_dim: int = 128
    vocab_size: int = 151936
    additional_vocab_size: int = 128
    layer_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    qkv_bias: bool = False
    max_position_embeddings: int = 32768
    tie_word_embeddings: bool = False


@dataclass
class VitConfig(BaseModelConfig):
    model_type: str = "molmo2_vit"
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 25
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    head_dim: int = 72
    image_patch_size: int = 14
    image_num_pos: int = 729
    layer_norm_eps: float = 1e-6


@dataclass
class AdapterConfig(BaseModelConfig):
    model_type: str = "molmo2_adapter"
    hidden_size: int = 1152
    intermediate_size: int = 9728
    text_hidden_size: int = 2560
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    head_dim: int = 72
    vit_layers: List[int] = field(default_factory=lambda: [-3, -9])
    pooling_attention_mask: bool = True


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vit_config: VitConfig
    adapter_config: AdapterConfig
    model_type: str = "molmo2"
    image_patch_id: int = 151938
    eos_token_id: Optional[List[int]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {})
        vc = params.get("vision_config", {}) or {}
        vit = dict(vc.get("vit_config", {}) or {})
        if vit.get("num_hidden_layers", 25) > 25:
            vit["num_hidden_layers"] = 25  # HF config/weights mismatch
        params["vit_config"] = VitConfig.from_dict(vit)
        params["adapter_config"] = AdapterConfig.from_dict(
            vc.get("adapter_config", {}) or {})
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


def _mhdpa(p, q_in, kv_in, n_heads, head_dim, mask=None):
    """ViT cross/self attention with wq/wk/wv/wo naming."""
    Bq, Lq, _ = q_in.shape
    Bk, Lk, _ = kv_in.shape
    q = linear(p["wq"], q_in).reshape(Bq, Lq, n_heads, head_dim)
    k = linear(p["wk"], kv_in).reshape(Bk, Lk, n_heads, head_dim)
    v = linear(p["wv"], kv_in).reshape(Bk, Lk, n_heads, head_dim)
    o = sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
             v.transpose(0, 2, 1, 3), head_dim**-0.5, mask)
    o = o.transpose(0, 2, 1, 3).reshape(Bq, Lq, -1)
    # molmo_point's pooling attention has no output projection
    # (reference molmo_point/vision.py out_layer=False:52)
    return linear(p["wo"], o) if "wo" in p else o


class VisionModel:
    def __init__(self, vit: VitConfig, adapter: AdapterConfig):
        self.vit = vit
        self.adapter = adapter
        L = vit.num_hidden_layers
        self.vit_layers = [l if l >= 0 else l + L for l in
                           adapter.vit_layers]

    def encode(self, params, patches):
        """[B*crops, n_patch, pix] -> concat selected-layer features."""
        cfg = self.vit
        vp = params["image_vit"]
        x = linear(vp["patch_embedding"], patches)
        pos = vp["positional_embedding"]
        # static-size path: processor supplies default-size crops
        x = x + pos[None].astype(x.dtype)

        def block(h, lp):
            y = layer_norm(lp["attention_norm"], h, cfg.layer_norm_eps)
            y = _mhdpa(lp["attention"], y, y, cfg.num_attention_heads,
                       cfg.head_dim)
            h = h + y
            y = layer_norm(lp["ffn_norm"], h, cfg.layer_norm_eps)
            y = linear(lp["feed_forward"]["w2"], jax.nn.gelu(
                linear(lp["feed_forward"]["w1"], y), approximate=True))
            return h + y, h + y

        _, hiddens = jax.lax.scan(block, x, vp["transformer"])
        feats = jnp.concatenate([hiddens[i] for i in self.vit_layers],
                                axis=-1)
        return feats

    def __call__(self, params, patches, pooled_patches_idx):
        """pooled_patches_idx [B, n_tok, k] gathers patch features per
        output token; -1 entries are padding (reference vision.py:237)."""
        ad = self.adapter
        B = pooled_patches_idx.shape[0]
        feats = self.encode(params, patches)
        dim = feats.shape[-1]
        flat = feats.reshape(B, -1, dim)
        valid = pooled_patches_idx >= 0
        idx = jnp.maximum(pooled_patches_idx, 0)
        gathered = jax.vmap(lambda f, i: jnp.take(f, i, axis=0))(
            flat, idx.reshape(B, -1)).reshape(*pooled_patches_idx.shape,
                                              dim)
        gathered = gathered * valid[..., None].astype(gathered.dtype)
        to_pool = gathered.reshape(-1, pooled_patches_idx.shape[-1], dim)
        vmask = valid.reshape(-1, valid.shape[-1])
        if ad.pooling_attention_mask:
            denom = jnp.maximum(vmask.sum(-1, keepdims=True), 1)
            query = to_pool.sum(-2, keepdims=True) / denom[..., None].astype(
                to_pool.dtype)
            mask = vmask[:, None, None, :]
        else:
            query = to_pool.mean(-2, keepdims=True)
            mask = None
        pooled = _mhdpa(params["image_pooling_2d"], query, to_pool,
                        ad.num_attention_heads, ad.head_dim, mask)
        pooled = pooled.reshape(B, -1, ad.hidden_size)
        pr = params["image_projector"]
        out = linear(pr["w2"], jax.nn.silu(linear(pr["w1"], pooled))
                     * linear(pr["w3"], pooled))
        return out, jnp.any(valid, axis=-1)


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.head_dim
        self.scale = args.head_dim**-0.5
        self.rope = make_rope(args.head_dim, args.rope_theta, None,
                              args.max_position_embeddings)

    def embed(self, params, input_ids):
        wte = params["model"]["wte"]
        table = jnp.concatenate([wte["embedding"], wte["new_embedding"]],
                                axis=0)
        return jnp.take(table, jnp.maximum(input_ids, 0), axis=0)

    def logits(self, params, hidden):
        return linear(params["lm_head"], hidden)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None):
        return cache_lib.init_cache(
            self.args.num_hidden_layers, batch_size, self.n_kv_heads,
            self.head_dim, capacity, dtype, left_pad)

    def __call__(self, params, inputs_embeds, cache, position_ids,
                 return_pre_ln: bool = False):
        """return_pre_ln=True additionally returns the pre-ln_f hidden —
        molmo_point's point-predictor heads read it (reference
        molmo_point/language.py return_pre_ln:150)."""
        a = self.args
        B, S, _ = inputs_embeds.shape
        pos = position_ids[0] if position_ids.ndim == 3 else position_ids
        cos, sin = self.rope.cos_sin(pos)
        mp = params["model"]
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask = causal_cache_mask(cache.offset, cache.left_pad, S,
                                 cache.capacity)
        qd = self.n_heads * a.head_dim
        kd = self.n_kv_heads * a.head_dim

        def layer(h, lp, cxs):
            x = rms_norm(lp["attn_norm"], h, a.layer_norm_eps)
            qkv = linear(lp["self_attn"]["att_proj"], x)
            q = qkv[..., :qd].reshape(B, S, self.n_heads, a.head_dim)
            k = qkv[..., qd:qd + kd].reshape(B, S, self.n_kv_heads,
                                             a.head_dim)
            v = qkv[..., qd + kd:].reshape(B, S, self.n_kv_heads,
                                           a.head_dim)
            q = rms_norm(lp["self_attn"]["q_norm"], q, a.layer_norm_eps)
            k = rms_norm(lp["self_attn"]["k_norm"], k, a.layer_norm_eps)
            q = q.transpose(0, 2, 1, 3)
            k = k.transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
            q, k = apply_rope(q, k, cos, sin)
            kc, vc = cache_lib.update_layer(cxs[0], cxs[1], k, v,
                                            cache.offset)
            o = sdpa(q, kc, vc, self.scale, mask)
            o = o.transpose(0, 2, 1, 3).reshape(B, S, -1)
            h = h + linear(lp["self_attn"]["attn_out"], o)
            x = rms_norm(lp["ff_norm"], h, a.layer_norm_eps)
            ff = linear(lp["mlp"]["ff_proj"], x)
            val, gate = jnp.split(ff, 2, axis=-1)
            h = h + linear(lp["mlp"]["ff_out"], jax.nn.silu(gate) * val)
            return h, (kc, vc)

        pre, cys = scan_layers(layer, inputs_embeds, mp["blocks"],
                               cache.scan_arrays())
        h = rms_norm(mp["ln_f"], pre, a.layer_norm_eps)
        out_cache = None if made else cache.with_arrays(cys, S)
        if return_pre_ln:
            return (h, pre), out_cache
        return h, out_cache


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = VisionModel(config.vit_config,
                                        config.adapter_config)
        self.language_model = LanguageModel(config.text_config, config)

    def get_input_embeddings(self, params, input_ids, pixel_values=None,
                             pooled_patches_idx=None, image_features=None,
                             **aux):
        embeds = self.language_model.embed(params["language_model"],
                                           input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        if image_features is None:
            feats, valid_tok = self.vision_tower(
                params["vision_tower"],
                pixel_values.astype(embeds.dtype), pooled_patches_idx)
            # flatten valid pooled tokens in order
            image_features = feats.reshape(-1, feats.shape[-1])
            vmask = valid_tok.reshape(-1)
        else:
            vmask = jnp.ones(image_features.shape[0], bool)
        # additive merge at image_patch_id positions (reference :306-314)
        B, S, D = embeds.shape
        flat = embeds.reshape(B * S, D)
        is_patch = (input_ids.reshape(-1)
                    == self.config.image_patch_id)
        # order-preserving scatter: k-th patch position gets the k-th
        # VALID pooled feature
        feat_order = jnp.cumsum(vmask) - 1
        src = jnp.where(vmask[:, None], image_features, 0)
        # compact valid features to the front
        comp = jnp.zeros_like(src)
        comp = comp.at[jnp.where(vmask, feat_order,
                                 src.shape[0] - 1)].set(src)
        pos_order = jnp.cumsum(is_patch) - 1
        add = jnp.where(is_patch[:, None],
                        jnp.take(comp, jnp.maximum(pos_order, 0), axis=0),
                        0)
        flat = flat + add.astype(flat.dtype)
        return flat.reshape(B, S, D)

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
            if k.startswith("model.transformer."):
                k = k.replace("model.transformer.",
                              "language_model.model.", 1)
            if k.startswith("model.vision_backbone."):
                k = k.replace("model.vision_backbone.", "vision_tower.",
                              1)
            if k.startswith("lm_head."):
                k = "language_model." + k
            k = k.replace(".transformer.resblocks.", ".transformer.")
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return ("language_model.model.blocks",
                "vision_tower.image_vit.transformer")
