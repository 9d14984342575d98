"""Jina VLM family.

Role parity: reference mlx_vlm/models/jina_vlm — SigLIP-style ViT over
pre-patchified crops whose features are taken from MULTIPLE layers
(vit_layers indices over [per-layer outputs..., post_norm output]) and
channel-concatenated (vision.py get_features:182); a cross-attention
pooling connector: per 2x2 window, the window mean queries the window
through pooling.q/kv/out, then a SwiGLU projector maps to the LLM width
(jina_vlm.py VisionLanguageConnector:78); padding crops get learned
pad_embed offsets.  The decoder is qwen3-shaped: fused attn.qkv with
PRE-rope q/k RMSNorm, ffn.gate_up fused with the value-first
([up | gate]) split convention, an ExtendedEmbedding (base + learned
additional rows), ln_f, untied lm_head.  Image features merge
ADDITIVELY at image_input_idx token positions (molmo convention,
jina_vlm.py:204-251).

TPU design: the decoder rides the shared llama scan (fused tensors and
the extended embedding concat normalize at sanitize); the ViT runs as a
trace-time loop so arbitrary vit_layers tap intermediate states; the
connector batches all windows of all crops through one attention call;
the additive merge is one vectorized segment-sum scatter, not a Python
loop over positions.
"""

from __future__ import annotations

import inspect
import re
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import layer_norm, linear
from ...ops.attention import sdpa
from ..llama.config import TextConfig as _LlamaText
from ..llama.language import LanguageModel as _LlamaLM
from ..llama.llama import text_position_ids


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "jina_vlm"
    hidden_size: int = 1152
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    head_dim: int = 72
    patch_size: int = 14
    image_size: int = 378
    num_channels: int = 3
    intermediate_size: int = 4304
    layer_norm_eps: float = 1e-6
    use_bias: bool = True
    use_cls_token: bool = False
    post_layer_norm: bool = True
    vit_layers: Tuple[int, ...] = (-4, -10)
    output_size: int = 2048
    pooling_h: int = 2
    pooling_w: int = 2
    connector_hidden_size: int = 6144


@dataclass
class TextConfig(_LlamaText):
    model_type: str = "jina_vlm"
    additional_vocab_size: int = 128
    use_qk_norm: bool = True


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig = None
    vision_config: VisionConfig = None
    model_type: str = "jina_vlm"
    vocab_size: int = 151936
    image_token_index: int = 151940
    image_patch_token_id: int = 151665

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {})
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {})
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


class VisionModel:
    def __init__(self, config: VisionConfig):
        self.config = config
        self.n_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5
        self.crop_patches = config.image_size // config.patch_size

    def _attn(self, p, x):
        B, N, E = x.shape
        qkv = linear(p["qkv"], x).reshape(B, N, 3, self.n_heads,
                                          self.head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        out = sdpa(q, k, v, self.scale, None)
        return linear(p["out"], out.transpose(0, 2, 1, 3).reshape(B, N, -1))

    def get_features(self, params, patches):
        """[N_crops, n_patch, pdim] -> concat of vit_layers features."""
        cfg = self.config
        x = linear(params["patch_embed"]["proj"], patches)
        x = x + params["pos_embed"][None]
        hidden = []
        for i in range(cfg.num_hidden_layers):
            lp = params["layers"][str(i)]
            x = x + self._attn(lp["attn"],
                               layer_norm(lp["attn_norm"], x,
                                          cfg.layer_norm_eps))
            y = layer_norm(lp["ffn_norm"], x, cfg.layer_norm_eps)
            y = linear(lp["ffn"]["down"],
                       jax.nn.gelu(linear(lp["ffn"]["up"], y),
                                   approximate=True))
            x = x + y
            hidden.append(x)
        if cfg.post_layer_norm and "post_norm" in params:
            hidden.append(layer_norm(params["post_norm"], x,
                                     cfg.layer_norm_eps))
        feats = [hidden[i] for i in cfg.vit_layers]
        return jnp.concatenate(feats, axis=-1)


class LanguageModel(_LlamaLM):
    pass


class Model:
    CONFIG_CLS = ModelConfig

    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config.text_config, config)
        self.vision_model = VisionModel(config.vision_config)

    # --------------------------------------------------------- connector
    def _connect(self, params, feats):
        """[n_crops, n_patch, C*len(vit_layers)] -> [n_crops, n_pool, D]."""
        cfg = self.config.vision_config
        vp = params["vl_connector"]
        n_crops, n_patch, C = feats.shape
        side = self.vision_model.crop_patches
        ph, pw = cfg.pooling_h, cfg.pooling_w
        nh, nw = side // ph, side // pw
        x = feats.reshape(n_crops, side, side, C)
        x = x.reshape(n_crops, nh, ph, nw, pw, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            n_crops * nh * nw, ph * pw, C)
        query = x.mean(axis=1, keepdims=True)
        p = vp["pooling"]
        B, Lq, _ = query.shape
        H, hd = cfg.num_attention_heads, cfg.head_dim
        q = linear(p["q"], query).reshape(B, Lq, H, hd).transpose(0, 2, 1, 3)
        kv = linear(p["kv"], x).reshape(B, ph * pw, 2, H, hd)
        k = kv[:, :, 0].transpose(0, 2, 1, 3)
        v = kv[:, :, 1].transpose(0, 2, 1, 3)
        pooled = sdpa(q, k, v, hd**-0.5, None)
        pooled = linear(p["out"],
                        pooled.transpose(0, 2, 1, 3).reshape(B, Lq, -1))
        pooled = pooled.reshape(n_crops, nh * nw, -1)
        pj = vp["projector"]
        gu = linear(pj["gate_up"], pooled)
        half = gu.shape[-1] // 2
        up, gate = gu[..., :half], gu[..., half:]
        return linear(pj["down"], jax.nn.silu(gate) * up)

    def get_input_embeddings(self, params, input_ids, pixel_values=None,
                             image_input_idx=None, image_features=None,
                             **aux):
        embeds = self.language_model.embed(params["language_model"],
                                           input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        if image_features is None:
            px = pixel_values
            if px.ndim == 4:  # [B, n_crops, n_patch, pdim] -> flatten B
                px = px.reshape(-1, px.shape[-2], px.shape[-1])
            feats = self.vision_model.get_features(
                params["vision_model"], px.astype(embeds.dtype))
            image_features = self._connect(params, feats)
        B, S, D = embeds.shape
        flat_feats = image_features.reshape(-1, image_features.shape[-1])
        idx = jnp.asarray(image_input_idx).reshape(B, -1)
        n = idx.shape[1]
        rows = jnp.repeat(jnp.arange(B), n)
        pos = idx.reshape(-1)
        # additive merge: one scatter-add over flattened (b, pos) targets;
        # invalid (-1 / out-of-range) entries land in a per-row spill slot
        valid = (pos >= 0) & (pos < S)
        tgt = rows * (S + 1) + jnp.where(valid, pos, S)
        add = jnp.zeros((B * (S + 1), D), embeds.dtype)
        add = add.at[tgt].add(
            jnp.where(valid[:, None], flat_feats.astype(embeds.dtype), 0))
        add = add.reshape(B, S + 1, D)[:, :S]
        return embeds + add

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
        tc = self.config.text_config
        hd = tc.head_dim or tc.hidden_size // tc.num_attention_heads
        qd = tc.num_attention_heads * hd
        kvd = tc.num_key_value_heads * hd
        out = {}
        ext = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            m = re.match(r"^language_model\.layers\.(\d+)\.(.+)$", k)
            if m:
                i, rest = m.group(1), m.group(2)
                base = f"language_model.model.layers.{i}."
                if rest == "attn.qkv.weight":
                    out[base + "self_attn.q_proj.weight"] = v[:qd]
                    out[base + "self_attn.k_proj.weight"] = v[qd:qd + kvd]
                    out[base + "self_attn.v_proj.weight"] = v[qd + kvd:]
                elif rest == "attn.out.weight":
                    out[base + "self_attn.o_proj.weight"] = v
                elif rest in ("attn.q_norm.weight", "attn.k_norm.weight"):
                    out[base + "self_attn." + rest.split(".", 1)[1]] = v
                elif rest == "ffn.gate_up.weight":
                    half = v.shape[0] // 2
                    # jina convention: first half is UP, second half GATE
                    out[base + "mlp.up_proj.weight"] = v[:half]
                    out[base + "mlp.gate_proj.weight"] = v[half:]
                elif rest == "ffn.down.weight":
                    out[base + "mlp.down_proj.weight"] = v
                elif rest == "attn_norm.weight":
                    out[base + "input_layernorm.weight"] = v
                elif rest == "ffn_norm.weight":
                    out[base + "post_attention_layernorm.weight"] = v
                else:
                    out[base + rest] = v
                continue
            if k in ("language_model.embedding.embedding",
                     "language_model.embedding.new_embedding"):
                ext[k.rsplit(".", 1)[-1]] = np.asarray(v)
                continue
            if k == "language_model.embedding.weight":
                out["language_model.model.embed_tokens.weight"] = v
                continue
            if k == "language_model.ln_f.weight":
                out["language_model.model.norm.weight"] = v
                continue
            if k.startswith("lm_head."):
                out["language_model." + k] = v
                continue
            if k.startswith("language_model.lm_head."):
                out[k] = v
                continue
            out[k] = v
        if ext:
            out["language_model.model.embed_tokens.weight"] = (
                np.concatenate([ext["embedding"], ext["new_embedding"]],
                               axis=0))
        return out

    @property
    def stack_patterns(self):
        return ("language_model.model.layers",)


__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig",
           "LanguageModel", "VisionModel"]
