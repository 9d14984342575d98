"""Phi-4 + SigLIP2-NaFlex VLM (phi4-siglip).

Role parity: reference mlx_vlm/models/phi4_siglip — SigLIP2 vision tower
whose 16x16 position-embedding table is bicubic-resized per image to its
(h, w) patch grid (vision.py:69 resize_positional_embeddings), features
taken from mm_vision_select_layer (-2 = output of the second-to-last
encoder layer, pre post-layernorm, phi4_siglip.py:86), a 2-layer GELU
projector (mm_projector), and a phi-4 text decoder: fused qkv_proj /
gate_up_proj, partial rotary, longrope scaling (language.py:11-70).
Image placeholders are IMAGE_TOKEN_INDEX = -200 in input_ids, expanded
to per-image feature spans.

TPU design: the tower consumes FLAT-PACKED patches [N, C*P*P] with
per-image segment ids (block-diagonal attention mask) and a host-side
bicubic position plan — one jit, static shapes, no per-image Python on
device (lfm2_vl pattern); the decoder is the shared llama scan with the
fused projections split at sanitize.  -200 sentinels are rewritten
host-side in prepare-time to one placeholder token per patch so the
standard scatter-merge path applies.
"""

from __future__ import annotations

import inspect
import re
from dataclasses import dataclass, field
from typing import List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import layer_norm, linear
from ...ops.attention import sdpa
from ..kimi_vl.kimi_vl import bicubic_pos_plan
from ..llama.config import TextConfig as _LlamaText
from ..llama.language import LanguageModel as _LlamaLM
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features

IMAGE_TOKEN_INDEX = -200


@dataclass
class TextConfig(_LlamaText):
    model_type: str = "phi4-siglip"
    original_max_position_embeddings: int = 32768


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "siglip2_vision_model"
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    num_channels: int = 3
    image_size: int = 512
    patch_size: int = 16
    num_patches: int = 256
    layer_norm_eps: float = 1e-6


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig = None
    vision_config: VisionConfig = None
    model_type: str = "phi4-siglip"
    mm_hidden_size: int = 1152
    mm_vision_select_layer: int = -2
    image_token_index: int = IMAGE_TOKEN_INDEX
    min_num_patches: int = 256
    max_num_patches: int = 3600
    eos_token_id: Optional[Union[int, List[int]]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        text = dict(params.get("text_config", {}) or {})
        for k in list(params):
            if k in _LlamaText.__dataclass_fields__ and k not in text:
                text[k] = params[k]
        if text.get("rope_scaling") and "original_max_position_embeddings" \
                not in text["rope_scaling"]:
            text["rope_scaling"] = dict(text["rope_scaling"])
            text["rope_scaling"]["original_max_position_embeddings"] = (
                params.get("original_max_position_embeddings", 32768))
        params["text_config"] = TextConfig.from_dict(text)
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {})
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


class VisionModel:
    """SigLIP2-NaFlex encoder over flat-packed patches."""

    def __init__(self, config: VisionConfig, select_layer: int = -2):
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5
        self.side = int(config.num_patches**0.5)
        # select -1 = all layers + post_layernorm; -2 = stop one early
        self.n_used = config.num_hidden_layers + 1 + select_layer
        self.post_norm = select_layer == -1

    def __call__(self, params, pixel_values, segment_ids, pos_idx,
                 pos_weights):
        cfg = self.config
        vm = params["vision_model"]
        emb = vm["embeddings"]
        w = emb["patch_embedding"]["weight"]
        x = jnp.dot(pixel_values.astype(w.dtype), w.T)
        if "bias" in emb["patch_embedding"]:
            x = x + emb["patch_embedding"]["bias"]
        table = emb["position_embedding"]["weight"]
        pos = jnp.einsum(
            "kn,knd->nd", pos_weights.astype(jnp.float32),
            jnp.take(table, pos_idx, axis=0).astype(jnp.float32))
        x = x + pos.astype(x.dtype)
        mask = (segment_ids[None, :] == segment_ids[:, None])[None, None]

        def layer(h, lp):
            y = layer_norm(lp["layer_norm1"], h, cfg.layer_norm_eps)
            y = self._attention(lp["self_attn"], y, mask)
            h = h + y
            y = layer_norm(lp["layer_norm2"], h, cfg.layer_norm_eps)
            y = linear(lp["mlp"]["fc2"],
                       jax.nn.gelu(linear(lp["mlp"]["fc1"], y),
                                   approximate=True))
            return h + y, None

        layers = jax.tree.map(lambda a: a[: self.n_used],
                              vm["encoder"]["layers"])
        x, _ = jax.lax.scan(layer, x, layers)
        if self.post_norm:
            x = layer_norm(vm["post_layernorm"], x, cfg.layer_norm_eps)
        return x

    def _attention(self, p, x, mask):
        N = x.shape[0]
        q = linear(p["q_proj"], x).reshape(N, self.num_heads, self.head_dim)
        k = linear(p["k_proj"], x).reshape(N, self.num_heads, self.head_dim)
        v = linear(p["v_proj"], x).reshape(N, self.num_heads, self.head_dim)
        out = sdpa(q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
                   v.transpose(1, 0, 2)[None], self.scale, mask)
        out = out[0].transpose(1, 0, 2).reshape(N, -1)
        return linear(p["out_proj"], out)


class LanguageModel(_LlamaLM):
    pass


_QKV_RE = re.compile(
    r"\.self_attn\.qkv_proj\.(weight|bias)$")
_GU_RE = re.compile(r"\.mlp\.gate_up_proj\.(weight|bias)$")


class Model:
    CONFIG_CLS = ModelConfig

    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config.text_config, config)
        self.vision_tower = VisionModel(config.vision_config,
                                        config.mm_vision_select_layer)

    def vision_features(self, params, pixel_values, segment_ids, pos_idx,
                        pos_weights):
        hidden = self.vision_tower(
            params["vision_tower"], pixel_values, segment_ids, pos_idx,
            pos_weights)
        mp = params["mm_projector"]
        x = jax.nn.gelu(linear(mp["linear_1"], hidden), approximate=False)
        return linear(mp["linear_2"], x)

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,  # [N, C*P*P] flat packed
        segment_ids=None, pos_idx=None, pos_weights=None,
        image_features: Optional[jax.Array] = None,
        **aux,
    ) -> jax.Array:
        # -200 sentinels would break the embed gather; treat any negative
        # id as an image placeholder slot
        ids = jnp.where(input_ids < 0, 0, input_ids)
        embeds = self.language_model.embed(params["language_model"], ids)
        if pixel_values is None and image_features is None:
            return embeds
        feats = (image_features if image_features is not None
                 else self.vision_features(params, pixel_values, segment_ids,
                                           pos_idx, pos_weights))
        # one placeholder slot per patch feature (prepare step expands the
        # single -200 to the per-image patch count)
        return merge_input_ids_with_image_features(
            IMAGE_TOKEN_INDEX, -1, feats, embeds, input_ids)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache,
                                            position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        ids = np.where(np.asarray(input_ids) < 0, 0, np.asarray(input_ids))
        return text_position_ids(ids, attention_mask)

    def vision_aux_inputs(self, grid_thw) -> dict:
        grids = [(int(r[-2]), int(r[-1])) for r in np.asarray(grid_thw)]
        side = self.vision_tower.side
        idx, wgt = bicubic_pos_plan(grids, side, side)
        segs = np.concatenate(
            [np.full(h * w, i, np.int32) for i, (h, w) in enumerate(grids)])
        return {"segment_ids": segs, "pos_idx": idx, "pos_weights": wgt}

    def sanitize(self, weights: dict) -> dict:
        tc = self.config.text_config
        D = tc.hidden_size
        hd = tc.head_dim or D // tc.num_attention_heads
        kvd = tc.num_key_value_heads * hd
        out = {}
        for k, v in weights.items():
            if "position_ids" in k or "rotary_emb.inv_freq" in k:
                continue
            if k.startswith("model.vision_tower."):
                k = k[len("model."):]
            if k.startswith("vision_tower.vision_tower."):
                k = k[len("vision_tower."):]
            if k.startswith("model.mm_projector."):
                k = k[len("model."):]
            m = _QKV_RE.search(k)
            if m and k.startswith(("model.layers.",
                                   "language_model.model.layers.")):
                stem = k[: m.start()] + ".self_attn."
                if not stem.startswith("language_model."):
                    stem = "language_model." + stem
                suf = m.group(1)
                out[stem + "q_proj." + suf] = v[: tc.num_attention_heads * hd]
                out[stem + "k_proj." + suf] = v[
                    tc.num_attention_heads * hd:
                    tc.num_attention_heads * hd + kvd]
                out[stem + "v_proj." + suf] = v[
                    tc.num_attention_heads * hd + kvd:]
                continue
            m = _GU_RE.search(k)
            if m and "layers." in k:
                stem = k[: m.start()] + ".mlp."
                if not stem.startswith("language_model."):
                    stem = "language_model." + stem
                half = v.shape[0] // 2
                out[stem + "gate_proj." + m.group(1)] = v[:half]
                out[stem + "up_proj." + m.group(1)] = v[half:]
                continue
            if k.startswith(("vision_tower.", "mm_projector.")):
                out[k] = v
                continue
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return ("language_model.model.layers",
                "vision_tower.vision_model.encoder.layers")


__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig",
           "LanguageModel", "VisionModel"]
