"""Phi-3-Vision: CLIP-L/14-336 tower + HD transform + phi3 decoder.

Role parity: reference mlx_vlm/models/phi3_v — HD transform (2x2 pixel
unshuffle, sub_GN row separators, glb_GN between sub/global):vision.py:207-
258, penultimate CLIP layer features:vision.py:223, negative input_ids mark
image spans:phi3_v.py:210, fused qkv_proj/gate_up_proj (phi3 decoder,
phi3/language.py:28-46), longrope (su) scaling via core/rope.py.

TPU design: the per-image HD assembly runs as a (static-shape) Python loop
over image_sizes — host metadata, one trace per tile layout; the tower and
decoder are the shared scanned CLIP/llama stacks (fused projections are
split at load).
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import linear
from ..clip_vision import ClipVisionTower
from ..clip_vision import VisionConfig as _ClipVisionConfig
from ..llama.config import TextConfig as _LlamaText
from ..llama.language import LanguageModel
from ..llama.llama import text_position_ids

STACK_PATTERNS = (
    "language_model.model.layers",
    "vision_tower.vision_model.encoder.layers",
)


@dataclass
class TextConfig(_LlamaText):
    model_type: str = "phi3_v"
    original_max_position_embeddings: int = 4096


@dataclass
class VisionConfig(_ClipVisionConfig):
    model_type: str = "clip_vision_model"
    num_hidden_layers: int = 24
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "phi3_v"
    vocab_size: int = 32064
    eos_token_id: Optional[List[int]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        text = dict(params.get("text_config", {}) or {})
        # phi3_v ships a flat config: text fields live at the top level
        for k in list(params):
            if k in _LlamaText.__dataclass_fields__ and k not in text:
                text[k] = params[k]
        if text.get("rope_scaling") and "original_max_position_embeddings" \
                not in text["rope_scaling"]:
            text["rope_scaling"] = dict(text["rope_scaling"])
            text["rope_scaling"]["original_max_position_embeddings"] = (
                params.get("original_max_position_embeddings", 4096)
            )
        params["text_config"] = TextConfig.from_dict(text)
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {}
        )
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


def _hd_transform(feats, glb_GN, sub_GN, h: int, w: int, H: int):
    """Reference vision.py:226-254 for one image with an (h, w) tile grid.

    feats: [1 + h*w, H*H, C] (global tile first).  Returns
    [(h*w+1)*(H/2)^2-ish tokens, 4C] with separator embeddings."""
    C = feats.shape[-1]
    H2 = H // 2

    def unshuffle(img, n):
        x = img.reshape(n, H2, 2, H2, 2, C)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x  # [n, H2, H2, 2, 2, C]

    glb = unshuffle(feats[:1], 1).reshape(1, H2, H2, 4 * C)
    glb = jnp.concatenate(
        [glb, jnp.tile(sub_GN.reshape(1, 1, 1, 4 * C), (1, H2, 1, 1))], axis=2
    ).reshape(-1, 4 * C)
    sub = unshuffle(feats[1:1 + h * w], h * w)
    sub = sub.reshape(h, w, H2, H2, 4 * C).transpose(0, 2, 1, 3, 4)
    sub = sub.reshape(1, h * H2, w * H2, 4 * C)
    sub = jnp.concatenate(
        [sub, jnp.tile(sub_GN.reshape(1, 1, 1, 4 * C), (1, h * H2, 1, 1))],
        axis=2,
    ).reshape(-1, 4 * C)
    return jnp.concatenate([sub, glb_GN.reshape(1, 4 * C), glb], axis=0)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = ClipVisionTower(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)
        self.grid = config.vision_config.image_size // config.vision_config.patch_size

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,  # may contain NEGATIVE ids at image spans
        pixel_values: Optional[jax.Array] = None,  # [n_tiles, C, 336, 336]
        image_tiles: Optional[tuple] = None,  # ((h, w), ...) static
        **aux,
    ) -> jax.Array:
        ids_clipped = jnp.maximum(input_ids, 0)
        embeds = self.language_model.embed(params["language_model"], ids_clipped)
        if pixel_values is None:
            return embeds
        tower = self.vision_tower(
            params["vision_tower"], pixel_values.astype(embeds.dtype)
        )
        feats = tower.hidden_states[-2][:, 1:]  # penultimate, no CLS
        ve = params["vision_embed"]
        parts = []
        idx = 0
        for (h, w) in image_tiles:
            n = 1 + h * w
            parts.append(
                _hd_transform(feats[idx:idx + n], ve["glb_GN"], ve["sub_GN"],
                              h, w, self.grid)
            )
            idx += n
        x = jnp.concatenate(parts, axis=0)
        x = linear(ve["img_projection"]["0"], x)
        x = jax.nn.gelu(x, approximate=False)
        x = linear(ve["img_projection"]["2"], x)
        # scatter at negative-id positions (reference phi3_v.py:210)
        B, S, D = embeds.shape
        is_img = (input_ids < 0).reshape(-1)
        fidx = jnp.clip(jnp.cumsum(is_img.astype(jnp.int32)) - 1, 0,
                        x.shape[0] - 1)
        gathered = jnp.take(x, fidx, axis=0)
        merged = jnp.where(is_img[:, None], gathered.astype(embeds.dtype),
                           embeds.reshape(-1, D))
        return merged.reshape(B, S, D)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache, position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return text_position_ids(input_ids, attention_mask)

    def vision_aux_inputs(self, grid_thw):
        """grid_thw rows: (h_tiles, w_tiles) per image -> static tuple."""
        return {"image_tiles": tuple(
            (int(r[-2]), int(r[-1])) for r in np.asarray(grid_thw)
        )}

    def sanitize(self, weights: dict) -> dict:
        tc = self.config.text_config
        hd = tc.head_dim or tc.hidden_size // tc.num_attention_heads
        nq = tc.num_attention_heads * hd
        nkv = tc.num_key_value_heads * hd
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k or "position_ids" in k:
                continue
            k = k.replace("model.vision_embed_tokens.img_processor.",
                          "vision_tower.")
            k = k.replace("model.vision_embed_tokens.", "vision_embed.")
            if k.startswith("model.") or k.startswith("lm_head"):
                k = "language_model." + k
            # split fused projections for the shared llama decoder
            if k.endswith("self_attn.qkv_proj.weight"):
                stem = k[: -len("qkv_proj.weight")]
                out[stem + "q_proj.weight"] = v[:nq]
                out[stem + "k_proj.weight"] = v[nq:nq + nkv]
                out[stem + "v_proj.weight"] = v[nq + nkv:]
                continue
            if k.endswith("mlp.gate_up_proj.weight"):
                stem = k[: -len("gate_up_proj.weight")]
                half = v.shape[0] // 2
                out[stem + "gate_proj.weight"] = v[:half]
                out[stem + "up_proj.weight"] = v[half:]
                continue
            out[k] = v
        vt = {k: v for k, v in out.items() if k.startswith("vision_tower.")}
        vt = ClipVisionTower.sanitize(vt)
        out = {k: v for k, v in out.items() if not k.startswith("vision_tower.")}
        out.update(vt)
        return out

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
