"""Granite Vision: multi-layer CLIP features + granite (mup) decoder.

Role parity: reference mlx_vlm/models/granite_vision/granite_vision.py —
LlavaMultiModalProjector over CONCATENATED feature layers:14-38 (the
projector input is hidden_size * len(vision_feature_layer)), multi-layer
selection:92-98, granite text decoder (logit scaling / mup multipliers).
"""

from __future__ import annotations

import dataclasses
import inspect
from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import linear
from ..clip_vision import ClipVisionTower, VisionConfig
from ..granite.granite import LanguageModel as _GraniteLM
from ..granite.granite import TextConfig as _GraniteText
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features

STACK_PATTERNS = (
    "language_model.model.layers",
    "vision_tower.vision_model.encoder.layers",
)


@dataclasses.dataclass
class ModelConfig(BaseModelConfig):
    text_config: _GraniteText
    vision_config: VisionConfig
    model_type: str = "granite_vision"
    image_token_index: int = 49155
    vision_feature_select_strategy: str = "full"
    vision_feature_layer: Union[int, List[int]] = -1
    eos_token_id: Optional[List[int]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {})
        params["text_config"] = _GraniteText.from_dict(
            params.get("text_config", {}) or {})
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        vc = config.vision_config
        if vc.model_type in ("granite_vision", "granite_vision_model"):
            vc.model_type = "siglip_vision_model"
        self.vision_tower = ClipVisionTower(vc)
        self.language_model = _GraniteLM(config.text_config, config)

    def vision_features(self, params, pixel_values, **aux):
        hs = self.vision_tower(params["vision_tower"],
                               pixel_values).hidden_states
        layers = self.config.vision_feature_layer
        if isinstance(layers, int):
            layers = [layers]
        pool = [hs[i] for i in layers]
        if self.config.vision_feature_select_strategy == "default":
            pool = [h[:, 1:] for h in pool]
        sel = jnp.concatenate(pool, axis=-1)
        mp = params["multi_modal_projector"]
        feats = jax.nn.gelu(linear(mp["linear_1"], sel), approximate=False)
        feats = linear(mp["linear_2"], feats)
        return feats.reshape(-1, feats.shape[-1])

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,
        image_features: Optional[jax.Array] = None,
        **aux,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"],
                                           input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        feats = (image_features if image_features is not None
                 else self.vision_features(params, pixel_values))
        return merge_input_ids_with_image_features(
            self.config.image_token_index, -1, feats, embeds, input_ids)

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
            if "image_newline" in k or "rotary_emb.inv_freq" in k:
                continue
            if k.startswith("model.") and not k.startswith(
                    ("model.vision_tower.", "model.multi_modal_projector.")):
                k = "language_model." + k
            elif k.startswith("model."):
                k = k[len("model."):]
            elif k.startswith("lm_head"):
                k = "language_model." + k
            out[k] = v
        vt = {k: v for k, v in out.items() if k.startswith("vision_tower.")}
        vt = ClipVisionTower.sanitize(vt)
        out = {k: v for k, v in out.items()
               if not k.startswith("vision_tower.")}
        out.update(vt)
        return out

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
