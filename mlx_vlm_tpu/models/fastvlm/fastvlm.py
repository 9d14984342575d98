"""FastVLM (Apple): FastViT-HD conv tower + qwen2 decoder (llava glue).

Role parity: reference mlx_vlm/models/fastvlm/fastvlm.py — mlp2x_gelu
projector over the flattened final feature map (:14), LLaVA-style
image-token splice at image_token_index (-200) (:75), key remap
(sanitize:205) including the patch_embed -> patch_embed.blocks rename.
"""

from __future__ import annotations

import inspect
import re
from dataclasses import dataclass
from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import linear
from ..llama.config import TextConfig as _LlamaText
from ..llama.language import LanguageModel
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from .vision import VisionConfig, VisionModel


@dataclass
class TextConfig(_LlamaText):
    model_type: str = "qwen2"


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "fastvlm"
    image_token_index: int = -200
    mm_hidden_size: int = 3072
    mm_projector_type: str = "mlp2x_gelu"
    eos_token_id: Optional[Union[int, List[int]]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", params) or {})
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {})
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = VisionModel(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)
        m = re.match(r"^mlp(\d+)x_gelu$",
                     config.mm_projector_type or "mlp2x_gelu")
        self.proj_depth = int(m.group(1)) if m else 1

    def _project(self, params, feats):
        mp = params["mm_projector"]
        x = linear(mp["0"], feats)
        for d in range(1, self.proj_depth):
            x = linear(mp[str(2 * d)], jax.nn.gelu(x, approximate=False))
        return x

    def vision_features(self, params, pixel_values):
        x = self.vision_tower(params["vision_tower"], pixel_values)
        B, H, W, C = x.shape
        return self._project(params, x.reshape(B, H * W, C)).reshape(
            -1, self.config.text_config.hidden_size)

    def get_input_embeddings(self, params, input_ids, pixel_values=None,
                             image_features=None, **aux):
        embeds = self.language_model.embed(
            params["language_model"], jnp.maximum(input_ids, 0))
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
            if "vision_tower" in k:
                if "model.vision_tower" in k:
                    k = k.replace("model.vision_tower.vision_tower.model",
                                  "vision_tower.vision_model")
                    k = k.replace("patch_embed", "patch_embed.blocks")
            elif "mm_projector" in k:
                k = k.replace("model.", "")
            elif "language_model" not in k:
                k = "language_model." + k
            # stage blocks nest under .blocks for stacking: network.N.B.*
            m = re.match(
                r"^(vision_tower\.vision_model\.network\.\d+)\.(\d+)\.(.+)$",
                k)
            if m:
                k = f"{m.group(1)}.blocks.{m.group(2)}.{m.group(3)}"
            out[k] = v
        out = VisionModel.fold_bn(out)  # BN folds in torch OIHW layout
        import numpy as np

        for k, v in out.items():
            if ("vision_tower" in k and k.endswith(".weight")
                    and getattr(v, "ndim", 0) == 4):
                out[k] = np.transpose(np.asarray(v), (2, 3, 1, 0))
        return out

    @property
    def stack_patterns(self):
        stage_ids = [idx for kind, idx, _ in self.vision_tower.plan
                     if kind == "stage"]
        return tuple(
            f"vision_tower.vision_model.network.{i}.blocks"
            for i in stage_ids
        ) + ("language_model.model.layers",)
