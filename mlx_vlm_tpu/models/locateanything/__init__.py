"""LocateAnything: MoonViT tower + qwen2 decoder with box/coord tokens.

Role parity: reference mlx_vlm/models/locateanything/ — the vision tower
is kimi_vl's MoonViT (bicubic-interpolated learned pos emb, packed 2-D
rope, wqkv/wo blocks, vision.py:301) whose merged 2x2 windows feed a
LayerNorm + 2-layer gelu projector (locateanything.py:13); the decoder
is plain qwen2; box/ref/coord special tokens decode to detections in
the PBD postprocessor (pbd.py) — the text path here generates the same
token stream.
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
from ..kimi_vl.kimi_vl import (MoonViT, VisionConfig as _KimiVision,
                               bicubic_pos_plan, rope2d_angles)
from ..llama.config import TextConfig as _LlamaText
from ..llama.language import LanguageModel
from ..llama.llama import text_position_ids
from ..mistral3.mistral3 import patch_merge_plan
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features


@dataclass
class TextConfig(_LlamaText):
    model_type: str = "qwen2"


@dataclass
class VisionConfig(_KimiVision):
    model_type: str = "moonvit"

    @classmethod
    def from_dict(cls, d: dict):
        d = dict(d)
        # locateanything naming -> MoonViT naming
        d.setdefault("embed_dim", d.get("hidden_size", 1152))
        d.setdefault("hidden_size", d.get("embed_dim"))
        d.setdefault("depth", d.get("num_hidden_layers", 27))
        d.setdefault("num_heads", d.get("num_attention_heads", 16))
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in d.items() if k in allowed})


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "locateanything"
    image_token_index: int = 151665
    box_start_token_id: int = 151668
    box_end_token_id: int = 151669
    eos_token_id: Optional[Union[int, List[int]]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {})
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {})
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = MoonViT(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)
        self.mk = tuple(config.vision_config.merge_kernel_size)

    def vision_features(self, params, pixel_values, rotary_freqs,
                        segment_ids, pos_idx, pos_weights, merge_idx):
        blocks = self.vision_tower(
            params["vision_tower"], pixel_values, rotary_freqs,
            segment_ids, pos_idx, pos_weights, merge_idx)  # [N_m, mk*mk, E]
        mp = params["multi_modal_projector"]
        x = blocks.reshape(blocks.shape[0], -1)
        x = layer_norm(mp["layer_norm"], x)
        x = jax.nn.gelu(linear(mp["linear_1"], x), approximate=False)
        return linear(mp["linear_2"], x)

    def get_input_embeddings(self, params, input_ids, pixel_values=None,
                             rotary_freqs=None, segment_ids=None,
                             pos_idx=None, pos_weights=None,
                             merge_idx=None, image_features=None, **aux):
        embeds = self.language_model.embed(params["language_model"],
                                           input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        if image_features is None:
            image_features = self.vision_features(
                params, pixel_values, rotary_freqs, segment_ids, pos_idx,
                pos_weights, merge_idx)
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

    def vision_aux_inputs(self, grid_thw) -> dict:
        cfg = self.config.vision_config
        grids = [(int(r[-2]), int(r[-1])) for r in np.asarray(grid_thw)]
        idx, wgt = bicubic_pos_plan(
            grids, cfg.init_pos_emb_height, cfg.init_pos_emb_width)
        segs = np.concatenate(
            [np.full(h * w, i, np.int32) for i, (h, w) in enumerate(grids)])
        return {
            "rotary_freqs": rope2d_angles(
                grids, cfg.embed_dim // cfg.num_heads),
            "segment_ids": segs,
            "pos_idx": idx,
            "pos_weights": wgt,
            "merge_idx": patch_merge_plan(grids, self.mk[0]),
        }

    def sanitize(self, weights: dict) -> dict:
        out = {}
        tie = self.config.text_config.tie_word_embeddings
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            if tie and k == "language_model.lm_head.weight":
                continue  # tied head (reference sanitize:127)
            if k.startswith("vision_model."):
                k = k.replace("vision_model.encoder.",
                              "vision_tower.").replace("vision_model.",
                                                       "vision_tower.")
            elif k.startswith("mlp1."):
                k = (k.replace("mlp1.0.",
                               "multi_modal_projector.layer_norm.")
                     .replace("mlp1.1.", "multi_modal_projector.linear_1.")
                     .replace("mlp1.3.", "multi_modal_projector.linear_2."))
            elif k.startswith(("model.", "lm_head.")) and not k.startswith(
                    "language_model."):
                k = "language_model." + k
            out[k] = v
        vt = {k[len("vision_tower."):]: v for k, v in out.items()
              if k.startswith("vision_tower.")}
        vt = MoonViT.sanitize(vt)
        out = {k: v for k, v in out.items()
               if not k.startswith("vision_tower.")}
        out.update({"vision_tower." + k: v for k, v in vt.items()})
        return out

    @property
    def stack_patterns(self):
        return ("vision_tower.blocks", "language_model.model.layers")
