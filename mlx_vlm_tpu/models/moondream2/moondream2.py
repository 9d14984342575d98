"""Moondream2: SigLIP-class encoder + phi-style decoder, prompt-only chat.

Role parity: reference mlx_vlm/models/moondream2/moondream2.py — BOS-first
image insertion (get_input_embeddings:39: [BOS | image tokens | text]),
checkpoint key remap (sanitize:90), single- and multi-crop vision paths.

v1 deviation (documented): the reference gives [BOS|image] a bidirectional
prefix mask (:83); here image tokens attend causally — the language model
accepts `prefix_len` for callers that thread it, but the shared generate
path does not.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..llama.llama import text_position_ids
from .language import LanguageModel, TextConfig
from .vision import MoondreamVisionTower, VisionConfig

STACK_PATTERNS = (
    "language_model.model.layers",
    "vision.encoder.blocks",
)


@dataclasses.dataclass
class ModelConfig:
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "moondream2"
    eos_token_id: int = 0
    bos_token_id: int = 0

    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfig":
        return cls(
            text_config=TextConfig.from_dict(d.get("text_config", {})),
            vision_config=VisionConfig.from_dict(d.get("vision_config", {})),
            model_type=d.get("model_type", "moondream2"),
            eos_token_id=d.get("eos_token_id", 0),
            bos_token_id=d.get("bos_token_id", 0),
        )


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision = MoondreamVisionTower(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,  # [n_crops, H, W, 3]
        **aux,
    ) -> jax.Array:
        """[BOS | image features | remaining text] (reference :39 — the
        processor leaves vision-token room after BOS; with no image the ids
        embed directly)."""
        lm = params["language_model"]
        embeds = self.language_model.embed(lm, input_ids)
        if pixel_values is None:
            return embeds
        feats = self.vision.encode(params["vision"],
                                   pixel_values.astype(embeds.dtype))
        glob = feats[:1]
        # single-crop path: local reconstruction == the global crop
        # (reference vision.py:155 duplicates global when num_crops is None)
        img = self.vision.project(params["vision"], glob, glob)
        n_img = img.shape[1]
        bos = embeds[:, :1]
        text = embeds[:, 1 + n_img:] if embeds.shape[1] > 1 + n_img else (
            embeds[:, 1:1])
        return jnp.concatenate([bos, img.astype(embeds.dtype), text], axis=1)

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
        """HF moondream2 key remap (reference sanitize:90)."""
        out = {}
        for k, v in weights.items():
            if "position_ids" in k or k.startswith("region_model."):
                continue
            nk = k
            if nk.startswith("vision_encoder.encoder.model.visual."):
                nk = ("vision.encoder."
                      + nk[len("vision_encoder.encoder.model.visual."):])
                nk = nk.replace("patch_embed.linear.", "patch_emb.")
                nk = nk.replace("pos_embed", "pos_emb")
                nk = nk.replace(".norm1.", ".ln1.")
                nk = nk.replace(".norm2.", ".ln2.")
                nk = nk.replace("norm.", "post_ln.")
            elif nk.startswith("vision_encoder.projection.mlp."):
                nk = ("vision.proj_mlp."
                      + nk[len("vision_encoder.projection.mlp."):])
            elif nk == "text_model.transformer.embd.wte.weight":
                nk = "language_model.model.embed_tokens.weight"
            elif nk.startswith("text_model.transformer.h."):
                nk = "language_model.model.layers." + nk[
                    len("text_model.transformer.h."):]
                nk = nk.replace(".mixer.Wqkv.", ".attn.qkv.")
                nk = nk.replace(".mixer.out_proj.", ".attn.proj.")
            elif nk.startswith("text_model.lm_head.ln."):
                nk = ("language_model.model.post_ln."
                      + nk[len("text_model.lm_head.ln."):])
            elif nk.startswith("text_model.lm_head.linear."):
                nk = ("language_model.lm_head."
                      + nk[len("text_model.lm_head.linear."):])
            out[nk] = v
        return out

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
