"""Qwen3-Omni-MoE (thinker): audio + vision + MoE text.

Role parity: reference mlx_vlm/models/qwen3_omni_moe — thinker.py (audio /
image / video feature merge:135-289), qwen3_omni_moe.py (sanitize
composition:61-70).  The talker / code2wav speech-output stack is not yet
implemented; text generation from audio+vision input is (the reference's
default path when enable_audio_output=False).

TPU design: reuses the qwen3_vl deepstack vision tower and the qwen3_vl_moe
decoder verbatim; the audio tower contributes features scattered at
audio_token_id positions through the same vectorized merge.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from ..qwen3_vl.vision import VisionModel
from ..qwen3_vl_moe.qwen3_vl_moe import MoELanguageModel
from .audio import AudioModel, audio_chunk_plan, chunk_mel_features
from .config import AudioConfig, ModelConfig, TextConfig, VisionConfig  # noqa: F401

STACK_PATTERNS = (
    "language_model.model.layers",
    "vision_tower.blocks",
    "audio_tower.layers",
)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = VisionModel(config.vision_config)
        self.audio_tower = AudioModel(config.audio_config)
        self.language_model = MoELanguageModel(config.text_config, config)

    def vision_features(self, params, pixel_values, rotary_freqs, segment_ids,
                        pos_idx, pos_weights):
        return self.vision_tower(
            params["vision_tower"], pixel_values, rotary_freqs, segment_ids,
            pos_idx, pos_weights,
        )

    def audio_features(self, params, audio_chunks, audio_gather_idx,
                       audio_segment_ids):
        return self.audio_tower(
            params["audio_tower"], audio_chunks, audio_gather_idx,
            audio_segment_ids,
        )

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,
        rotary_freqs: Optional[jax.Array] = None,
        segment_ids: Optional[jax.Array] = None,
        pos_idx: Optional[jax.Array] = None,
        pos_weights: Optional[jax.Array] = None,
        audio_chunks: Optional[jax.Array] = None,
        audio_gather_idx: Optional[jax.Array] = None,
        audio_segment_ids: Optional[jax.Array] = None,
        image_features: Optional[jax.Array] = None,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"], input_ids)
        cfg = self.config
        merged = embeds
        ds = None
        if image_features is not None or pixel_values is not None:
            if image_features is not None:
                feats, ds = image_features, None
            else:
                feats, ds = self.vision_features(
                    params, pixel_values, rotary_freqs, segment_ids,
                    pos_idx, pos_weights,
                )
            merged = merge_input_ids_with_image_features(
                cfg.image_token_id, cfg.video_token_id, feats, merged, input_ids
            )
        if audio_chunks is not None:
            afeats = self.audio_features(
                params, audio_chunks.astype(embeds.dtype),
                audio_gather_idx, audio_segment_ids,
            )
            merged = merge_input_ids_with_image_features(
                cfg.audio_token_id, -1, afeats, merged, input_ids
            )
        if ds is None:
            return merged
        zeros = jnp.zeros_like(embeds)
        packed = [merged]
        for i in range(ds.shape[0]):
            packed.append(
                merge_input_ids_with_image_features(
                    cfg.image_token_id, cfg.video_token_id, ds[i], zeros,
                    input_ids,
                )
            )
        return jnp.concatenate(packed, axis=-1)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache, position_ids)
        return self.language_model.logits(lm, hidden), cache

    # ----------------------------------------------------------------- host
    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        from ..qwen2_vl.language import mrope_position_ids

        return mrope_position_ids(
            input_ids, image_grid_thw, video_grid_thw, attention_mask,
            merge=self.config.vision_config.spatial_merge_size,
            image_token_id=self.config.image_token_id,
            video_token_id=self.config.video_token_id,
        )

    def vision_aux_inputs(self, grid_thw: np.ndarray) -> dict:
        return self.vision_tower.aux_inputs(grid_thw)

    def audio_aux_inputs(self, input_features, feature_lens: List[int]) -> dict:
        """Host-side chunking + window plan for the audio tower."""
        cfg = self.config.audio_config
        gather, segs, _ = audio_chunk_plan(feature_lens, cfg)
        return {
            "audio_chunks": chunk_mel_features(input_features, feature_lens, cfg),
            "audio_gather_idx": gather,
            "audio_segment_ids": segs,
        }

    def sanitize(self, weights: dict) -> dict:
        def transform(key: str) -> str:
            if key.startswith("thinker."):
                key = key[len("thinker."):]
            if key.startswith("model.") or key.startswith("lm_head"):
                # thinker.model.* is the text stack
                if key.startswith("model."):
                    key = "language_model." + key
                else:
                    key = "language_model." + key
            if key.startswith("visual."):
                key = "vision_tower." + key[len("visual."):]
                key = (key.replace("merger.ln_q", "merger.norm")
                       .replace("merger.mlp.0", "merger.linear_fc1")
                       .replace("merger.mlp.2", "merger.linear_fc2"))
            return key

        # talker / code2wav weights are not loaded (text-only thinker)
        weights = {
            transform(k): v for k, v in weights.items()
            if not k.startswith(("talker.", "code2wav", "token2wav"))
        }
        from ..qwen3_vl_moe.qwen3_vl_moe import Model as _MoE

        weights = _MoE.sanitize(weights)
        at = {k: v for k, v in weights.items() if k.startswith("audio_tower.")}
        at = AudioModel.sanitize(at)
        weights = {k: v for k, v in weights.items()
                   if not k.startswith("audio_tower.")}
        weights.update(at)
        return weights

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
