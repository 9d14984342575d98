"""Nemotron-Nano Omni: RADIO ViT + Parakeet conformer audio over the
Nemotron-H hybrid (mamba2/attention/MoE) decoder.

Role parity: reference mlx_vlm/models/nemotron_h_nano_omni —
Model (nemotron_h_nano_omni.py:57, VisionProjection:20, pixel_shuffle:163,
extract_feature:199, extract_video_feature:210, _merge_features:87,
sanitize:312), LanguageModel (language.py:14 riding models/nemotron_h),
VisionModel (vision.py), SoundEncoder/SoundProjection (audio.py).

TPU design: the decoder rides the existing nemotron_h per-type scan
stacks; vision + audio towers are their own lax.scans; ragged audio clips
are padded to one mel batch and the projected features gathered by a
host-built index (phi4mm pattern) so the embed program stays static.
"""

from __future__ import annotations

import inspect
import types
from dataclasses import dataclass
from typing import Any, List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import linear, rms_norm
from ..llama.llama import text_position_ids
from ..nemotron_h.config import ModelConfig as TextConfig
from ..nemotron_h.language import _TYPE_KEY, LanguageModel as _NHLanguage
from ..nemotron_h.nemotron_h import Model as _NHModel
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from .audio import (
    AudioConfig,
    SoundFeatureExtractor,
    parakeet_encode,
    sanitize_sound,
    sound_project,
    subsampling_output_length,
)
from .vision import VisionConfig, VisionModel


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig = None
    vision_config: VisionConfig = None
    sound_config: Optional[AudioConfig] = None
    model_type: str = "nemotron_h_nano_omni"
    downsample_ratio: float = 0.5
    ps_version: str = "v1"
    projector_hidden_size: int = 4096
    vit_hidden_size: int = 1280
    video_temporal_patch_size: int = 2
    video_pruning_rate: float = 0.0
    img_context_token_id: Optional[int] = None
    video_context_token_id: Optional[int] = None
    sound_context_token_id: Optional[int] = None
    image_token_index: Optional[int] = None
    eos_token_id: Optional[Union[int, List[int]]] = None

    @classmethod
    def from_dict(cls, params: dict) -> "ModelConfig":
        params = dict(params or {})
        text = params.pop("text_config", None) or params.pop("llm_config", {})
        sound = params.pop("sound_config", None)
        cfg = cls(
            text_config=TextConfig.from_dict(dict(text)),
            vision_config=VisionConfig.from_dict(
                dict(params.pop("vision_config", {}) or {})),
            sound_config=AudioConfig.from_dict(sound) if sound else None,
            **{k: v for k, v in params.items()
               if k in inspect.signature(cls).parameters},
        )
        if cfg.image_token_index is None:
            cfg.image_token_index = cfg.img_context_token_id
        return cfg


class LanguageModel(_NHLanguage):
    pass


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config.text_config, config)
        self.vision_model = VisionModel(config.vision_config)
        self._ds = config.downsample_ratio
        self._sound_fx = (SoundFeatureExtractor(config.sound_config)
                          if config.sound_config else None)

    # ------------------------------------------------------------- vision
    def pixel_shuffle(self, x: jax.Array, scale: float) -> jax.Array:
        """[B, W, H, C] spatial-to-channel fold (reference
        pixel_shuffle:163)."""
        B, W, H, C = x.shape
        x = x.reshape(B, W, int(H * scale), int(C / scale))
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(B, int(H * scale), int(W * scale),
                      int(C / (scale * scale)))
        if self.config.ps_version != "v1":
            x = x.transpose(0, 2, 1, 3)
        return x

    def _project(self, params: dict, x: jax.Array) -> jax.Array:
        """RMSNorm -> linear -> relu^2 -> linear (reference
        VisionProjection:20)."""
        mp = params["mlp1"]["layers"]
        x = rms_norm(mp["0"], x, 1e-5)
        x = jnp.square(jax.nn.relu(linear(mp["1"], x)))
        return linear(mp["3"], x)

    def _vit_to_tokens(self, params: dict, feats: jax.Array,
                       patch_h: int, patch_w: int) -> jax.Array:
        feats = feats.reshape(feats.shape[0], patch_h, patch_w, -1)
        feats = self.pixel_shuffle(feats, self._ds)
        feats = feats.reshape(feats.shape[0], -1, feats.shape[-1])
        return self._project(params, feats)

    def extract_feature(self, params: dict,
                        pixel_values: jax.Array) -> jax.Array:
        """[N, 3, H, W] -> [N, tokens, D_llm] (reference
        extract_feature:199)."""
        if pixel_values.ndim == 3:
            pixel_values = pixel_values[None]
        ps = self.config.vision_config.patch_size
        vit = self.vision_model(params["vision_model"], pixel_values)
        return self._vit_to_tokens(params, vit,
                                   pixel_values.shape[-2] // ps,
                                   pixel_values.shape[-1] // ps)

    def extract_video_feature(self, params: dict,
                              frames: jax.Array) -> jax.Array:
        """[F, 3, H, W] -> grouped tubelet tokens (reference
        extract_video_feature:210)."""
        T = self.config.video_temporal_patch_size
        F, C, H, W = frames.shape
        if F % T:
            pad = T - F % T
            frames = jnp.concatenate(
                [frames, jnp.broadcast_to(frames[-1:], (pad, C, H, W))], 0)
            F = frames.shape[0]
        x = frames.reshape(F // T, T * C, H, W)
        vit = self.vision_model(params["vision_model"], x,
                                use_video_embedder=True)
        ps = self.config.vision_config.patch_size
        return self._vit_to_tokens(params, vit, H // ps, W // ps)

    # -------------------------------------------------------------- audio
    def audio_features(self, params, input_audio_embeds, audio_feat_idx):
        """[A, T, n_mels] padded mel -> gathered valid rows [N, D_llm]."""
        enc = parakeet_encode(params["sound_encoder"]["encoder"],
                              self.config.sound_config, input_audio_embeds)
        proj = sound_project(params["sound_projection"], enc)
        A, T, D = proj.shape
        return jnp.take(proj.reshape(A * T, D), audio_feat_idx, axis=0)

    def audio_aux_inputs(self, input_features,
                         feature_lens: List[int]) -> dict:
        """Pad mel clips to one batch; gather index drops padded rows."""
        cfg = self.config.sound_config
        fa = np.asarray(input_features, np.float32)
        if fa.ndim == 2:
            fa = fa[None]
        if fa.shape[1] == cfg.num_mel_bins and \
                fa.shape[2] != cfg.num_mel_bins:
            fa = fa.transpose(0, 2, 1)
        t_sub = subsampling_output_length(cfg, fa.shape[1])
        idx = np.concatenate([
            np.arange(subsampling_output_length(cfg, int(ln)),
                      dtype=np.int32) + a * t_sub
            for a, ln in enumerate(feature_lens)
        ])
        return {"input_audio_embeds": fa, "audio_feat_idx": idx}

    # ------------------------------------------------------------- embeds
    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,
        pixel_values_videos: Optional[jax.Array] = None,
        input_audio_embeds: Optional[jax.Array] = None,
        audio_feat_idx: Optional[jax.Array] = None,
        **aux,
    ) -> jax.Array:
        cfg = self.config
        embeds = self.language_model.embed(params["language_model"],
                                           input_ids)
        if pixel_values is not None:
            feats = self.extract_feature(params, pixel_values)
            embeds = merge_input_ids_with_image_features(
                cfg.img_context_token_id, cfg.img_context_token_id,
                feats.reshape(-1, feats.shape[-1]), embeds, input_ids)
        if pixel_values_videos is not None:
            feats = self.extract_video_feature(params, pixel_values_videos)
            embeds = merge_input_ids_with_image_features(
                cfg.img_context_token_id, cfg.img_context_token_id,
                feats.reshape(-1, feats.shape[-1]), embeds, input_ids)
        if input_audio_embeds is not None:
            afeats = self.audio_features(params, input_audio_embeds,
                                         audio_feat_idx)
            embeds = merge_input_ids_with_image_features(
                cfg.sound_context_token_id, cfg.sound_context_token_id,
                afeats, embeds, input_ids)
        return embeds

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache,
                                            position_ids)
        return self.language_model.logits(lm, hidden), cache

    # ---------------------------------------------------------- host-side
    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return text_position_ids(input_ids, attention_mask)

    def vision_aux_inputs(self, grid_thw) -> dict:
        return {}

    # ------------------------------------------------------------ sanitize
    def sanitize(self, weights: dict) -> dict:
        lm_w, rest = {}, {}
        for k, v in weights.items():
            if k.startswith("language_model."):
                lm_w[k[len("language_model."):]] = v
            else:
                rest[k] = v
        shim = types.SimpleNamespace(config=self.config.text_config)
        out = _NHModel.sanitize(shim, lm_w) if lm_w else {}
        for k, v in sanitize_sound(rest).items():
            if k.startswith("mlp1."):
                for i in ("0", "1", "3"):
                    k = k.replace(f"mlp1.{i}.", f"mlp1.layers.{i}.")
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        lm = tuple(f"language_model.model.{v}" for v in _TYPE_KEY.values())
        return lm + (
            ("language_model.model.moe_layers.mixer.experts", 1),
            "vision_model.radio_model.model.blocks",
            "sound_encoder.encoder.layers",
        )


__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig",
           "AudioConfig", "LanguageModel", "VisionModel",
           "SoundFeatureExtractor"]
