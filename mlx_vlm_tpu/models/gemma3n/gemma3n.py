"""Gemma3n multimodal: MobileNetV5 vision + conformer audio over the
altup/per-layer-input text decoder.

Role parity: reference mlx_vlm/models/gemma3n/gemma3n.py —
Gemma3nMultimodalEmbedder:45 (hard id / soft feature paths, projection +
scale-free post norm), vision soft tokens via NCHW reshape * sqrt(D)
(get_image_features:238), audio features padded to
audio_soft_tokens_per_image with the embedder's last hard token
(get_input_embeddings:192-213), masked scatter at modality token ids.
"""

from __future__ import annotations

import dataclasses
import inspect
from typing import List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import linear, rms_norm
from ..gemma3n_text.gemma3n_text import (LanguageModel, TextConfig,
                                         _weightless_rms)
from ..gemma3n_text.gemma3n_text import Model as _TextModel
from ..llama.llama import text_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from .audio import AudioConfig, AudioModel
from .vision import VisionConfig, VisionTower


@dataclasses.dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    audio_config: AudioConfig
    model_type: str = "gemma3n"
    image_token_id: int = 262145
    audio_token_id: int = 262273
    vision_soft_tokens_per_image: int = 256
    audio_soft_tokens_per_image: int = 188
    eos_token_id: Optional[Union[int, List[int]]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {})
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {})
        params["audio_config"] = AudioConfig.from_dict(
            params.get("audio_config", {}) or {})
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


def _mm_embed_soft(p, x, eps):
    """Soft-feature path of Gemma3nMultimodalEmbedder (:45)."""
    y = rms_norm(p["soft_embedding_norm"], x, eps)
    y = linear(p["embedding_projection"], y)
    return _weightless_rms(y, eps)


def _mm_embed_hard(p, ids, eps):
    y = jnp.take(p["embedding"]["weight"], ids, axis=0)
    y = rms_norm(p["hard_embedding_norm"], y, eps)
    y = linear(p["embedding_projection"], y)
    return _weightless_rms(y, eps)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config.text_config, config)
        self.vision_tower = VisionTower(config.vision_config)
        self.audio_tower = AudioModel(config.audio_config)

    # ----------------------------------------------------------- features
    def vision_features(self, params, pixel_values: jax.Array) -> jax.Array:
        """[N_img, C, H, W] -> soft tokens [N_img*256, D_text]."""
        cfg = self.config
        feats = self.vision_tower(params["vision_tower"], pixel_values)
        B = feats.shape[0]
        E = cfg.vision_config.hidden_size
        # NCHW flatten (channel-major token order, reference :243-248)
        feats = feats.transpose(0, 3, 1, 2).reshape(
            B, E, cfg.vision_soft_tokens_per_image).transpose(0, 2, 1)
        feats = feats * (E ** 0.5)
        out = _mm_embed_soft(params["embed_vision"], feats,
                             cfg.vision_config.rms_norm_eps)
        return out.reshape(-1, out.shape[-1])

    def audio_features(self, params, input_features: jax.Array,
                       input_features_mask: Optional[jax.Array] = None):
        """[B, T, n_mel] -> padded soft tokens [B*188, D_text]."""
        cfg = self.config
        pad_mask = (None if input_features_mask is None
                    else ~input_features_mask.astype(bool))
        enc, enc_mask = self.audio_tower(params["audio_tower"],
                                         input_features, pad_mask)
        soft = _mm_embed_soft(params["embed_audio"], enc,
                              cfg.audio_config.rms_norm_eps)
        pad_emb = _mm_embed_hard(
            params["embed_audio"],
            jnp.asarray([cfg.audio_config.vocab_size - 1]),
            cfg.audio_config.rms_norm_eps)
        soft = jnp.where(enc_mask[..., None], pad_emb[None], soft)
        B, T, D = soft.shape
        extra = cfg.audio_soft_tokens_per_image - T
        if extra > 0:
            pad_rows = jnp.broadcast_to(pad_emb[None], (B, extra, D))
            soft = jnp.concatenate([soft, pad_rows], axis=1)
        else:
            soft = soft[:, :cfg.audio_soft_tokens_per_image]
        return soft.reshape(-1, D)

    # ------------------------------------------------------------- embeds
    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,
        input_features: Optional[jax.Array] = None,
        input_features_mask: Optional[jax.Array] = None,
        **aux,
    ) -> jax.Array:
        cfg = self.config
        tc = cfg.text_config
        embeds = self.language_model.embed(params["language_model"],
                                           input_ids)
        D = tc.hidden_size
        main, tail = embeds[..., :D], embeds[..., D:]
        # hard multimodal-vocab embeds (reference :140-160)
        v_off = cfg.vision_config.vocab_offset
        a_off = cfg.audio_config.vocab_offset
        vis_mask = (input_ids >= v_off) & (input_ids < a_off)
        aud_mask = input_ids >= a_off
        if "embed_vision" in params:
            vis_ids = jnp.where(vis_mask, input_ids - v_off, 0)
            hard_v = _mm_embed_hard(params["embed_vision"], vis_ids,
                                    cfg.vision_config.rms_norm_eps)
            main = jnp.where(vis_mask[..., None], hard_v.astype(main.dtype),
                             main)
        if "embed_audio" in params:
            aud_ids = jnp.where(aud_mask, input_ids - a_off, 0)
            hard_a = _mm_embed_hard(params["embed_audio"], aud_ids,
                                    cfg.audio_config.rms_norm_eps)
            main = jnp.where(aud_mask[..., None], hard_a.astype(main.dtype),
                             main)
        if pixel_values is not None:
            feats = self.vision_features(params, pixel_values)
            main = merge_input_ids_with_image_features(
                cfg.image_token_id, -1, feats, main, input_ids)
        if input_features is not None:
            afeats = self.audio_features(params, input_features,
                                         input_features_mask)
            main = merge_input_ids_with_image_features(
                cfg.audio_token_id, -1, afeats, main, input_ids)
        return jnp.concatenate([main, tail], axis=-1)

    def audio_aux_inputs(self, feats_np, lens):
        mask = np.zeros(feats_np.shape[:2], bool)
        for i, n in enumerate(lens):
            mask[i, :n] = True
        return {"input_features": feats_np, "input_features_mask": mask}

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
        mm_roots = ("vision_tower.", "audio_tower.", "embed_vision.",
                    "embed_audio.")
        out = {}
        text = {}
        for k, v in weights.items():
            for root in mm_roots:
                for pref in ("model.", "model.language_model.", ""):
                    if k.startswith(pref + root):
                        k = k[len(pref):]
                        break
            if k.startswith(mm_roots):
                out[k] = v
            else:
                text[k] = v
        out.update(_TextModel.sanitize(text))
        vt = {k: v for k, v in out.items() if k.startswith("vision_tower.")}
        at = {k: v for k, v in out.items() if k.startswith("audio_tower.")}
        out = {k: v for k, v in out.items()
               if not k.startswith(("vision_tower.", "audio_tower."))}
        out.update(VisionTower.sanitize(vt))
        out.update(AudioModel.sanitize(at))
        return out

    @property
    def stack_patterns(self):
        return (
            "language_model.model.layers",
            "audio_tower.conformer",
        )
