"""Phi-4-multimodal (phi4mm): Phi-4 LM + SigLIP2-NaFlex vision + Conformer audio.

Role parity: reference mlx_vlm/models/phi4mm — Model (phi4mm.py:28),
LanguageModel (language.py:137, fused qkv/gate_up + partial rotary + tied
embeddings), VisionTower (vision.py:226, SigLIP2 NaFlex select_layer=-2),
ConformerEncoder/AudioProjection (audio.py — see ./audio.py), sanitize with
embed_tokens_extend remaps + per-modality LoRA (phi4mm.py:272-408).

TPU design decisions vs the reference:
- The LM rides the shared llama lax.scan decoder (fused qkv_proj /
  gate_up_proj split at sanitize, partial_rotary_factor=0.75 handled by the
  shared rope path) — same approach as models/phi4_siglip.
- Vision consumes FLAT-PACKED patches with per-image segment ids + a
  host-side BILINEAR position-embedding plan (the reference resizes the
  16x16 table per image with bilinear+antialias, vision.py:142); reuses the
  phi4_siglip NaFlex encoder with select_layer=-2.
- LoRA: the reference keeps base weights + vision/speech LoRA pairs and
  re-merges on every modality switch (phi4mm.py:418-500) — retrace-hostile
  on TPU.  We merge BOTH adapters into the base weights at load, exactly
  what the reference itself does before quantization (quant_predicate,
  phi4mm.py:508-519).
- Audio merge: consecutive audio placeholder tokens (id 200011) are
  scattered with projected conformer features via the shared one-hot merge;
  a host-built gather index drops per-clip padding rows so multi-clip
  batches stay static-shaped.
"""

from __future__ import annotations

import inspect
import math
import re
from dataclasses import dataclass, field
from typing import List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import linear
from ..llama.config import TextConfig as _LlamaText
from ..llama.language import LanguageModel as _LlamaLM
from ..llama.llama import text_position_ids
from ..phi4_siglip import VisionConfig as _SiglipVisionConfig
from ..phi4_siglip import VisionModel as _SiglipVision
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from .audio import AudioConfig, audio_project, conformer_encode, sanitize_audio

IMAGE_TOKEN_INDEX = -200  # reference config.py:76
AUDIO_TOKEN_INDEX = 200011  # reference config.py:77


@dataclass
class TextConfig(_LlamaText):
    model_type: str = "phi4mm"
    partial_rotary_factor: float = 0.75
    tie_word_embeddings: bool = True


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig = None
    vision_config: _SiglipVisionConfig = None
    model_type: str = "phi4mm"
    mm_hidden_size: int = 1152
    image_token_index: int = IMAGE_TOKEN_INDEX
    audio_token_index: int = AUDIO_TOKEN_INDEX
    vision_lora: Optional[dict] = None
    speech_lora: Optional[dict] = None
    audio_processor: Optional[dict] = None
    eos_token_id: Optional[Union[int, List[int]]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        # phi4mm configs carry the LM fields at top level (config.py:56-83)
        text = dict(params.get("text_config", {}) or {})
        for k in list(params):
            if k in TextConfig.__dataclass_fields__ and k not in text:
                text[k] = params[k]
        params["text_config"] = TextConfig.from_dict(text)
        params["vision_config"] = _SiglipVisionConfig.from_dict(
            dict(params.get("vision_config", {}) or {}))
        allowed = inspect.signature(cls).parameters
        cfg = cls(**{k: v for k, v in params.items() if k in allowed})
        cfg.audio_config = AudioConfig.from_dict(
            (cfg.audio_processor or {}).get("config", {}))
        return cfg


def bilinear_pos_plan(grids, side_h: int, side_w: int):
    """Host-side bilinear interpolation plan for per-image pos embeddings.

    Returns (idx [4, N], weights [4, N]) over the flattened side_h*side_w
    table, one column per output patch across all images — the jit program
    is a gather + weighted sum (reference resizes with
    resize_bilinear(align_corners=False), vision.py:142)."""
    idx_cols, wgt_cols = [], []
    for h, w in grids:
        ys = (np.arange(h) + 0.5) * side_h / h - 0.5
        xs = (np.arange(w) + 0.5) * side_w / w - 0.5
        y0 = np.clip(np.floor(ys), 0, side_h - 1).astype(np.int64)
        x0 = np.clip(np.floor(xs), 0, side_w - 1).astype(np.int64)
        y1 = np.minimum(y0 + 1, side_h - 1)
        x1 = np.minimum(x0 + 1, side_w - 1)
        fy = np.clip(ys - y0, 0.0, 1.0)
        fx = np.clip(xs - x0, 0.0, 1.0)
        yy0, xx0 = np.meshgrid(y0, x0, indexing="ij")
        yy1, xx1 = np.meshgrid(y1, x1, indexing="ij")
        fyy, fxx = np.meshgrid(fy, fx, indexing="ij")
        idx = np.stack([
            yy0 * side_w + xx0, yy0 * side_w + xx1,
            yy1 * side_w + xx0, yy1 * side_w + xx1,
        ]).reshape(4, -1)
        wgt = np.stack([
            (1 - fyy) * (1 - fxx), (1 - fyy) * fxx,
            fyy * (1 - fxx), fyy * fxx,
        ]).reshape(4, -1)
        idx_cols.append(idx)
        wgt_cols.append(wgt)
    return (np.concatenate(idx_cols, 1).astype(np.int32),
            np.concatenate(wgt_cols, 1).astype(np.float32))


class LanguageModel(_LlamaLM):
    pass


_QKV_RE = re.compile(r"\.self_attn\.qkv_proj\.(weight|bias)$")
_GU_RE = re.compile(r"\.mlp\.gate_up_proj\.(weight|bias)$")


class Model:
    CONFIG_CLS = ModelConfig

    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config.text_config, config)
        self.vision_tower = _SiglipVision(config.vision_config,
                                          select_layer=-2)
        self.audio_config = getattr(config, "audio_config", AudioConfig())

    # ------------------------------------------------------------------ jit
    def vision_features(self, params, pixel_values, segment_ids, pos_idx,
                        pos_weights):
        hidden = self.vision_tower(
            params["vision_tower"], pixel_values, segment_ids, pos_idx,
            pos_weights)
        mp = params["mm_projector"]
        x = jax.nn.gelu(linear(mp["0"], hidden), approximate=False)
        return linear(mp["2"], x)

    def audio_features(self, params, input_audio_embeds, audio_feat_idx):
        """[A, T, 80] mel clips -> gathered valid features [N_audio, D]."""
        enc = conformer_encode(
            params["audio_encoder"], self.audio_config, input_audio_embeds)
        proj = audio_project(params["audio_projection"], enc, "speech")
        A, T, D = proj.shape
        return jnp.take(proj.reshape(A * T, D), audio_feat_idx, axis=0)

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,  # [N, P*P*C] flat packed
        segment_ids=None, pos_idx=None, pos_weights=None,
        input_audio_embeds: Optional[jax.Array] = None,  # [A, T, 80]
        audio_feat_idx: Optional[jax.Array] = None,
        image_features: Optional[jax.Array] = None,
        **aux,
    ) -> jax.Array:
        ids = jnp.where(input_ids < 0, 0, input_ids)
        embeds = self.language_model.embed(params["language_model"], ids)
        if pixel_values is not None or image_features is not None:
            feats = (image_features if image_features is not None
                     else self.vision_features(params, pixel_values,
                                               segment_ids, pos_idx,
                                               pos_weights))
            embeds = merge_input_ids_with_image_features(
                self.config.image_token_index, -1, feats, embeds, input_ids)
        if input_audio_embeds is not None:
            afeats = self.audio_features(
                params, input_audio_embeds, audio_feat_idx)
            embeds = merge_input_ids_with_image_features(
                self.config.audio_token_index, -1, afeats, embeds, input_ids)
        return embeds

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache,
                                            position_ids)
        return self.language_model.logits(lm, hidden), cache

    # ----------------------------------------------------------- host-side
    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        ids = np.where(np.asarray(input_ids) < 0, 0, np.asarray(input_ids))
        return text_position_ids(ids, attention_mask)

    def vision_aux_inputs(self, grid_thw) -> dict:
        grids = [(int(r[-2]), int(r[-1])) for r in np.asarray(grid_thw)]
        side = self.vision_tower.side
        idx, wgt = bilinear_pos_plan(grids, side, side)
        segs = np.concatenate(
            [np.full(h * w, i, np.int32) for i, (h, w) in enumerate(grids)])
        return {"segment_ids": segs, "pos_idx": idx, "pos_weights": wgt}

    def audio_embed_size(self, n_frames: int) -> int:
        """Subsampled length for one clip (3 stride-2 convs, pad=1, k=3)."""
        t = n_frames
        for _ in range(int(math.log2(self.audio_config.time_reduction))):
            t = (t + 2 - 3) // 2 + 1
        return t

    def audio_aux_inputs(self, input_features, feature_lens: List[int]) -> dict:
        """Pad clips to one mel length; gather index drops padded rows."""
        fa = np.asarray(input_features, np.float32)
        if fa.ndim == 2:
            fa = fa[None]
        # accept [A, 80, T] (HF feature extractor) or [A, T, 80]
        if fa.shape[1] == self.audio_config.input_size and \
                fa.shape[2] != self.audio_config.input_size:
            fa = fa.transpose(0, 2, 1)
        t_pad = fa.shape[1]
        t_sub = self.audio_embed_size(t_pad)
        idx = np.concatenate([
            np.arange(self.audio_embed_size(int(ln)), dtype=np.int32)
            + a * t_sub
            for a, ln in enumerate(feature_lens)
        ])
        return {"input_audio_embeds": fa, "audio_feat_idx": idx}

    # ------------------------------------------------------------ sanitize
    def sanitize(self, weights: dict) -> dict:
        cfg = self.config
        tc = cfg.text_config
        hd = tc.head_dim or tc.hidden_size // tc.num_attention_heads
        nq = tc.num_attention_heads * hd
        kvd = tc.num_key_value_heads * hd

        def lora_scale(spec, default_r, default_a):
            if not spec:
                return 1.0
            return spec.get("lora_alpha", default_a) / spec.get(
                "r", default_r)

        v_scale = lora_scale(cfg.vision_lora, 256, 512)
        s_scale = lora_scale(cfg.speech_lora, 320, 640)

        base, lora = {}, {"vision": {}, "speech": {}}
        audio_w, out = {}, {}
        for k, v in weights.items():
            if ("position_ids" in k or "glb_GN" in k or "sub_GN" in k
                    or "img_processor.head." in k):
                continue
            if "embed_tokens_extend.audio_embed.encoder." in k:
                audio_w[k.split("audio_embed.encoder.", 1)[1]] = v
                continue
            if "embed_tokens_extend.audio_embed.audio_projection." in k:
                out["audio_projection." + k.split(
                    "audio_projection.", 1)[1]] = v
                continue
            if "embed_tokens_extend.image_embed.img_processor." in k:
                out["vision_tower.vision_model." + k.split(
                    "img_processor.", 1)[1]] = v
                continue
            if "embed_tokens_extend.image_embed.img_projection." in k:
                out["mm_projector." + k.split("img_projection.", 1)[1]] = v
                continue
            m = re.search(r"\.lora_(A|B)\.(vision|speech)\.", k)
            if m:
                stem = re.sub(r"\.lora_(A|B)\.(vision|speech)\.", ".", k)
                lora[m.group(2)].setdefault(stem, {})[m.group(1)] = v
                continue
            if ".base_layer." in k:
                base[k.replace(".base_layer.", ".")] = v
                continue
            base[k] = v

        # merge BOTH LoRA adapters into base (reference quant_predicate
        # pre-merge, phi4mm.py:508); then split fused projections
        for branch, scale in (("vision", v_scale), ("speech", s_scale)):
            for stem, ab in lora[branch].items():
                if "A" in ab and "B" in ab and stem in base:
                    base[stem] = base[stem] + scale * (ab["B"] @ ab["A"])

        for k, v in base.items():
            m = _QKV_RE.search(k)
            if m and "layers." in k:
                stem = "language_model." + k[: m.start()] + ".self_attn."
                suf = m.group(1)
                out[stem + "q_proj." + suf] = v[:nq]
                out[stem + "k_proj." + suf] = v[nq: nq + kvd]
                out[stem + "v_proj." + suf] = v[nq + kvd:]
                continue
            m = _GU_RE.search(k)
            if m and "layers." in k:
                stem = "language_model." + k[: m.start()] + ".mlp."
                half = v.shape[0] // 2
                out[stem + "gate_proj." + m.group(1)] = v[:half]
                out[stem + "up_proj." + m.group(1)] = v[half:]
                continue
            if k.startswith(("model.", "lm_head.")):
                k = "language_model." + k
            out[k] = v

        # vision patch embed: Conv2d (O,C,H,W) -> Linear over (H,W,C) flat
        pk = ("vision_tower.vision_model.embeddings.patch_embedding.weight")
        if pk in out and out[pk].ndim == 4:
            w = out[pk]
            out[pk] = w.transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
        for k, v in sanitize_audio(audio_w).items():
            out["audio_encoder." + k] = v
        return out

    @property
    def stack_patterns(self):
        return ("language_model.model.layers",
                "vision_tower.vision_model.encoder.layers",
                "audio_encoder.encoders")


__all__ = ["Model", "ModelConfig", "TextConfig", "AudioConfig",
           "LanguageModel", "bilinear_pos_plan"]
