"""Nemotron-Nano Omni processor: dynamic-resolution image tiler + audio
mel extraction + media token expansion.

Role parity: reference mlx_vlm/models/nemotron_h_nano_omni/
image_processing_nemotron_h_nano_omni.py (_compute_target_patches:139,
_compute_target_patches_video:176) and
processing_nemotron_h_nano_omni.py (NemotronHNanoOmniProcessor:22,
image expansion :233, audio expansion :312,
_estimate_audio_num_embeddings:365).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image

_DEFAULT_MEAN = (0.48145466, 0.4578275, 0.40821073)
_DEFAULT_STD = (0.26862954, 0.26130258, 0.27577711)


class NemotronOmniImageProcessor:
    def __init__(self, norm_mean=None, norm_std=None, patch_size: int = 16,
                 downsample_ratio: float = 0.5,
                 min_num_patches: int = 1024, max_num_patches: int = 13312,
                 max_model_len: int = 16384,
                 video_target_num_patches: int = 1024,
                 video_maintain_aspect_ratio: bool = True):
        self.norm_mean = norm_mean or _DEFAULT_MEAN
        self.norm_std = norm_std or _DEFAULT_STD
        self.patch_size = patch_size
        self.downsample_ratio = downsample_ratio
        self._df = int(round(1.0 / downsample_ratio))
        self.min_num_patches = min_num_patches
        self.max_num_patches = max_num_patches
        self.max_model_len = max_model_len
        self.video_target_num_patches = video_target_num_patches
        self.video_maintain_aspect_ratio = video_maintain_aspect_ratio

    def _compute_target_patches(self, img: Image.Image,
                                tokens_available: int):
        """Token-budgeted grid, rounded to the downsample divisor
        (reference image_processing:139)."""
        w, h = img.width, img.height
        ph = round(h / self.patch_size + 0.5)
        pw = round(w / self.patch_size + 0.5)
        factor = min(math.sqrt(tokens_available / (ph * pw)), 1.0)
        th, tw = math.floor(factor * ph), math.floor(factor * pw)
        if tokens_available > self.min_num_patches and \
                th * tw < self.min_num_patches:
            up = math.sqrt(self.min_num_patches / (th * tw))
            th, tw = math.ceil(up * th), math.ceil(up * tw)
        d = self._df
        rem = th % d
        if rem:
            th = th + d - rem if (th + d - rem) * tw <= tokens_available \
                else max(d, th - rem)
        rem = tw % d
        if rem:
            tw = tw + d - rem if th * (tw + d - rem) <= tokens_available \
                else max(d, tw - rem)
        return tw, th

    def _compute_target_patches_video(self, img: Image.Image):
        target, d = self.video_target_num_patches, self._df
        if self.video_maintain_aspect_ratio:
            ar = img.width / max(img.height, 1)
            ph = max(round(math.sqrt(target / ar)), 1)
            pw = max(round(math.sqrt(target * ar)), 1)
            if d > 1:
                rh, rw = ph % d, pw % d
                ph_up = ph + (d - rh if rh else 0)
                pw_up = pw + (d - rw if rw else 0)
                if ph_up * pw_up <= target:
                    ph, pw = ph_up, pw_up
                else:
                    ph, pw = max(d, ph - rh), max(d, pw - rw)
        else:
            side = int(math.sqrt(target))
            ph = pw = max(d, (side // d) * d)
        return pw, ph

    def __call__(self, images, is_video: bool = False):
        if not isinstance(images, (list, tuple)):
            images = [images]
        images = [im.convert("RGB") if im.mode != "RGB" else im
                  for im in images]
        if is_video:
            sizes = [self._compute_target_patches_video(im) for im in images]
        else:
            budget = (self.max_model_len - 4) * self._df ** 2
            budget = max(budget, self.min_num_patches * len(images))
            budget = max(min(budget, self.max_num_patches),
                         self.min_num_patches)
            sizes = [self._compute_target_patches(im, budget)
                     for im in images]
        mean = np.asarray(self.norm_mean, np.float32).reshape(3, 1, 1)
        std = np.asarray(self.norm_std, np.float32).reshape(3, 1, 1)
        pixel_values, num_tokens = [], []
        for im, (wp, hp) in zip(images, sizes):
            tw, th = wp * self.patch_size, hp * self.patch_size
            if im.size != (tw, th):
                im = im.resize((tw, th), Image.Resampling.BICUBIC,
                               reducing_gap=3.0)
            arr = np.asarray(im, np.float32).transpose(2, 0, 1)
            pixel_values.append((arr / 255.0 - mean) / std)
            num_tokens.append((wp * hp) // (self._df ** 2))
        return {"pixel_values": pixel_values, "num_tokens": num_tokens}


class NemotronOmniProcessor:
    """Tokenizer + image tiler + audio mel front-end."""

    def __init__(self, tokenizer, config: Optional[dict] = None,
                 audio_config=None):
        from .audio import AudioConfig, SoundFeatureExtractor

        config = config or {}
        self.tokenizer = tokenizer
        self.image_processor = NemotronOmniImageProcessor(
            patch_size=(config.get("vision_config") or {}).get(
                "patch_size", 16),
            downsample_ratio=config.get("downsample_ratio", 0.5),
        )
        self.image_token = "<image>"
        self.video_token = "<video>"
        self.audio_token = "<so_embedding>"
        self.audio_start_token = "<so_start>"
        self.audio_end_token = "<so_end>"
        self.image_start_token = "<img>"
        self.image_end_token = "</img>"
        self.video_temporal_patch_dim = config.get(
            "video_temporal_patch_size", 2)
        self.audio_config = audio_config or AudioConfig.from_dict(
            config.get("sound_config") or {})
        self._sound_fx = SoundFeatureExtractor(self.audio_config)

    # ------------------------------------------------------------- expand
    def _expand(self, text: str, token: str, counts: List[int],
                fill_token: str, start: str, end: str) -> str:
        i = 0
        while token in text and i < len(counts):
            text = text.replace(
                token, start + "<|ph|>" * counts[i] + end, 1)
            i += 1
        return text.replace("<|ph|>", fill_token)

    def apply_chat_template(self, *args, **kwargs):
        return self.tokenizer.apply_chat_template(*args, **kwargs)

    def batch_decode(self, *args, **kwargs):
        return self.tokenizer.batch_decode(*args, **kwargs)

    def decode(self, *args, **kwargs):
        return self.tokenizer.decode(*args, **kwargs)

    def __call__(self, text=None, images=None, videos=None, audio=None,
                 padding=False, **kwargs):
        kwargs.pop("return_tensors", None)
        if text is None:
            text = [""]
        elif isinstance(text, str):
            text = [text]
        text = list(text)
        out = {}
        if images is not None and (not isinstance(images, list)
                                   or len(images) > 0):
            ii = self.image_processor(images)
            out["pixel_values"] = (
                np.stack(ii["pixel_values"])
                if len({p.shape for p in ii["pixel_values"]}) == 1
                else ii["pixel_values"])
            for i in range(len(text)):
                text[i] = self._expand(
                    text[i], self.image_token, ii["num_tokens"],
                    self.image_token, self.image_start_token,
                    self.image_end_token)
        if videos is not None:
            vi = self.image_processor(videos, is_video=True)
            out["pixel_values_videos"] = np.stack(vi["pixel_values"])
            T = self.video_temporal_patch_dim
            n_frames = len(vi["pixel_values"])
            n_groups = (n_frames + T - 1) // T
            per_group = vi["num_tokens"][0]
            group = (self.image_start_token + "<|ph|>" * per_group
                     + self.image_end_token)
            labels = []
            for g in range(n_groups):
                parts = []
                for j in range(T):
                    fi = g * T + j
                    if fi >= n_frames:
                        break
                    parts.append(("Frame" if j == 0 else "frame")
                                 + f" {fi + 1}")
                labels.append(" and ".join(parts) + ": ")
            prompt = "\n".join(lb + group for lb in labels)
            text[0] = text[0].replace(self.video_token, prompt, 1)
            text[0] = text[0].replace("<|ph|>", self.image_token)
        if audio is not None:
            clips = audio if isinstance(audio, list) else [audio]
            feats, mask, _ = self._sound_fx(clips)
            out["input_features"] = feats
            out["feature_attention_mask"] = mask
            from .audio import subsampling_output_length

            counts = [max(1, subsampling_output_length(
                self.audio_config, int(m.sum()))) for m in mask]
            for i in range(len(text)):
                text[i] = self._expand(
                    text[i], self.audio_token, counts, self.audio_token,
                    self.audio_start_token, self.audio_end_token)
        enc = self.tokenizer(text, padding=padding)
        out["input_ids"] = np.asarray(enc["input_ids"])
        out["attention_mask"] = np.asarray(enc["attention_mask"])
        return out


__all__ = ["NemotronOmniProcessor", "NemotronOmniImageProcessor"]
