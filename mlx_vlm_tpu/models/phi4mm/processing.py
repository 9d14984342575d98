"""Builtin Phi-4-multimodal processor (no remote code).

Role parity: reference mlx_vlm/models/phi4mm/processing_phi4mm.py —
Phi4MMImageProcessor:107 (NaFlex sizing, bilinear resize, 0.5-normalize,
patchify), Phi4MMAudioFeatureExtractor:252 (SpeechLib fbank: hamming-400
frames, 0.97 preemphasis, 80-bin speechlib mel, log power clipped at 1.0),
Phi4MMProcessor:440 (numbered <|image_N|>/<|audio_N|> placeholders expanded
to IMAGE_TOKEN_INDEX=-200 / AUDIO_TOKEN_INDEX=200011 runs).

TPU design: images ship as FLAT-PACKED patches concatenated across images
(no per-image pad-to-3600) + an image_grid_thw so the model's
vision_aux_inputs builds the segment-id mask and bilinear pos-embed plan
host-side — static shapes, zero padded-patch compute.  Audio ships as
[A, T, 80] mel batches + a frame validity mask; per-clip token counts are
ceil(T/8), identical to the reference's _compute_audio_embed_size:332.
"""

from __future__ import annotations

import math
import re
from typing import List

import numpy as np

IMAGE_TOKEN_INDEX = -200
AUDIO_TOKEN_INDEX = 200011
_IMG_RE = re.compile(r"<\|image_\d+\|>|<image>")
_AUD_RE = re.compile(r"<\|audio_\d+\|>|<audio>")


def fit_num_patches(h: int, w: int, patch: int, max_patches: int):
    """Largest (h_p, w_p) grid with h_p*w_p <= max_patches at the image's
    aspect ratio (reference get_image_size_for_max_num_patches:41)."""
    aspect = w / h
    hp = int(math.sqrt(max_patches / aspect))
    wp = int(hp * aspect)
    while hp * wp > max_patches:
        if hp > wp:
            hp -= 1
        else:
            wp -= 1
    return max(hp, 1), max(wp, 1)


def speechlib_mel(sample_rate, n_fft, n_mels, fmin=None, fmax=None):
    """SpeechLib FbankFC mel bank (reference speechlib_mel:213)."""
    bank_width = n_fft // 2 + 1
    fmax = sample_rate / 2 if fmax is None else fmax
    fmin = 0 if fmin is None else fmin
    mel = lambda f: 1127.0 * np.log(1.0 + f / 700.0)
    klo = int(fmin * n_fft / sample_rate + 0.5) + 1
    khi = max(int(fmax * n_fft / sample_rate + 0.5), klo)
    centers = np.linspace(mel(fmin), mel(fmax), n_mels + 2)
    ms = (mel(fmax) - mel(fmin)) / (n_mels + 1)
    bins = np.arange(bank_width)
    mbin = 1127.0 * np.log(1.0 + bins * sample_rate / (n_fft * 700.0))
    matrix = np.zeros((n_mels, bank_width), np.float32)
    valid = (bins >= klo) & (bins < khi)
    for m in range(n_mels):
        left, center, right = centers[m], centers[m + 1], centers[m + 2]
        tri = 1.0 - np.abs(center - mbin) / ms
        matrix[m] = np.where(valid & (mbin > left) & (mbin < right), tri, 0.0)
    return matrix.astype(np.float32)


class Phi4MMImageProcessor:
    """NaFlex patchifier: no upscale beyond min_num_patches, downscale to
    max_num_patches, 0.5 mean/std (reference Phi4MMImageProcessor:107)."""

    def __init__(self, patch_size: int = 14, max_num_patches: int = 3600,
                 min_num_patches: int = 256):
        self.patch_size = patch_size
        self.max_num_patches = max_num_patches
        self.min_num_patches = min_num_patches

    def __call__(self, images) -> dict:
        from PIL import Image

        P = self.patch_size
        patches, grids = [], []
        for im in images:
            if not isinstance(im, Image.Image):
                im = Image.fromarray(np.asarray(im))
            im = im.convert("RGB")
            w, h = im.size
            n = max((h // P) * (w // P), 1)
            target = min(max(n, self.min_num_patches), self.max_num_patches)
            hp, wp = fit_num_patches(h, w, P, target)
            im = im.resize((wp * P, hp * P), Image.BILINEAR)
            a = np.asarray(im, np.float32) / 255.0
            a = (a - 0.5) / 0.5
            a = a.reshape(hp, P, wp, P, 3).transpose(0, 2, 1, 3, 4)
            patches.append(a.reshape(hp * wp, -1))
            grids.append((1, hp, wp))
        return {"pixel_values": np.concatenate(patches, 0),
                "image_grid_thw": np.asarray(grids, np.int64)}


class Phi4MMAudioFeatureExtractor:
    """SpeechLib fbank features (reference Phi4MMAudioFeatureExtractor:252;
    16 kHz path only — prepare_inputs resamples on load)."""

    sampling_rate = 16000

    def __init__(self, compression_rate: int = 8):
        self.compression_rate = compression_rate
        self._mel = speechlib_mel(16000, 512, 80, fmax=7690).T
        self._window = np.hamming(400)

    def features(self, wav: np.ndarray) -> np.ndarray:
        wav = np.asarray(wav, np.float32).reshape(-1)
        n_fft, win, hop = 512, 400, 160
        if wav.shape[0] < win:
            wav = np.pad(wav, (0, win - wav.shape[0]))
        n_frames = (wav.shape[0] - win) // hop + 1
        idx = np.arange(win)[None, :] + hop * np.arange(n_frames)[:, None]
        frames = wav[idx]
        prev = np.roll(frames, 1, axis=1)
        prev[:, 0] = prev[:, 1]
        frames = (frames - 0.97 * prev) * 32768
        spec = np.abs(np.fft.rfft(self._window * frames, n=n_fft, axis=1))
        power = (spec.astype(np.float32)) ** 2
        return np.log(np.clip(power @ self._mel, 1.0, None)).astype(np.float32)

    def embed_size(self, n_frames: int) -> int:
        return -(-n_frames // self.compression_rate)

    def __call__(self, audios) -> dict:
        feats = [self.features(a) for a in audios]
        T = max(f.shape[0] for f in feats)
        return {
            "input_features": np.stack(
                [np.pad(f, ((0, T - f.shape[0]), (0, 0))) for f in feats]),
            "feature_attention_mask": np.stack(
                [np.pad(np.ones(f.shape[0], np.int64),
                        (0, T - f.shape[0])) for f in feats]),
            "audio_embed_sizes": np.asarray(
                [self.embed_size(f.shape[0]) for f in feats], np.int64),
        }


class Phi4MMProcessor:
    """Text + NaFlex image + SpeechLib audio processor.

    `<|image_N|>` expands to one IMAGE_TOKEN_INDEX per patch of image N;
    `<|audio_N|>` expands to ceil(T_N/8) AUDIO_TOKEN_INDEX ids (reference
    Phi4MMProcessor.__call__:472)."""

    def __init__(self, tokenizer, patch_size: int = 14,
                 max_num_patches: int = 3600, min_num_patches: int = 256):
        self.tokenizer = tokenizer
        self.image_processor = Phi4MMImageProcessor(
            patch_size, max_num_patches, min_num_patches)
        self.audio_processor = Phi4MMAudioFeatureExtractor()

    def apply_chat_template(self, messages, **kwargs):
        return self.tokenizer.apply_chat_template(messages, **kwargs)

    def __call__(self, text=None, images=None, videos=None, audio=None,
                 padding=True, **kwargs):
        out = {}
        img_counts: List[int] = []
        if images:
            out.update(self.image_processor(images))
            img_counts = [int(g[1] * g[2]) for g in out["image_grid_thw"]]
        aud_counts: List[int] = []
        if audio is not None:
            if not isinstance(audio, (list, tuple)):
                audio = [audio]
            out.update(self.audio_processor(audio))
            aud_counts = [int(s) for s in out["audio_embed_sizes"]]

        texts = [text] if isinstance(text, str) else list(text or [])
        batches: List[List[int]] = []
        for t in texts:
            img_it, aud_it = iter(img_counts), iter(aud_counts)
            # normalize numbered placeholders to one split marker each
            t = _IMG_RE.sub("\x00I\x00", t)
            t = _AUD_RE.sub("\x00A\x00", t)
            ids: List[int] = []
            for part in re.split(r"(\x00[IA]\x00)", t):
                if part == "\x00I\x00":
                    ids.extend([IMAGE_TOKEN_INDEX] * next(img_it))
                elif part == "\x00A\x00":
                    ids.extend([AUDIO_TOKEN_INDEX] * next(aud_it))
                elif part:
                    ids.extend(self.tokenizer(
                        part, add_special_tokens=False)["input_ids"])
            batches.append(ids)
        width = max((len(b) for b in batches), default=0)
        pad = getattr(self.tokenizer, "pad_token_id", None) or 0
        input_ids = np.full((len(batches), width), pad, np.int64)
        attention_mask = np.zeros((len(batches), width), np.int64)
        for i, b in enumerate(batches):
            input_ids[i, width - len(b):] = b
            attention_mask[i, width - len(b):] = 1
        out["input_ids"] = input_ids
        out["attention_mask"] = attention_mask
        return out
