"""Preprocessing: images -> patch tensors, prompt -> token ids.

Role parity: reference `mlx_vlm/utils.py:1193-1786` (load_image,
prepare_inputs, process_inputs) and per-model `processing_*.py`.  Prefers the
HF AutoProcessor when the checkpoint ships one; otherwise falls back to the
built-in numpy Qwen2-VL-compatible processor below.

The heavy per-pixel work (rescale/normalize/patchify) also has an on-device
XLA path in `ops/image.py` used by the serving stack.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Any, List, Optional, Union

import numpy as np

OPENAI_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
OPENAI_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def load_image(source) -> "Any":
    """URL/path/PIL -> RGB PIL image (reference utils.py:1193)."""
    from PIL import Image, ImageOps

    if hasattr(source, "convert"):
        img = source
    elif isinstance(source, (str, Path)):
        s = str(source)
        if s.startswith("http://") or s.startswith("https://"):
            import io
            import urllib.request

            with urllib.request.urlopen(s) as r:
                img = Image.open(io.BytesIO(r.read()))
        elif s.startswith("data:image"):
            import base64
            import io

            img = Image.open(io.BytesIO(base64.b64decode(s.split(",", 1)[1])))
        else:
            img = Image.open(s)
    elif isinstance(source, np.ndarray):
        from PIL import Image as _I

        img = _I.fromarray(source)
    else:
        raise ValueError(f"cannot load image from {type(source)}")
    img = ImageOps.exif_transpose(img)
    return img.convert("RGB")


def load_video(
    source,
    nframes: Optional[int] = None,
    fps: Optional[float] = None,
    frame_factor: int = 2,
    max_frames: int = 64,
):
    """cv2 frame sampling — uniform `nframes` or fps-derived, frame count
    rounded to `frame_factor` (reference utils.py:1432).

    Returns (frames [T, H, W, 3] uint8, effective_fps).
    """
    import cv2

    cap = cv2.VideoCapture(str(source))
    if not cap.isOpened():
        raise ValueError(f"cannot open video {source}")
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    video_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    if nframes is None:
        target = fps or 1.0
        nframes = int(total / video_fps * target)
    nframes = max(frame_factor, min(nframes, total, max_frames))
    nframes = (nframes // frame_factor) * frame_factor
    idxs = np.linspace(0, total - 1, nframes).round().astype(int)
    frames = []
    for idx in idxs:
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(idx))
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {source}")
    eff_fps = nframes / max(total / video_fps, 1e-6)
    return np.stack(frames), eff_fps


def load_audio(source, sample_rate: int = 16000) -> np.ndarray:
    """Mono float32 audio (reference utils.py:1252/1397 uses miniaudio +
    ffmpeg; this image has neither, so wav via scipy + ffmpeg if present)."""
    import shutil
    import subprocess

    s = str(source)
    if s.endswith(".wav"):
        from scipy.io import wavfile

        sr, data = wavfile.read(s)
        data = data.astype(np.float32)
        if data.dtype != np.float32 or data.max() > 2.0:
            data = data / 32768.0
        if data.ndim == 2:
            data = data.mean(axis=1)
        if sr != sample_rate:
            from scipy.signal import resample

            data = resample(data, int(len(data) * sample_rate / sr)).astype(
                np.float32
            )
        return data
    if shutil.which("ffmpeg"):
        out = subprocess.run(
            ["ffmpeg", "-i", s, "-f", "f32le", "-ac", "1", "-ar",
             str(sample_rate), "-"],
            capture_output=True, check=True,
        )
        return np.frombuffer(out.stdout, np.float32)
    raise ValueError(f"cannot decode audio {s}: need .wav or ffmpeg")


def smart_resize(
    height: int,
    width: int,
    factor: int = 28,
    min_pixels: int = 56 * 56,
    max_pixels: int = 14 * 14 * 4 * 1280,
):
    """Qwen2-VL resize rule: dims divisible by `factor`, area within bounds."""
    if max(height, width) / min(height, width) > 200:
        raise ValueError("absolute aspect ratio must be smaller than 200")
    h_bar = max(factor, round(height / factor) * factor)
    w_bar = max(factor, round(width / factor) * factor)
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = math.floor(height / beta / factor) * factor
        w_bar = math.floor(width / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


class Qwen2VLImageProcessor:
    """Numpy Qwen2-VL image processor (patch layout matches HF exactly)."""

    def __init__(
        self,
        patch_size: int = 14,
        merge_size: int = 2,
        temporal_patch_size: int = 2,
        min_pixels: int = 56 * 56,
        max_pixels: int = 14 * 14 * 4 * 1280,
        image_mean=OPENAI_CLIP_MEAN,
        image_std=OPENAI_CLIP_STD,
    ):
        self.patch_size = patch_size
        self.merge_size = merge_size
        self.temporal_patch_size = temporal_patch_size
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels
        self.image_mean = np.asarray(image_mean, np.float32)
        self.image_std = np.asarray(image_std, np.float32)

    def _preprocess_one(self, frames: List[np.ndarray]):
        """frames: list of HxWx3 uint8 (T frames of one image/video clip)."""
        from PIL import Image

        h, w = frames[0].shape[:2]
        hb, wb = smart_resize(
            h, w, self.patch_size * self.merge_size, self.min_pixels, self.max_pixels
        )
        proc = []
        for f in frames:
            img = Image.fromarray(f).resize((wb, hb), Image.BICUBIC)
            x = np.asarray(img, np.float32) / 255.0
            x = (x - self.image_mean) / self.image_std
            proc.append(x.transpose(2, 0, 1))  # CHW
        patches = np.stack(proc)  # [T, C, H, W]
        T = patches.shape[0]
        if T % self.temporal_patch_size:
            reps = self.temporal_patch_size - T % self.temporal_patch_size
            patches = np.concatenate([patches, np.tile(patches[-1:], (reps, 1, 1, 1))])
        C = patches.shape[1]
        gt = patches.shape[0] // self.temporal_patch_size
        gh, gw = hb // self.patch_size, wb // self.patch_size
        m, P = self.merge_size, self.patch_size
        patches = patches.reshape(
            gt, self.temporal_patch_size, C, gh // m, m, P, gw // m, m, P
        )
        patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
        flat = patches.reshape(gt * gh * gw, C * self.temporal_patch_size * P * P)
        return flat, np.array([gt, gh, gw], np.int64)

    def __call__(self, images) -> dict:
        """images: image-likes or list thereof -> pixel_values [N, D], grids."""
        if not isinstance(images, (list, tuple)):
            images = [images]
        flats, grids = [], []
        for im in images:
            arr = np.asarray(load_image(im))
            flat, grid = self._preprocess_one([arr])
            flats.append(flat)
            grids.append(grid)
        return {
            "pixel_values": np.concatenate(flats, axis=0).astype(np.float32),
            "image_grid_thw": np.stack(grids),
        }


def _mel_filterbank(n_mels: int, n_fft: int, sr: int) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank [n_mels, n_fft//2+1]
    (matches HF WhisperFeatureExtractor's default bank)."""

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = 3.0 * f / 200.0
        log_region = f >= 1000.0
        mel = np.where(
            log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) * (27.0 / np.log(6.4)), mel
        )
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = 200.0 * m / 3.0
        log_region = m >= 15.0
        return np.where(log_region, 1000.0 * np.exp(np.log(6.4) / 27.0 * (m - 15.0)), f)

    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2), n_mels + 2))
    fb = np.zeros((n_mels, len(fft_freqs)))
    for i in range(n_mels):
        lo, ce, hi = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        up = (fft_freqs - lo) / max(ce - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ce, 1e-10)
        fb[i] = np.maximum(0, np.minimum(up, down))
        fb[i] *= 2.0 / (hi - lo)  # slaney area normalization
    return fb.astype(np.float32)


def log_mel_spectrogram(
    audio: np.ndarray,
    n_mels: int = 128,
    n_fft: int = 400,
    hop: int = 160,
    sr: int = 16000,
) -> np.ndarray:
    """Whisper-style log-mel features [n_mels, T] from mono float audio.

    Matches HF WhisperFeatureExtractor (hann window, reflect pad, power
    spectrogram, log10 clamp to max-8, /4 + 1 normalization); the reference
    relies on the HF feature extractor for this step (utils.py:1688)."""
    audio = np.asarray(audio, np.float32)
    pad = n_fft // 2
    x = np.pad(audio, pad, mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(n_fft + 1)[:-1][None, :]
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # [T, n_fft//2+1]
    mel = _mel_filterbank(n_mels, n_fft, sr) @ spec.T  # [n_mels, T]
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)[:, :-1]


class Qwen2VLProcessor:
    """Minimal text+image(+audio) processor mirroring HF behavior."""

    image_pad = "<|image_pad|>"
    video_pad = "<|video_pad|>"
    audio_pad = "<|audio_pad|>"

    def __init__(self, tokenizer, image_processor: Qwen2VLImageProcessor,
                 num_mel_bins: int = 128):
        self.tokenizer = tokenizer
        self.image_processor = image_processor
        self.num_mel_bins = num_mel_bins

    def __call__(self, text=None, images=None, videos=None, padding=True,
                 audio=None, **kw):
        out = {}
        if audio is not None:
            if not isinstance(audio, (list, tuple)):
                audio = [audio]
            mels = [log_mel_spectrogram(a, self.num_mel_bins) for a in audio]
            T = max(m.shape[1] for m in mels)
            out["input_features"] = np.stack(
                [np.pad(m, ((0, 0), (0, T - m.shape[1]))) for m in mels]
            )
            out["feature_attention_mask"] = np.stack(
                [
                    np.pad(np.ones(m.shape[1], np.int64), (0, T - m.shape[1]))
                    for m in mels
                ]
            )
        if images is not None:
            out.update(self.image_processor(images))
            merge2 = self.image_processor.merge_size**2
            texts = [text] if isinstance(text, str) else list(text)
            grid_iter = iter(out["image_grid_thw"])
            expanded = []
            for t in texts:
                while self.image_pad in t:
                    g = next(grid_iter)
                    n = int(np.prod(g)) // merge2
                    t = t.replace(self.image_pad, "<_IMG_PLACEHOLDER_>" * n, 1)
                expanded.append(t.replace("<_IMG_PLACEHOLDER_>", self.image_pad))
            text = expanded
        enc = self.tokenizer(
            text, return_tensors="np", padding=padding, padding_side="left"
        )
        out["input_ids"] = np.asarray(enc["input_ids"])
        out["attention_mask"] = np.asarray(enc["attention_mask"])
        return out

    def apply_chat_template(self, messages, **kwargs):
        return self.tokenizer.apply_chat_template(messages, **kwargs)


def _builtin_processor(model_type: str, tokenizer, model=None):
    """Per-model builtin processors for families whose HF processors need
    remote code (reference per-model processing_*.py modules)."""
    if model_type == "florence2":
        from ..models.florence2.processing import Florence2Processor

        return Florence2Processor(tokenizer)
    if model_type in ("llava-qwen2", "bunny-llama"):
        from ..models.llava_bunny.processing import BunnyProcessor

        cfg = getattr(model, "config", None)
        vc = getattr(cfg, "vision_config", None)
        return BunnyProcessor(
            tokenizer,
            image_token_index=getattr(cfg, "image_token_index", -200),
            image_size=getattr(vc, "image_size", 384),
            patch_size=getattr(vc, "patch_size", 14),
        )
    if model_type == "molmo2":
        from ..models.molmo2.processing import Molmo2Processor

        return Molmo2Processor(tokenizer, model=model)
    if model_type == "molmo_point":
        from ..models.molmo_point.processing import MolmoPointProcessor

        return MolmoPointProcessor(tokenizer)
    if model_type in ("minicpmv", "minicpmv4_6", "minicpm_v"):
        from ..models.minicpmv4_6.processing import MiniCPMVProcessor

        return MiniCPMVProcessor(tokenizer, model=model)
    if model_type == "phi4mm":
        from ..models.phi4mm.processing import Phi4MMProcessor

        vc = getattr(getattr(model, "config", None), "vision_config", None)
        return Phi4MMProcessor(
            tokenizer, patch_size=getattr(vc, "patch_size", 14))
    if model_type == "falcon_perception":
        from ..models.falcon_perception.processing import (
            FalconPerceptionProcessor,
        )

        return FalconPerceptionProcessor(
            tokenizer, getattr(model, "config_dict", None))
    if model_type in ("nemotron_h_nano_omni",
                      "nemotronh_nano_omni_reasoning_v3"):
        from ..models.nemotron_h_nano_omni.processing import (
            NemotronOmniProcessor,
        )

        return NemotronOmniProcessor(
            tokenizer, getattr(model, "config_dict", None))
    if model_type == "moondream2":
        from ..models.moondream2.processing import MoondreamProcessor

        vc = getattr(getattr(model, "config", None), "vision_config", None)
        return MoondreamProcessor(
            tokenizer,
            crop_size=getattr(vc, "crop_size", 378),
            patch_size=getattr(vc, "patch_size", 14),
        )
    return None


def load_processor(model_path, model=None, **kwargs):
    """AutoProcessor when available, else a per-model builtin, else the
    qwen-shaped fallback."""
    model_path = Path(model_path)
    model_type = ""
    if model is not None:
        model_type = getattr(model, "config_dict", {}).get("model_type", "")
    try:
        from transformers import AutoProcessor

        proc = AutoProcessor.from_pretrained(str(model_path), **kwargs)
        # AutoProcessor silently falls back to a bare tokenizer when the
        # checkpoint has no processor config — that can't handle images.
        if hasattr(proc, "image_processor") or hasattr(proc, "feature_extractor"):
            return proc
        builtin = _builtin_processor(model_type, proc, model)
        if builtin is not None:
            return builtin
        return Qwen2VLProcessor(proc, Qwen2VLImageProcessor())
    except Exception:
        pass
    from .tokenizer import load_tokenizer

    tokenizer = load_tokenizer(model_path)
    builtin = _builtin_processor(model_type, tokenizer, model)
    if builtin is not None:
        return builtin
    return Qwen2VLProcessor(tokenizer, Qwen2VLImageProcessor())


def prepare_inputs(
    processor,
    prompts: Union[str, List[int], np.ndarray],
    images=None,
    videos=None,
    **kwargs,
) -> dict:
    """Normalize user inputs into model tensors (reference utils.py:1568)."""
    if isinstance(prompts, np.ndarray):
        return {"input_ids": prompts.reshape(1, -1) if prompts.ndim == 1 else prompts}
    if isinstance(prompts, (list, tuple)) and prompts and isinstance(prompts[0], int):
        return {"input_ids": np.asarray(prompts, np.int64)[None]}
    if images is not None and not isinstance(images, (list, tuple)):
        images = [images]
    if images is not None:
        images = [load_image(im) for im in images]
    audios = kwargs.pop("audios", None)
    if audios is not None:
        if not isinstance(audios, (list, tuple)):
            audios = [audios]
        audios = [
            a if isinstance(a, np.ndarray) else load_audio(a) for a in audios
        ]
        kwargs["audio"] = audios  # HF omni processors take `audio=`
    out = processor(
        text=prompts if isinstance(prompts, list) else [prompts],
        images=images,
        videos=videos,
        padding=True,
        **kwargs,
    )
    result = {}
    for k, v in out.items():
        if hasattr(v, "numpy"):
            v = v.numpy()
        if isinstance(v, (np.ndarray, list)):
            result[k] = np.asarray(v)
    return result
