"""Audio endpoints: /v1/audio/transcriptions, /v1/audio/translations,
/v1/audio/speech.

Role parity: reference mlx_vlm/server/audio.py — transcription/translation
multipart parsing (:372), STT run (:518), TTS run + wav encoding (:435,
:640).  The reference delegates STT/TTS to mlx_audio model registries; here
STT runs natively through the loaded omni thinker (audio -> text is a
first-class input of qwen3_omni_moe), and TTS dispatches to a loaded model
exposing `generate_speech` (omni talker), 400 otherwise.

TPU design: audio decode + log-mel run on host numpy; the mel chunks enter
the same jitted embedding path as vision, and generation rides the
continuous-batching engine like any text request.
"""

from __future__ import annotations

import io
import logging
import tempfile
import uuid
from email.parser import BytesParser
from email.policy import HTTP
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger("mlx_vlm_tpu.server.audio")


# ------------------------------------------------------------- multipart
def parse_multipart(body: bytes, content_type: str) -> dict:
    """Parse multipart/form-data into {name: bytes | (filename, bytes)}."""
    msg = BytesParser(policy=HTTP).parsebytes(
        b"Content-Type: " + content_type.encode() + b"\r\n\r\n" + body
    )
    if not msg.is_multipart():
        raise ValueError("expected multipart/form-data body")
    fields: dict = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        if not name:
            continue
        payload = part.get_payload(decode=True)
        filename = part.get_filename()
        fields[name] = (filename, payload) if filename else payload
    return fields


# ------------------------------------------------------------- wav codec
def encode_wav(audio: np.ndarray, sample_rate: int) -> bytes:
    """float32 mono [-1, 1] -> 16-bit PCM WAV bytes (stdlib only)."""
    import wave

    pcm = np.clip(np.asarray(audio, np.float32), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _decode_upload(filename: str, data: bytes) -> np.ndarray:
    from ..utils.processing import load_audio

    suffix = Path(filename or "upload.wav").suffix or ".wav"
    with tempfile.NamedTemporaryFile(suffix=suffix) as tmp:
        tmp.write(data)
        tmp.flush()
        return load_audio(tmp.name)


# ------------------------------------------------------------- prompts
def _audio_token(generator) -> Optional[str]:
    """The literal audio placeholder token of the loaded tokenizer."""
    cfg = getattr(generator.model, "config_dict", {}) or {}
    tok = getattr(generator.processor, "tokenizer", generator.processor)
    aid = cfg.get("audio_token_id")
    if aid is None:
        aid = cfg.get("thinker_config", {}).get("audio_token_id")
    if aid is not None:
        try:
            return tok.convert_ids_to_tokens(int(aid))
        except Exception:  # noqa: BLE001
            pass
    for cand in ("<|AUDIO|>", "<|audio_pad|>", "<audio>"):
        try:
            ids = tok(cand, add_special_tokens=False)["input_ids"]
            if len(ids) == 1:
                return cand
        except Exception:  # noqa: BLE001
            continue
    return None


def _transcribe_prompt(generator, waveform: np.ndarray, instruction: str) -> str:
    """Chat-format a transcription request with the right number of audio
    placeholder tokens for the loaded model's chunk plan."""
    model = generator.model
    atok = _audio_token(generator)
    if atok is None or not hasattr(model, "audio_aux_inputs"):
        raise ValueError(
            "loaded model does not accept audio input "
            "(no audio placeholder token / audio tower)"
        )
    from ..utils.processing import log_mel_spectrogram

    cfg = getattr(model, "config_dict", {}) or {}
    n_mels = (
        cfg.get("thinker_config", {}).get("audio_config", {})
        or cfg.get("audio_config", {})
    ).get("num_mel_bins", 128)
    mel = log_mel_spectrogram(waveform, n_mels)
    aux = model.audio_aux_inputs(mel, [mel.shape[1]])
    n_tokens = len(aux["audio_gather_idx"])

    tok = getattr(generator.processor, "tokenizer", generator.processor)
    content = atok * n_tokens + instruction
    try:
        return tok.apply_chat_template(
            [{"role": "user", "content": content}],
            tokenize=False, add_generation_prompt=True,
        )
    except Exception:  # noqa: BLE001
        return content


# ------------------------------------------------------------- endpoints
def transcription_endpoint(handler, body: bytes, content_type: str,
                           generator, *, translate: bool = False):
    """POST /v1/audio/transcriptions | /v1/audio/translations."""
    from .engine import GenerationArguments

    fields = parse_multipart(body, content_type)
    upload = fields.get("file")
    if not isinstance(upload, tuple):
        handler.send_json(
            {"error": {"message": "missing file upload"}}, 400)
        return
    filename, data = upload

    def _text(name, default=""):
        v = fields.get(name, default)
        return v.decode() if isinstance(v, bytes) else v

    response_format = _text("response_format", "json")
    prompt = _text("prompt", "")
    language = _text("language", "")

    waveform = _decode_upload(filename, data)
    if translate:
        instruction = "Translate this audio to English."
    else:
        instruction = "Transcribe this audio."
        if language:
            instruction = f"Transcribe this audio in {language}."
    if prompt:
        instruction += " " + prompt

    full_prompt = _transcribe_prompt(generator, waveform, instruction)
    args = GenerationArguments(
        prompt=full_prompt,
        audios=[waveform],
        max_tokens=int(_text("max_tokens", "448") or 448),
        temperature=float(_text("temperature", "0") or 0.0),
        request_id=f"audio-{uuid.uuid4().hex[:16]}",
    )
    pieces = []
    for tok in generator.generate(args):
        if tok.error:
            handler.send_json({"error": {"message": tok.error}}, 500)
            return
        if tok.text:
            pieces.append(tok.text)
    text = "".join(pieces).strip()

    if response_format == "text":
        payload = text.encode()
        handler.send_response(200)
        handler.send_header("Content-Type", "text/plain; charset=utf-8")
        handler.send_header("Content-Length", str(len(payload)))
        handler.end_headers()
        handler.wfile.write(payload)
        return
    out = {"text": text}
    if response_format == "verbose_json":
        out.update(task="translate" if translate else "transcribe",
                   language=language or None, duration=len(waveform) / 16000.0)
    handler.send_json(out)


def speech_endpoint(handler, body: dict, generator):
    """POST /v1/audio/speech — requires a loaded model exposing
    `generate_speech(text, voice=..., speed=...) -> (waveform, sample_rate)`
    (omni talker); 400 otherwise (reference audio.py:435 routes to a TTS
    model registry the same way)."""
    text = body.get("input", "")
    if not text:
        handler.send_json({"error": {"message": "missing input"}}, 400)
        return
    model = generator.model
    if not hasattr(model, "generate_speech"):
        handler.send_json(
            {"error": {"message": "loaded model has no speech head; load an "
                                  "omni model with a talker for TTS"}}, 400)
        return
    import inspect

    kwargs = {}
    if "processor" in inspect.signature(model.generate_speech).parameters:
        kwargs["processor"] = generator.processor
    waveform, sr = model.generate_speech(
        text, voice=body.get("voice", ""),
        speed=float(body.get("speed", 1.0)), **kwargs
    )
    fmt = body.get("response_format", "wav")
    if fmt not in ("wav", "pcm"):
        handler.send_json(
            {"error": {"message": f"unsupported response_format {fmt!r}; "
                                  "wav|pcm available"}}, 400)
        return
    if fmt == "pcm":
        payload = np.clip(np.asarray(waveform, np.float32), -1, 1)
        payload = (payload * 32767.0).astype("<i2").tobytes()
        ctype = "audio/pcm"
    else:
        payload = encode_wav(waveform, sr)
        ctype = "audio/wav"
    handler.send_response(200)
    handler.send_header("Content-Type", ctype)
    handler.send_header("Content-Length", str(len(payload)))
    handler.send_header("Content-Disposition",
                        f"attachment; filename=speech.{fmt}")
    handler.end_headers()
    handler.wfile.write(payload)
