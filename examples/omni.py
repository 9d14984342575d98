"""Omni (audio + vision) demo.

Role parity: reference examples/omni.py — that script is a live
microphone/webcam streaming client (sounddevice + webrtcvad + cv2, none of
which ship in a TPU pod image); this port keeps the same flow over FILES
and talks either to the library directly or to a running server's audio
endpoints (server/audio.py).

Library mode (loads the model in-process):
    python examples/omni.py --model /path/to/qwen3-omni \
        --audio question.wav --image scene.jpg

Server mode (hits a running `python -m mlx_vlm_tpu server`):
    python examples/omni.py --url http://localhost:8000 --audio q.wav
"""

import argparse
import json
import sys
import urllib.request
import uuid
import wave

import numpy as np


def read_wav(path: str) -> np.ndarray:
    """mono float32 waveform in [-1, 1] (resampling is the model
    processor's job)."""
    with wave.open(path, "rb") as w:
        n = w.getnframes()
        raw = w.readframes(n)
        dtype = {1: np.int8, 2: np.int16, 4: np.int32}[w.getsampwidth()]
        audio = np.frombuffer(raw, dtype=dtype).astype(np.float32)
        audio /= float(np.iinfo(dtype).max)
        if w.getnchannels() > 1:
            audio = audio.reshape(-1, w.getnchannels()).mean(axis=1)
    return audio


def run_library(args):
    from mlx_vlm_tpu import apply_chat_template, generate, load

    model, processor = load(args.model)
    audio = read_wav(args.audio) if args.audio else None
    prompt = apply_chat_template(
        processor, model.config_dict, args.prompt,
        num_images=1 if args.image else 0,
    )
    result = generate(
        model, processor, prompt,
        image=args.image, audio=audio,
        max_tokens=args.max_tokens, temperature=args.temperature,
        verbose=False,
    )
    print(result.text if hasattr(result, "text") else result)


def run_server(args):
    if args.audio:
        # multipart upload to the OpenAI-compatible transcription route
        boundary = uuid.uuid4().hex
        with open(args.audio, "rb") as f:
            data = f.read()
        parts = []
        for name, value in (("model", "default"), ("prompt", args.prompt),
                            ("response_format", "json")):
            parts.append(
                f"--{boundary}\r\nContent-Disposition: form-data; "
                f'name="{name}"\r\n\r\n{value}\r\n'.encode())
        parts.append(
            f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="file"; filename="audio.wav"\r\n'
            f"Content-Type: audio/wav\r\n\r\n".encode() + data + b"\r\n")
        parts.append(f"--{boundary}--\r\n".encode())
        body = b"".join(parts)
        req = urllib.request.Request(
            args.url + "/v1/audio/transcriptions", data=body,
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"},
            method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            print(json.loads(r.read())["text"])
        return
    req = urllib.request.Request(
        args.url + "/v1/chat/completions",
        data=json.dumps({
            "messages": [{"role": "user", "content": args.prompt}],
            "max_tokens": args.max_tokens,
            "temperature": args.temperature,
        }).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        print(json.loads(r.read())["choices"][0]["message"]["content"])


def main():
    p = argparse.ArgumentParser("omni audio+vision demo")
    p.add_argument("--model", default=None, help="local model directory")
    p.add_argument("--url", default=None, help="running server base URL")
    p.add_argument("--audio", default=None, help="wav file input")
    p.add_argument("--image", default=None)
    p.add_argument("--prompt", default="Listen to the audio and respond.")
    p.add_argument("--max-tokens", type=int, default=256)
    p.add_argument("--temperature", type=float, default=0.0)
    args = p.parse_args()
    if args.url:
        run_server(args)
    elif args.model:
        run_library(args)
    else:
        sys.exit("pass --model (in-process) or --url (server client)")


if __name__ == "__main__":
    main()
