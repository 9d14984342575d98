"""Audio endpoints (/v1/audio/*) + model hot-swap registry."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_server import _free_port, _get, _post


# ---------------------------------------------------------------- helpers
def _wav_bytes(seconds=0.2, sr=16000, freq=440.0):
    from mlx_vlm_tpu.server.audio import encode_wav

    t = np.arange(int(seconds * sr)) / sr
    return encode_wav(0.3 * np.sin(2 * np.pi * freq * t), sr)


def _multipart(fields: dict, file_field="file", filename="audio.wav",
               file_bytes=b""):
    boundary = "testboundary123"
    out = io.BytesIO()
    for k, v in fields.items():
        out.write(f"--{boundary}\r\n".encode())
        out.write(
            f'Content-Disposition: form-data; name="{k}"\r\n\r\n{v}\r\n'.encode()
        )
    out.write(f"--{boundary}\r\n".encode())
    out.write(
        f'Content-Disposition: form-data; name="{file_field}"; '
        f'filename="{filename}"\r\n'
        f"Content-Type: audio/wav\r\n\r\n".encode()
    )
    out.write(file_bytes)
    out.write(f"\r\n--{boundary}--\r\n".encode())
    return out.getvalue(), f"multipart/form-data; boundary={boundary}"


def _post_raw(url, path, body: bytes, content_type: str, timeout=120):
    req = urllib.request.Request(
        url + path, data=body,
        headers={"Content-Type": content_type}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.headers, r.read()


class TestMultipartAndWav:
    def test_parse_multipart_roundtrip(self):
        from mlx_vlm_tpu.server.audio import parse_multipart

        body, ctype = _multipart(
            {"model": "m1", "prompt": "hello"}, file_bytes=b"\x01\x02"
        )
        fields = parse_multipart(body, ctype)
        assert fields["model"] == b"m1"
        assert fields["prompt"] == b"hello"
        assert fields["file"] == ("audio.wav", b"\x01\x02")

    def test_wav_roundtrip(self):
        from scipy.io import wavfile

        from mlx_vlm_tpu.server.audio import encode_wav

        sig = 0.5 * np.sin(np.linspace(0, 40, 1600)).astype(np.float32)
        data = encode_wav(sig, 16000)
        sr, decoded = wavfile.read(io.BytesIO(data))
        assert sr == 16000
        np.testing.assert_allclose(decoded / 32768.0, sig, atol=1e-3)


class TestAudioEndpointsHTTP:
    """Against the (non-audio) tiny qwen2-vl server: capability gating +
    speech endpoint through a monkeypatched talker."""

    @pytest.fixture(scope="class")
    def audio_server(self, tmp_path_factory):
        from mlx_vlm_tpu.server.app import create_server
        from mlx_vlm_tpu.utils.loader import load
        from mlx_vlm_tpu.utils.testing import build_tiny_checkpoint

        d = tmp_path_factory.mktemp("ckpt_audio")
        build_tiny_checkpoint(str(d))
        model, processor = load(str(d), dtype=jnp.float32)
        port = _free_port()
        httpd = create_server(
            model, processor, model_name="tiny", host="127.0.0.1", port=port,
            num_slots=2, capacity=256, block_size=2,
        )
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        yield httpd, f"http://127.0.0.1:{port}"
        httpd.shutdown()
        httpd.state.generator.shutdown()

    def test_transcription_rejected_without_audio_tower(self, audio_server):
        _, url = audio_server
        body, ctype = _multipart({"model": "tiny"}, file_bytes=_wav_bytes())
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_raw(url, "/v1/audio/transcriptions", body, ctype)
        assert e.value.code == 400
        msg = json.loads(e.value.read())["error"]["message"]
        assert "audio" in msg

    def test_speech_requires_talker(self, audio_server):
        _, url = audio_server
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url, "/v1/audio/speech", {"input": "hello"})
        assert e.value.code == 400

    def test_speech_with_talker(self, audio_server):
        httpd, url = audio_server

        def fake_tts(text, voice="", speed=1.0):
            t = np.arange(1600) / 16000.0
            return 0.2 * np.sin(2 * np.pi * 220 * t), 16000

        httpd.state.generator.model.generate_speech = fake_tts
        try:
            status, headers, data = _post_raw(
                url, "/v1/audio/speech",
                json.dumps({"input": "hello world"}).encode(),
                "application/json",
            )
            assert status == 200
            assert headers["Content-Type"] == "audio/wav"
            assert data[:4] == b"RIFF"
            from scipy.io import wavfile

            sr, decoded = wavfile.read(io.BytesIO(data))
            assert sr == 16000 and len(decoded) == 1600
        finally:
            del httpd.state.generator.model.generate_speech


class TestOmniTranscription:
    """Native STT through the engine: tiny qwen3_omni thinker + builtin
    mel frontend, driven exactly as /v1/audio/transcriptions does."""

    def test_transcribe_flow(self):
        from mlx_vlm_tpu.server.audio import _transcribe_prompt
        from mlx_vlm_tpu.server.engine import (
            GenerationArguments,
            ResponseGenerator,
        )
        from mlx_vlm_tpu.utils.loader import load_model_from_weights
        from mlx_vlm_tpu.utils.processing import log_mel_spectrogram
        from tests.test_qwen3_omni import tiny_omni_config, tiny_omni_weights

        cfg = tiny_omni_config()
        model = load_model_from_weights(cfg, tiny_omni_weights(cfg),
                                        jnp.float32)

        class _Tok:
            eos_token_id = 9999

            def convert_ids_to_tokens(self, i):
                return "<A>" if i == 66 else f"<t{i}>"

            def __call__(self, text, **kw):
                texts = text if isinstance(text, list) else [text]
                rows = []
                for t in texts:
                    ids = []
                    while t:
                        if t.startswith("<A>"):
                            ids.append(66)
                            t = t[3:]
                        else:
                            ids.append((ord(t[0]) * 3) % 50)
                            t = t[1:]
                    rows.append(ids)
                return {
                    "input_ids": np.asarray(rows, np.int64),
                    "attention_mask": np.ones(
                        (len(rows), len(rows[0])), np.int64
                    ),
                }

            def apply_chat_template(self, messages, **kw):
                return "u:" + messages[0]["content"]

            def decode(self, ids, **kw):
                return " ".join(f"t{i}" for i in ids)

        class _Proc:
            tokenizer = _Tok()

            def __call__(self, text=None, images=None, videos=None,
                         padding=True, audio=None, **kw):
                out = {}
                if audio is not None:
                    mels = [log_mel_spectrogram(a, 16) for a in audio]
                    T = max(m.shape[1] for m in mels)
                    out["input_features"] = np.stack([
                        np.pad(m, ((0, 0), (0, T - m.shape[1])))
                        for m in mels
                    ])
                    out["feature_attention_mask"] = np.stack([
                        np.pad(np.ones(m.shape[1], np.int64),
                               (0, T - m.shape[1]))
                        for m in mels
                    ])
                enc = self.tokenizer(text)
                out.update(enc)
                return out

        gen = ResponseGenerator(model, _Proc(), num_slots=1, capacity=256,
                                block_size=2, apc=None, vision_cache=None)
        try:
            wave = (0.1 * np.sin(np.linspace(0, 60, 3200))).astype(np.float32)
            prompt = _transcribe_prompt(gen, wave, "Transcribe this audio.")
            n_audio = prompt.count("<A>")
            assert n_audio >= 1  # chunk plan sized the placeholder count
            args = GenerationArguments(
                prompt=prompt, audios=[wave], max_tokens=4, temperature=0.0,
            )
            toks = [t for t in gen.generate(args)]
            assert toks[-1].finish_reason in ("stop", "length")
            assert not any(t.error for t in toks)
        finally:
            gen.shutdown()


class TestModelRegistry:
    def test_hot_swap_and_lru(self, tmp_path_factory):
        from mlx_vlm_tpu.server.registry import ModelRegistry
        from mlx_vlm_tpu.utils.testing import build_tiny_checkpoint

        d1 = tmp_path_factory.mktemp("reg_a")
        d2 = tmp_path_factory.mktemp("reg_b")
        build_tiny_checkpoint(str(d1))
        build_tiny_checkpoint(str(d2))
        reg = ModelRegistry(max_models=1, num_slots=1, capacity=128,
                            block_size=2)
        reg.register("a", path=str(d1))
        reg.register("b", path=str(d2))
        assert reg.names() == ["a", "b"]
        try:
            ea = reg.get("a")
            assert ea is not None and ea.name == "a"
            eb = reg.get("b")  # evicts a (max_models=1)
            assert eb.name == "b"
            assert len(reg._live) == 1
            assert ea.model is None  # evicted entry dropped its params
            assert reg.get("zzz") is None
        finally:
            reg.shutdown()

    def test_http_routes_by_model_field(self, tmp_path_factory):
        from mlx_vlm_tpu.server.app import create_server
        from mlx_vlm_tpu.utils.loader import load
        from mlx_vlm_tpu.utils.testing import build_tiny_checkpoint

        d = tmp_path_factory.mktemp("reg_main")
        d2 = tmp_path_factory.mktemp("reg_extra")
        build_tiny_checkpoint(str(d))
        build_tiny_checkpoint(str(d2))
        model, processor = load(str(d), dtype=jnp.float32)
        port = _free_port()
        httpd = create_server(
            model, processor, model_name="main", host="127.0.0.1", port=port,
            num_slots=2, capacity=256, block_size=2,
            extra_models={"alt": str(d2)}, max_models=1,
        )
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{port}"
        try:
            _, models = _get(url, "/v1/models")
            ids = [m["id"] for m in models["data"]]
            assert ids == ["main", "alt"]
            status, resp = _post(url, "/v1/chat/completions", {
                "model": "alt",
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 3,
            })
            assert status == 200
            assert resp["model"] == "alt"
            status, resp = _post(url, "/v1/chat/completions", {
                "model": "main",
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 3,
            })
            assert status == 200 and resp["model"] == "main"
        finally:
            httpd.shutdown()
            httpd.state.generator.shutdown()
            httpd.state.registry.shutdown()
