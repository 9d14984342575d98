"""Qwen3-Omni speech output: talker codec generation + code2wav vocoder.

Reference parity: mlx_vlm/models/qwen3_omni_moe/{talker,code2wav}.py and
the generate() speech path (assistant segment construction).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.utils.loader import load_model_from_weights
from tests.test_qwen3_omni import tiny_omni_config, tiny_omni_weights

V_CODEC = 32          # talker codec vocab (specials live below 32)
D_TALKER = 16
D_CP = 16
G = 4                 # code groups
C2W_D = 8


def speech_config():
    cfg = tiny_omni_config()
    thinker_d = cfg["thinker_config"]["text_config"]["hidden_size"]
    cfg["enable_audio_output"] = True
    cfg["tts_bos_token_id"] = 61
    cfg["tts_eos_token_id"] = 62
    cfg["tts_pad_token_id"] = 63
    cfg["talker_config"] = {
        "thinker_hidden_size": thinker_d,
        "num_code_groups": G,
        "codec_bos_id": 20,
        "codec_eos_token_id": 21,
        "codec_nothink_id": 22,
        "codec_pad_id": 23,
        "codec_think_bos_id": 24,
        "codec_think_eos_id": 25,
        "speaker_id": {"tester": 26},
        "text_config": {
            "hidden_size": D_TALKER,
            "num_hidden_layers": 2,
            "num_attention_heads": 2,
            "num_key_value_heads": 2,
            "head_dim": 8,
            "intermediate_size": 12,
            "vocab_size": V_CODEC,
            "num_experts": 2,
            "num_experts_per_tok": 2,
            "moe_intermediate_size": 8,
            "shared_expert_intermediate_size": 8,
            "rms_norm_eps": 1e-6,
            "rope_theta": 10000,
            "max_position_embeddings": 512,
        },
        "code_predictor_config": {
            "num_hidden_layers": 1,
            "hidden_size": D_CP,
            "intermediate_size": 12,
            "num_attention_heads": 2,
            "num_key_value_heads": 1,
            "head_dim": 8,
            "vocab_size": V_CODEC,
            "num_code_groups": G,
        },
    }
    cfg["code2wav_config"] = {
        "hidden_size": C2W_D,
        "intermediate_size": 16,
        "num_hidden_layers": 1,
        "num_attention_heads": 2,
        "num_key_value_heads": 2,
        "decoder_dim": 16,
        "codebook_size": V_CODEC,
        "num_quantizers": G,
        "sliding_window": 8,
        "upsample_rates": [2, 2],
        "upsampling_ratios": [2],
    }
    return cfg


def speech_weights(cfg, seed=0, scale=0.08):
    w = tiny_omni_weights(cfg, seed)
    rng = np.random.default_rng(seed + 7)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tc = cfg["talker_config"]["text_config"]
    D, hd = tc["hidden_size"], tc["head_dim"]
    nH, nKV = tc["num_attention_heads"], tc["num_key_value_heads"]
    E, Im = tc["num_experts"], tc["moe_intermediate_size"]
    thinker_d = cfg["thinker_config"]["text_config"]["hidden_size"]

    for i in range(tc["num_hidden_layers"]):
        p = f"talker.model.layers.{i}."
        w[p + "self_attn.q_proj.weight"] = rand(nH * hd, D)
        w[p + "self_attn.k_proj.weight"] = rand(nKV * hd, D)
        w[p + "self_attn.v_proj.weight"] = rand(nKV * hd, D)
        w[p + "self_attn.o_proj.weight"] = rand(D, nH * hd)
        w[p + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
        w[p + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "mlp.gate.weight"] = rand(E, D)
        for e in range(E):
            w[p + f"mlp.experts.{e}.gate_proj.weight"] = rand(Im, D)
            w[p + f"mlp.experts.{e}.up_proj.weight"] = rand(Im, D)
            w[p + f"mlp.experts.{e}.down_proj.weight"] = rand(D, Im)
        sh = tc["shared_expert_intermediate_size"]
        w[p + "mlp.shared_expert.gate_proj.weight"] = rand(sh, D)
        w[p + "mlp.shared_expert.up_proj.weight"] = rand(sh, D)
        w[p + "mlp.shared_expert.down_proj.weight"] = rand(D, sh)
        w[p + "mlp.shared_expert_gate.weight"] = rand(1, D)
    w["talker.model.norm.weight"] = np.ones(D, np.float32)
    w["talker.model.codec_embedding.weight"] = rand(V_CODEC, D)
    w["talker.codec_head.weight"] = rand(V_CODEC, D)
    for nm in ("text_projection", "hidden_projection"):
        w[f"talker.{nm}.linear_fc1.weight"] = rand(
            tc["intermediate_size"], thinker_d)
        w[f"talker.{nm}.linear_fc1.bias"] = rand(tc["intermediate_size"])
        w[f"talker.{nm}.linear_fc2.weight"] = rand(
            D, tc["intermediate_size"])
        w[f"talker.{nm}.linear_fc2.bias"] = rand(D)

    cp = cfg["talker_config"]["code_predictor_config"]
    for i in range(cp["num_hidden_layers"]):
        p = f"talker.code_predictor.model.layers.{i}."
        w[p + "self_attn.q_proj.weight"] = rand(
            cp["num_attention_heads"] * cp["head_dim"], D_CP)
        w[p + "self_attn.k_proj.weight"] = rand(
            cp["num_key_value_heads"] * cp["head_dim"], D_CP)
        w[p + "self_attn.v_proj.weight"] = rand(
            cp["num_key_value_heads"] * cp["head_dim"], D_CP)
        w[p + "self_attn.o_proj.weight"] = rand(
            D_CP, cp["num_attention_heads"] * cp["head_dim"])
        w[p + "self_attn.q_norm.weight"] = np.ones(cp["head_dim"],
                                                   np.float32)
        w[p + "self_attn.k_norm.weight"] = np.ones(cp["head_dim"],
                                                   np.float32)
        w[p + "input_layernorm.weight"] = np.ones(D_CP, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D_CP, np.float32)
        w[p + "mlp.gate_proj.weight"] = rand(cp["intermediate_size"], D_CP)
        w[p + "mlp.up_proj.weight"] = rand(cp["intermediate_size"], D_CP)
        w[p + "mlp.down_proj.weight"] = rand(D_CP, cp["intermediate_size"])
    w["talker.code_predictor.model.norm.weight"] = np.ones(D_CP, np.float32)
    for j in range(G - 1):
        w[f"talker.code_predictor.model.codec_embedding.{j}.weight"] = rand(
            V_CODEC, D_CP)
        w[f"talker.code_predictor.lm_head.{j}.weight"] = rand(V_CODEC, D_CP)

    # ---- code2wav
    cw = cfg["code2wav_config"]
    d = cw["hidden_size"]
    w["code2wav.code_embedding.weight"] = rand(G * V_CODEC, d)
    p = "code2wav.pre_transformer.layers.0."
    w[p + "self_attn.q_proj.weight"] = rand(d, d)
    w[p + "self_attn.k_proj.weight"] = rand(d, d)
    w[p + "self_attn.v_proj.weight"] = rand(d, d)
    w[p + "self_attn.o_proj.weight"] = rand(d, d)
    w[p + "input_layernorm.weight"] = np.ones(d, np.float32)
    w[p + "post_attention_layernorm.weight"] = np.ones(d, np.float32)
    w[p + "self_attn_layer_scale.scale"] = np.full(d, 0.01, np.float32)
    w[p + "mlp_layer_scale.scale"] = np.full(d, 0.01, np.float32)
    w[p + "mlp.gate_proj.weight"] = rand(cw["intermediate_size"], d)
    w[p + "mlp.up_proj.weight"] = rand(cw["intermediate_size"], d)
    w[p + "mlp.down_proj.weight"] = rand(d, cw["intermediate_size"])
    w["code2wav.pre_transformer.norm.weight"] = np.ones(d, np.float32)

    w["code2wav.upsample.0.0.conv.weight"] = rand(d, d, 2)   # convT (in,out,k)
    w["code2wav.upsample.0.0.conv.bias"] = rand(d)
    w["code2wav.upsample.0.1.dwconv.conv.weight"] = rand(d, 1, 7)
    w["code2wav.upsample.0.1.dwconv.conv.bias"] = rand(d)
    w["code2wav.upsample.0.1.norm.weight"] = np.ones(d, np.float32)
    w["code2wav.upsample.0.1.norm.bias"] = np.zeros(d, np.float32)
    w["code2wav.upsample.0.1.pwconv1.weight"] = rand(4 * d, d)
    w["code2wav.upsample.0.1.pwconv1.bias"] = rand(4 * d)
    w["code2wav.upsample.0.1.pwconv2.weight"] = rand(d, 4 * d)
    w["code2wav.upsample.0.1.pwconv2.bias"] = rand(d)
    w["code2wav.upsample.0.1.gamma"] = np.full(d, 1e-2, np.float32)

    dd = cw["decoder_dim"]
    w["code2wav.decoder.0.conv.weight"] = rand(dd, d, 7)
    w["code2wav.decoder.0.conv.bias"] = rand(dd)
    for bi, rate in enumerate(cw["upsample_rates"]):
        in_d = dd // (2 ** bi)
        out_d = dd // (2 ** (bi + 1))
        p = f"code2wav.decoder.{bi + 1}.block."
        w[p + "0.alpha"] = np.zeros(in_d, np.float32)
        w[p + "0.beta"] = np.zeros(in_d, np.float32)
        w[p + "1.conv.weight"] = rand(in_d, out_d, 2 * rate)  # convT
        w[p + "1.conv.bias"] = rand(out_d)
        for ri in range(3):
            w[p + f"{2 + ri}.act1.alpha"] = np.zeros(out_d, np.float32)
            w[p + f"{2 + ri}.act1.beta"] = np.zeros(out_d, np.float32)
            w[p + f"{2 + ri}.conv1.conv.weight"] = rand(out_d, out_d, 7)
            w[p + f"{2 + ri}.conv1.conv.bias"] = rand(out_d)
            w[p + f"{2 + ri}.act2.alpha"] = np.zeros(out_d, np.float32)
            w[p + f"{2 + ri}.act2.beta"] = np.zeros(out_d, np.float32)
            w[p + f"{2 + ri}.conv2.conv.weight"] = rand(out_d, out_d, 1)
            w[p + f"{2 + ri}.conv2.conv.bias"] = rand(out_d)
    nb = len(cw["upsample_rates"])
    fin = dd // (2 ** nb)
    w[f"code2wav.decoder.{nb + 1}.alpha"] = np.zeros(fin, np.float32)
    w[f"code2wav.decoder.{nb + 1}.beta"] = np.zeros(fin, np.float32)
    w[f"code2wav.decoder.{nb + 2}.conv.weight"] = rand(1, fin, 7)
    w[f"code2wav.decoder.{nb + 2}.conv.bias"] = rand(1)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = speech_config()
    return load_model_from_weights(cfg, speech_weights(cfg), jnp.float32)


class TestCode2Wav:
    def test_causal_trans_conv_matches_torch_semantics(self):
        """ConvTranspose1d(k, s) via dilated conv == manual scatter sum."""
        from mlx_vlm_tpu.models.qwen3_omni_moe.code2wav import (
            causal_trans_conv1d,
        )

        rng = np.random.default_rng(0)
        Cin, Cout, k, s, L = 3, 2, 4, 2, 6
        wgt = rng.standard_normal((Cin, Cout, k)).astype(np.float32)
        x = rng.standard_normal((1, L, Cin)).astype(np.float32)
        got = np.asarray(causal_trans_conv1d(
            {"weight": jnp.asarray(wgt)}, jnp.asarray(x), s))

        # manual torch ConvTranspose1d (padding=0) then right-trim (k-s)
        full = np.zeros((1, (L - 1) * s + k, Cout), np.float32)
        for t in range(L):
            for kk in range(k):
                full[0, t * s + kk] += x[0, t] @ wgt[:, :, kk]
        ref = full[:, : full.shape[1] - (k - s)]
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_vocoder_output_length(self, model):
        codes = np.asarray(
            np.random.default_rng(1).integers(0, V_CODEC, (1, G, 6)),
            np.int32)
        wav = model.code2wav.chunked_decode(model.params["code2wav"], codes)
        up = model.code2wav.upsample_factor()
        assert up == 2 * 2 * 2
        assert wav.shape == (1, 6 * up)
        assert np.isfinite(wav).all() and (np.abs(wav) <= 1).all()

    def test_chunked_matches_full_prefix(self, model):
        """The first chunk of chunked decode is EXACT (the whole vocoder
        is causal); later chunks are approximate, bounded by the left
        context (same contract as the reference's chunked_decode)."""
        codes = np.asarray(
            np.random.default_rng(2).integers(0, V_CODEC, (1, G, 9)),
            np.int32)
        full = np.asarray(model.code2wav(
            model.params["code2wav"], jnp.asarray(codes)))
        chunked = model.code2wav.chunked_decode(
            model.params["code2wav"], codes, chunk_size=4,
            left_context_size=3)
        up = model.code2wav.upsample_factor()
        assert chunked.shape == full.shape
        np.testing.assert_allclose(
            chunked[:, : 4 * up], full[:, : 4 * up], rtol=1e-4, atol=1e-5)
        # later chunks stay close (context-bounded approximation)
        assert np.abs(chunked - full).max() < 0.1


class TestTalkerSpeech:
    def test_generate_speech_waveform(self, model):
        # assistant segment: [im_start, assistant, \n, text..., im_end]
        ids = np.asarray([[1, 2, 3, 10, 11, 12, 4]], np.int32)
        wav, sr = model.generate_speech(
            "", voice="tester", input_ids=ids, max_new_tokens=5,
            temperature=0.0)
        up = model.code2wav.upsample_factor()
        assert sr == int(up * 12.5)
        assert wav.dtype == np.float32
        assert wav.ndim == 1 and wav.size % up == 0
        assert np.isfinite(wav).all()

    def test_speed_resamples(self, model):
        ids = np.asarray([[1, 2, 3, 10, 11, 4]], np.int32)
        a, _ = model.generate_speech("", input_ids=ids, max_new_tokens=4,
                                     temperature=0.0)
        b, _ = model.generate_speech("", input_ids=ids, max_new_tokens=4,
                                     temperature=0.0, speed=2.0)
        if a.size:
            assert abs(b.size - a.size / 2) <= 1

    def test_codes_shape_and_vocab(self, model):
        from mlx_vlm_tpu.models.qwen3_omni_moe.talker import resize_mlp

        tp = model.params["talker"]
        emb = jnp.asarray(
            np.random.default_rng(3).standard_normal(
                (1, 6, D_TALKER)).astype(np.float32) * 0.1)
        trailing = emb[:, :2]
        pad = emb[:, :1]
        codes = model.talker.generate_codes(
            tp, emb, trailing, pad, max_new_tokens=3, temperature=0.0)
        assert codes.shape[0] == 1 and codes.shape[1] == G
        assert codes.shape[2] <= 3
        assert (codes >= 0).all() and (codes < V_CODEC).all()


class TestSpeechEndpointRealTalker:
    """POST /v1/audio/speech against a server whose model has a REAL
    (tiny) talker + code2wav — the endpoint must return 200 wav audio,
    not the capability-gated 400."""

    @pytest.fixture(scope="class")
    def server(self):
        import threading

        from mlx_vlm_tpu.server.app import create_server
        from tests.test_server import _free_port

        cfg = speech_config()
        model = load_model_from_weights(cfg, speech_weights(cfg),
                                        jnp.float32)

        class FakeTokenizer:
            eos_token_id = 4

            def encode(self, text, **kw):
                # [im_start, assistant, \n, text..., im_end]
                return [1, 2, 3, 10, 11, 12, 4]

        class FakeProcessor:
            tokenizer = FakeTokenizer()

        port = _free_port()
        httpd = create_server(
            model, FakeProcessor(), model_name="tiny-omni",
            host="127.0.0.1", port=port, num_slots=1, capacity=128,
            block_size=1,
        )
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        yield f"http://127.0.0.1:{port}"
        httpd.shutdown()
        httpd.state.generator.shutdown()

    def test_speech_returns_wav(self, server):
        import io
        import json
        import urllib.request

        req = urllib.request.Request(
            server + "/v1/audio/speech",
            data=json.dumps({"input": "hello there", "voice": "tester"}
                            ).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "audio/wav"
            data = r.read()
        assert data[:4] == b"RIFF"
        from scipy.io import wavfile

        sr, decoded = wavfile.read(io.BytesIO(data))
        up = 8  # tiny config upsample factor
        assert sr == int(up * 12.5)
