"""nemotron_h_nano_omni: RADIO ViT + Parakeet conformer over the
nemotron_h hybrid decoder.

Parity: reference mlx_vlm/models/nemotron_h_nano_omni (pixel_shuffle:163,
VisionProjection:20, ParakeetEncoderAttention rel-shift:171, subsampling
length math:372).  Weights use RAW checkpoint keys (language_model.
backbone.*, mlp1.{0,1,3}, torch conv layouts) to exercise sanitize.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights

D, V = 32, 256  # llm width / vocab
E, PS, VL = 16, 2, 2  # vit width / patch / depth
AH, AL, AC, MB = 16, 2, 8, 8  # audio hidden / layers / sub channels / mels
PROJ = 24
IMG_ID, SND_ID = 100, 101


def _cfg(**over):
    cfg = {
        "model_type": "nemotron_h_nano_omni",
        "downsample_ratio": 0.5,
        "ps_version": "v2",
        "projector_hidden_size": PROJ,
        "vit_hidden_size": E,
        "img_context_token_id": IMG_ID,
        "sound_context_token_id": SND_ID,
        "video_temporal_patch_size": 2,
        "llm_config": {
            "model_type": "nemotron_h",
            "vocab_size": V, "hidden_size": D, "intermediate_size": 64,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "mamba_num_heads": 4, "mamba_head_dim": 8, "ssm_state_size": 8,
            "conv_kernel": 4, "n_groups": 2, "use_conv_bias": True,
            "layer_norm_epsilon": 1e-5,
            "hybrid_override_pattern": ["M", "*", "-"],
            "time_step_limit": [0.001, 100.0],
        },
        "vision_config": {
            "model_type": "radio",
            "hidden_size": E, "num_hidden_layers": VL,
            "num_attention_heads": 2, "intermediate_size": 32,
            "image_size": 4, "patch_size": PS, "max_resolution": 8,
            "args": {"register_multiple": 4,
                     "teachers": [{"name": "a"}, {"name": "b"}]},
        },
        "sound_config": {
            "model_type": "parakeet",
            "hidden_size": AH, "num_attention_heads": 2,
            "num_hidden_layers": AL, "intermediate_size": 32,
            "conv_kernel_size": 3, "subsampling_factor": 4,
            "subsampling_conv_channels": AC, "num_mel_bins": MB,
            "projection_hidden_size": 24,
            "hop_length": 160, "n_fft": 64, "win_length": 48,
        },
    }
    cfg.update(over)
    return cfg


def _weights(seed=0):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    w = {
        "language_model.backbone.embeddings.weight": rand(V, D),
        "language_model.backbone.norm_f.weight": np.ones(D, np.float32),
        "language_model.lm_head.weight": rand(V, D),
    }
    # hybrid decoder layers (M, *, -)
    H, P, N, G, K = 4, 8, 8, 2, 4
    inter = H * P
    conv_dim = inter + 2 * G * N
    pat = ["M", "*", "-"]
    for i, t in enumerate(pat):
        p = f"language_model.backbone.layers.{i}."
        w[p + "norm.weight"] = np.ones(D, np.float32)
        if t == "M":
            w[p + "mixer.in_proj.weight"] = rand(inter + conv_dim + H, D)
            w[p + "mixer.conv1d.weight"] = rand(conv_dim, 1, K)
            w[p + "mixer.conv1d.bias"] = rand(conv_dim)
            w[p + "mixer.dt_bias"] = np.zeros(H, np.float32)
            w[p + "mixer.A_log"] = np.log(np.arange(1, H + 1)).astype(
                np.float32)
            w[p + "mixer.D"] = np.ones(H, np.float32)
            w[p + "mixer.norm.weight"] = np.ones(inter, np.float32)
            w[p + "mixer.out_proj.weight"] = rand(D, inter)
        elif t == "*":
            w[p + "mixer.q_proj.weight"] = rand(4 * 8, D)
            w[p + "mixer.k_proj.weight"] = rand(2 * 8, D)
            w[p + "mixer.v_proj.weight"] = rand(2 * 8, D)
            w[p + "mixer.o_proj.weight"] = rand(D, 4 * 8)
        else:
            w[p + "mixer.up_proj.weight"] = rand(64, D)
            w[p + "mixer.down_proj.weight"] = rand(D, 64)
    # RADIO vision tower
    pg = "vision_model.radio_model.model.patch_generator."
    w["vision_model.radio_model.input_conditioner.norm_mean"] = \
        np.zeros((3, 1, 1), np.float32)
    w["vision_model.radio_model.input_conditioner.norm_std"] = \
        np.ones((3, 1, 1), np.float32)
    w[pg + "embedder.weight"] = rand(E, 3 * PS * PS)
    w[pg + "video_embedder.weight"] = rand(E, 2 * 3 * PS * PS)
    # 2 teachers -> 2 cls + (4 - 2%4)=2 registers
    w[pg + "cls_token.token"] = rand(4, E)
    w[pg + "pos_embed"] = rand(1, 16, E)  # (8/2)^2 grid
    for i in range(VL):
        b = f"vision_model.radio_model.model.blocks.{i}."
        w[b + "norm1.weight"] = np.ones(E, np.float32)
        w[b + "norm1.bias"] = np.zeros(E, np.float32)
        w[b + "attn.qkv.weight"] = rand(3 * E, E)
        w[b + "attn.qkv.bias"] = 0.02 * rand(3 * E)
        w[b + "attn.proj.weight"] = rand(E, E)
        w[b + "attn.proj.bias"] = 0.02 * rand(E)
        w[b + "norm2.weight"] = np.ones(E, np.float32)
        w[b + "norm2.bias"] = np.zeros(E, np.float32)
        w[b + "mlp.fc1.weight"] = rand(32, E)
        w[b + "mlp.fc1.bias"] = 0.02 * rand(32)
        w[b + "mlp.fc2.weight"] = rand(E, 32)
        w[b + "mlp.fc2.bias"] = 0.02 * rand(E)
    # projection mlp1 (raw torch Sequential indices)
    w["mlp1.0.weight"] = np.ones(E * 4, np.float32)
    w["mlp1.1.weight"] = rand(PROJ, E * 4)
    w["mlp1.3.weight"] = rand(D, PROJ)
    # parakeet sound encoder (torch conv layouts)
    sub = "sound_encoder.encoder.subsampling."
    w[sub + "layers.0.weight"] = rand(AC, 1, 3, 3)
    w[sub + "layers.0.bias"] = 0.02 * rand(AC)
    w[sub + "layers.2.weight"] = rand(AC, 1, 3, 3)  # depthwise groups=AC
    w[sub + "layers.2.bias"] = 0.02 * rand(AC)
    w[sub + "layers.3.weight"] = rand(AC, AC, 1, 1)
    w[sub + "layers.3.bias"] = 0.02 * rand(AC)
    w[sub + "linear.weight"] = rand(AH, AC * (MB // 4))
    w[sub + "linear.bias"] = 0.02 * rand(AH)
    for i in range(AL):
        b = f"sound_encoder.encoder.layers.{i}."
        for ff in ("feed_forward1", "feed_forward2"):
            w[b + ff + ".linear1.weight"] = rand(32, AH)
            w[b + ff + ".linear2.weight"] = rand(AH, 32)
        sa = b + "self_attn."
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj",
                     "relative_k_proj"):
            w[sa + proj + ".weight"] = rand(AH, AH)
        w[sa + "bias_u"] = 0.05 * rand(2, AH // 2)
        w[sa + "bias_v"] = 0.05 * rand(2, AH // 2)
        cv = b + "conv."
        w[cv + "pointwise_conv1.weight"] = rand(2 * AH, AH, 1)
        w[cv + "depthwise_conv.weight"] = rand(AH, 1, 3)
        w[cv + "norm.weight"] = np.ones(AH, np.float32)
        w[cv + "norm.bias"] = np.zeros(AH, np.float32)
        w[cv + "norm.running_mean"] = np.zeros(AH, np.float32)
        w[cv + "norm.running_var"] = np.ones(AH, np.float32)
        w[cv + "norm.num_batches_tracked"] = np.zeros((), np.int64)
        w[cv + "pointwise_conv2.weight"] = rand(AH, AH, 1)
        for nm in ("norm_feed_forward1", "norm_self_att", "norm_conv",
                   "norm_feed_forward2", "norm_out"):
            w[b + nm + ".weight"] = np.ones(AH, np.float32)
            w[b + nm + ".bias"] = np.zeros(AH, np.float32)
    w["sound_projection.norm.weight"] = np.ones(AH, np.float32)
    w["sound_projection.linear1.weight"] = rand(24, AH)
    w["sound_projection.linear2.weight"] = rand(D, 24)
    return w


@pytest.fixture(scope="module")
def model():
    return load_model_from_weights(_cfg(), _weights(), jnp.float32)


def test_text_generate(model):
    ids = (np.arange(6, dtype=np.int32) % 90 + 1)[None]
    e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
    toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=4)]
    assert len(toks) == 4


def test_image_embed_and_generate(model):
    # one 8x8 image: grid 4x4 = 16 patches -> pixel-shuffle(0.5) -> 4 tokens
    rng = np.random.default_rng(1)
    pv = (rng.standard_normal((1, 3, 8, 8)) * 0.3).astype(np.float32)
    ids = np.array([[2, 3] + [IMG_ID] * 4 + [5]], np.int32)
    e = model.get_input_embeddings(model.params, jnp.asarray(ids),
                                   jnp.asarray(pv))
    assert e.shape == (1, 7, D)
    # image positions must differ from plain embeds
    e0 = model.get_input_embeddings(model.params, jnp.asarray(ids))
    assert float(np.abs(np.asarray(e - e0))[0, 2:6].max()) > 1e-6
    assert float(np.abs(np.asarray(e - e0))[0, :2].max()) < 1e-7
    toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=3)]
    assert len(toks) == 3


def test_video_embed(model):
    # 3 frames pad to 4 -> 2 tubelets of 8x8 -> 2 * 4 tokens
    rng = np.random.default_rng(2)
    frames = (rng.standard_normal((3, 3, 8, 8)) * 0.3).astype(np.float32)
    ids = np.array([[2] + [IMG_ID] * 8 + [5]], np.int32)
    e = model.get_input_embeddings(
        model.params, jnp.asarray(ids),
        pixel_values_videos=jnp.asarray(frames))
    assert e.shape == (1, 10, D)


def test_audio_embed(model):
    from mlx_vlm_tpu.models.nemotron_h_nano_omni.audio import (
        subsampling_output_length,
    )

    cfg = model.config.sound_config
    T = 6
    n_tok = subsampling_output_length(cfg, T)
    rng = np.random.default_rng(3)
    mel = (rng.standard_normal((1, T, MB)) * 0.5).astype(np.float32)
    aux = model.audio_aux_inputs(mel, [T])
    assert aux["audio_feat_idx"].shape[0] == n_tok
    ids = np.array([[2] + [SND_ID] * n_tok + [5]], np.int32)
    e = model.get_input_embeddings(
        model.params, jnp.asarray(ids),
        input_audio_embeds=jnp.asarray(aux["input_audio_embeds"]),
        audio_feat_idx=jnp.asarray(aux["audio_feat_idx"]))
    assert e.shape == (1, 2 + n_tok, D)
    toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=2)]
    assert len(toks) == 2


def test_audio_padding_invariance(model):
    """A clip padded with extra mel frames must produce the same valid
    features (masked subsampling + attention)."""
    T = 6
    rng = np.random.default_rng(4)
    mel = (rng.standard_normal((1, T, MB)) * 0.5).astype(np.float32)
    aux1 = model.audio_aux_inputs(mel, [T])
    mel_pad = np.concatenate([mel, np.zeros((1, 4, MB), np.float32)], 1)
    aux2 = model.audio_aux_inputs(mel_pad, [T])

    def run(aux):
        enc = jax.jit(
            lambda p, m, ln: __import__(
                "mlx_vlm_tpu.models.nemotron_h_nano_omni.audio",
                fromlist=["parakeet_encode"],
            ).parakeet_encode(p, model.config.sound_config, m, ln)
        )(model.params["sound_encoder"]["encoder"],
          jnp.asarray(aux["input_audio_embeds"]),
          jnp.asarray([T], jnp.int32))
        return np.asarray(enc)

    from mlx_vlm_tpu.models.nemotron_h_nano_omni.audio import (
        subsampling_output_length,
    )

    n = subsampling_output_length(model.config.sound_config, T)
    e1, e2 = run(aux1), run(aux2)
    np.testing.assert_allclose(e1[:, :n], e2[:, :n], atol=2e-5, rtol=1e-4)


def test_rel_shift_indexes_relative_distance():
    """After the Transformer-XL shift, bd[q, k] must equal the score of the
    table row encoding distance q - k (reference _rel_shift:171)."""
    from mlx_vlm_tpu.models.nemotron_h_nano_omni.audio import _rel_shift

    S = 5
    raw = np.zeros((1, 1, S, 2 * S - 1), np.float32)
    # raw[q, p] = position value encoded at table index p: S-1-p
    for q in range(S):
        for p in range(2 * S - 1):
            raw[0, 0, q, p] = 100 * q + (S - 1 - p)
    shifted = np.asarray(_rel_shift(jnp.asarray(raw)))[..., :S]
    for q in range(S):
        for k in range(S):
            assert shifted[0, 0, q, k] == 100 * q + (q - k)


def test_pixel_shuffle_matches_reference(model):
    """ps_version v2 spatial fold: 4x4xE -> 2x2x4E."""
    x = jnp.arange(1 * 4 * 4 * E, dtype=jnp.float32).reshape(1, 4, 4, E)
    y = model.pixel_shuffle(x, 0.5)
    assert y.shape == (1, 2, 2, 4 * E)


def test_processor_expansion_and_tiler():
    from PIL import Image

    from mlx_vlm_tpu.models.nemotron_h_nano_omni.processing import (
        NemotronOmniProcessor,
    )

    class _Tok:
        def __call__(self, text, padding=False):
            enc = [[ord(c) % 250 for c in t[:64]] for t in text]
            return {"input_ids": enc,
                    "attention_mask": [[1] * len(e) for e in enc]}

    cfg = _cfg()
    proc = NemotronOmniProcessor(_Tok(), cfg)
    img = Image.fromarray(
        (np.random.default_rng(5).random((130, 100, 3)) * 255).astype(
            np.uint8))
    out = proc(text=["look <image> ok"], images=[img])
    pv = out["pixel_values"]
    assert pv.shape[1] == 3
    ps = cfg["vision_config"]["patch_size"]
    assert pv.shape[2] % (ps * 2) == 0 and pv.shape[3] % (ps * 2) == 0
    # audio clip: 16000 samples at hop 160 -> 101 frames -> /4 subsample
    clip = np.random.default_rng(6).standard_normal(16000).astype(np.float32)
    out = proc(text=["hear <so_embedding> now"], audio=[clip])
    assert out["input_features"].shape[-1] == MB
    assert out["feature_attention_mask"].sum() > 0


def test_mel_extractor_shapes():
    from mlx_vlm_tpu.models.nemotron_h_nano_omni.audio import (
        AudioConfig, SoundFeatureExtractor,
    )

    cfg = AudioConfig(num_mel_bins=MB, n_fft=64, win_length=48,
                      hop_length=160)
    fx = SoundFeatureExtractor(cfg)
    feats, mask, lengths = fx([np.ones(1600, np.float32),
                               np.ones(3200, np.float32)])
    assert feats.shape[0] == 2 and feats.shape[2] == MB
    assert mask.shape == feats.shape[:2]
    assert int(mask[0].sum()) == 10 and int(mask[1].sum()) == 20
    assert np.isfinite(feats).all()
    # padded rows are zeroed
    assert np.abs(feats[0, int(mask[0].sum()):]).max() == 0
