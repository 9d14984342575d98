"""Qwen3-Omni thinker: audio tower plan/shapes + audio+image+text merge."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from tests.test_qwen3_vl import tiny_qwen3_vl_config, tiny_qwen3_vl_weights


def tiny_omni_config():
    vl = tiny_qwen3_vl_config()
    return {
        "model_type": "qwen3_omni_moe",
        "image_token_id": 64,
        "video_token_id": 65,
        "audio_token_id": 66,
        "thinker_config": {
            "text_config": {
                **vl["text_config"],
                "model_type": "qwen3_omni_moe_text_encoder",
                "num_experts": 4,
                "num_experts_per_tok": 2,
                "moe_intermediate_size": 32,
            },
            "vision_config": {
                **vl["vision_config"],
                "model_type": "qwen3_omni_moe_vision_encoder",
                "patch_size": 14,
            },
            "audio_config": {
                "model_type": "qwen3_omni_moe_audio_encoder",
                "d_model": 32,
                "encoder_layers": 2,
                "encoder_attention_heads": 4,
                "encoder_ffn_dim": 64,
                "num_mel_bins": 16,
                "output_dim": 48,
                "downsample_hidden_size": 8,
                "n_window": 4,  # chunks of 8 mel frames -> 1 post frame
                "n_window_infer": 16,
            },
        },
    }


def tiny_omni_weights(cfg, seed=0, scale=0.05):
    rng = np.random.default_rng(seed + 1)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tcfg = cfg["thinker_config"]
    vl_cfg = {
        "model_type": "qwen3_vl",
        "image_token_id": cfg["image_token_id"],
        "video_token_id": cfg["video_token_id"],
        "vision_start_token_id": 60,
        "text_config": {k: v for k, v in tcfg["text_config"].items()
                        if k not in ("num_experts", "num_experts_per_tok",
                                     "moe_intermediate_size")},
        "vision_config": tcfg["vision_config"],
    }
    base = tiny_qwen3_vl_weights(vl_cfg, seed)
    tc = tcfg["text_config"]
    D, E, Im = tc["hidden_size"], tc["num_experts"], tc["moe_intermediate_size"]
    w = {}
    for k, v in base.items():
        if k.startswith("model.visual."):
            w["thinker.visual." + k[len("model.visual."):]] = v
        elif k.startswith("model.language_model."):
            w["thinker.model." + k[len("model.language_model."):]] = v
        else:
            w["thinker." + k] = v
    # swap dense mlp for MoE experts
    for i in range(tc["num_hidden_layers"]):
        p = f"thinker.model.layers.{i}.mlp."
        for nm in ("gate_proj", "up_proj", "down_proj"):
            w.pop(p + nm + ".weight")
        w[p + "gate.weight"] = rand(E, D)
        w[p + "switch_mlp.gate_proj"] = rand(E, Im, D)
        w[p + "switch_mlp.up_proj"] = rand(E, Im, D)
        w[p + "switch_mlp.down_proj"] = rand(E, D, Im)
    ac = tcfg["audio_config"]
    d, mel, Cd = ac["d_model"], ac["num_mel_bins"], ac["downsample_hidden_size"]
    p = "thinker.audio_tower."
    w[p + "conv2d1.weight"] = rand(Cd, 1, 3, 3)
    w[p + "conv2d1.bias"] = rand(Cd)
    w[p + "conv2d2.weight"] = rand(Cd, Cd, 3, 3)
    w[p + "conv2d2.bias"] = rand(Cd)
    w[p + "conv2d3.weight"] = rand(Cd, Cd, 3, 3)
    w[p + "conv2d3.bias"] = rand(Cd)
    w[p + "conv_out.weight"] = rand(d, Cd * ((mel + 7) // 8))
    w[p + "proj1.weight"] = rand(d, d)
    w[p + "proj1.bias"] = rand(d)
    w[p + "proj2.weight"] = rand(ac["output_dim"], d)
    w[p + "proj2.bias"] = rand(ac["output_dim"])
    w[p + "ln_post.weight"] = np.ones(d, np.float32)
    w[p + "ln_post.bias"] = np.zeros(d, np.float32)
    for i in range(ac["encoder_layers"]):
        q = p + f"layers.{i}."
        for nm in ("self_attn_layer_norm", "final_layer_norm"):
            w[q + nm + ".weight"] = np.ones(d, np.float32)
            w[q + nm + ".bias"] = np.zeros(d, np.float32)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            w[q + f"self_attn.{nm}.weight"] = rand(d, d)
            w[q + f"self_attn.{nm}.bias"] = rand(d)
        w[q + "fc1.weight"] = rand(ac["encoder_ffn_dim"], d)
        w[q + "fc1.bias"] = rand(ac["encoder_ffn_dim"])
        w[q + "fc2.weight"] = rand(d, ac["encoder_ffn_dim"])
        w[q + "fc2.bias"] = rand(d)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_omni_config()
    return load_model_from_weights(cfg, tiny_omni_weights(cfg), jnp.float32)


class TestChunkPlan:
    def test_plan_counts(self):
        from mlx_vlm_tpu.models.qwen3_omni_moe.audio import (
            audio_chunk_plan, _out_len,
        )
        from mlx_vlm_tpu.models.qwen3_omni_moe.config import AudioConfig

        cfg = AudioConfig(n_window=50, n_window_infer=800)
        gather, segs, n_chunks = audio_chunk_plan([230], cfg)
        # 230 frames -> 3 chunks (100,100,30): 13+13+4 valid frames
        assert n_chunks == 3
        assert len(gather) == 13 + 13 + _out_len(30)
        assert segs.max() == 0  # window = 8 chunks -> all in one window
        # two audios never share a window
        g2, s2, _ = audio_chunk_plan([100, 100], cfg)
        assert s2[12] != s2[13]

    def test_chunking_roundtrip(self):
        from mlx_vlm_tpu.models.qwen3_omni_moe.audio import chunk_mel_features
        from mlx_vlm_tpu.models.qwen3_omni_moe.config import AudioConfig

        cfg = AudioConfig(n_window=4, num_mel_bins=3)
        x = np.arange(3 * 20, dtype=np.float32).reshape(3, 20)
        chunks = chunk_mel_features(x, [20], cfg)  # step 8 -> 3 chunks
        assert chunks.shape == (3, 3, 8)
        np.testing.assert_array_equal(chunks[0], x[:, :8])
        assert chunks[2][:, 4:].sum() == 0  # tail padded


class TestOmni:
    def test_audio_text_generate(self, model):
        cfg = model.config
        ids = np.asarray([[1, 66, 66, 2, 3]], np.int32)
        rng = np.random.default_rng(0)
        mel = rng.standard_normal((16, 16)).astype(np.float32) * 0.1
        aux = model.audio_aux_inputs(mel, [16])  # 2 chunks of 8 -> 2 frames
        assert aux["audio_chunks"].shape == (2, 16, 8)
        assert len(aux["audio_gather_idx"]) == 2
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids),
            **{k: jnp.asarray(v) for k, v in aux.items()},
        )
        plain = jax.jit(model.get_input_embeddings)(model.params,
                                                    jnp.asarray(ids))
        assert not np.allclose(np.asarray(embeds[0, 1]), np.asarray(plain[0, 1]))
        np.testing.assert_allclose(np.asarray(embeds[0, 0]),
                                   np.asarray(plain[0, 0]), atol=1e-6)
        toks = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=3)]
        assert len(toks) == 3

    def test_audio_plus_image(self, model):
        from tests.test_qwen3_vl import _image_inputs

        ids = np.asarray([[1, 64, 64, 64, 64, 66, 66, 2]], np.int32)
        pixels, vaux = _image_inputs(model)
        rng = np.random.default_rng(1)
        mel = rng.standard_normal((16, 16)).astype(np.float32) * 0.1
        aaux = model.audio_aux_inputs(mel, [16])
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids),
            pixel_values=jnp.asarray(pixels),
            **{k: jnp.asarray(v) for k, v in vaux.items()},
            **{k: jnp.asarray(v) for k, v in aaux.items()},
        )
        D = model.config.text_config.hidden_size
        assert embeds.shape == (1, 8, D * 3)  # deepstack channels packed
        toks = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=3)]
        assert len(toks) == 3
