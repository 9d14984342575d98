"""Gemma3n multimodal towers: conformer audio + MobileNetV5 vision + merge.

Contract parity: reference mlx_vlm/models/gemma3n/audio.py (chunked local
attention with relative bias :216, cumulative group norm :465, SSCP
subsampling :689, 4x reduction) and vision.py (UIR/ER/MQA blocks, MSFA
fusion), gemma3n.py soft/hard multimodal embedders + scatter.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.models.gemma3n.audio import (AudioConfig, AudioModel,
                                              cumulative_group_norm)
from mlx_vlm_tpu.models.gemma3n.vision import (VisionConfig, VisionTower,
                                               _er, _mqa, _uir)
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from tests.test_gemma3n import tiny_g3n_config, tiny_g3n_weights


def tiny_audio_config():
    return AudioConfig(
        input_feat_size=12,
        hidden_size=16,
        conf_attention_chunk_size=4,
        conf_attention_context_left=3,
        conf_attention_context_right=0,
        conf_num_attention_heads=2,
        conf_num_hidden_layers=2,
        conf_conv_kernel_size=3,
        conf_reduction_factor=2,
        sscp_conv_channel_size=(4, 2),
        vocab_size=16,
        vocab_offset=240,
    )


def tiny_audio_params(cfg: AudioConfig, seed=0, scale=0.08):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    D = cfg.hidden_size
    # conv_0: HWIO [3,3,1,4]; conv_1: [3,3,4,2]
    f_out = ((cfg.input_feat_size + 2 - 3) // 2 + 1)
    f_out2 = ((f_out + 2 - 3) // 2 + 1)
    params = {
        "subsample_conv_projection": {
            "conv_0": {"conv": {"weight": rand(3, 3, 1, 4)},
                       "norm": {"weight": jnp.ones(4)}},
            "conv_1": {"conv": {"weight": rand(3, 3, 4, 2)},
                       "norm": {"weight": jnp.ones(2)}},
            "input_proj_linear": {"weight": rand(D, f_out2 * 2)},
        },
    }

    def one_block():
        def ffw():
            return {"pre_layer_norm": {"weight": jnp.ones(D)},
                    "ffw_layer_1": {"weight": rand(4 * D, D)},
                    "ffw_layer_2": {"weight": rand(D, 4 * D)},
                    "post_layer_norm": {"weight": jnp.ones(D)}}

        return {
            "ffw_layer_start": ffw(),
            "ffw_layer_end": ffw(),
            "attention": {
                "pre_attn_norm": {"weight": jnp.ones(D)},
                "post": {"weight": rand(D, D)},
                "post_norm": {"weight": jnp.ones(D)},
                "attn": {
                    "q_proj": {"weight": rand(D, D)},
                    "k_proj": {"weight": rand(D, D)},
                    "v_proj": {"weight": rand(D, D)},
                    "per_dim_scale": jnp.zeros(D // 2),
                    "relative_position_embedding": {
                        "pos_proj": {"weight": rand(D, D)}},
                },
            },
            "lconv1d": {
                "pre_layer_norm": {"weight": jnp.ones(D)},
                "linear_start": {"weight": rand(2 * D, D)},
                "depthwise_conv1d": {"weight": rand(
                    D, cfg.conf_conv_kernel_size)},
                "conv_norm": {"weight": jnp.ones(D)},
                "linear_end": {"weight": rand(D, D)},
            },
            "norm": {"weight": jnp.ones(D)},
        }

    blocks = [one_block() for _ in range(cfg.conf_num_hidden_layers)]
    params["conformer"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return params


class TestCumulativeGroupNorm:
    def test_matches_reference_recurrence(self):
        """var_t accumulates squared diffs against each step's own running
        mean (reference :465 — NOT the global variance)."""
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 5, 3, 4)).astype(np.float32)
        out = np.asarray(cumulative_group_norm(jnp.asarray(x), None, 1e-3))
        n_feat = 12
        cum_sum = 0.0
        cum_sq = 0.0
        for t in range(5):
            cum_sum += x[0, t].sum()
            mean_t = cum_sum / (n_feat * (t + 1))
            cum_sq += ((x[0, t] - mean_t) ** 2).sum()
        # NOTE: reference computes sq-diff per step against that step's
        # cumulative mean; recompute faithfully
        cum_sum = 0.0
        sq_terms = []
        for t in range(5):
            cum_sum += x[0, t].sum()
            mean_t = cum_sum / (n_feat * (t + 1))
            sq_terms.append(((x[0, t] - mean_t) ** 2).sum())
        var_T = sum(sq_terms) / (n_feat * 5)
        mean_T = x[0].sum() / (n_feat * 5)
        expect = (x[0, -1] - mean_T) / np.sqrt(var_T + 1e-3)
        np.testing.assert_allclose(out[0, -1], expect, rtol=1e-4,
                                   atol=1e-5)

    def test_causality(self):
        """Changing later frames must not affect earlier outputs."""
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 6, 2, 3)), jnp.float32)
        y1 = cumulative_group_norm(x, None, 1e-3)
        x2 = x.at[:, 4:].set(99.0)
        y2 = cumulative_group_norm(x2, None, 1e-3)
        np.testing.assert_allclose(np.asarray(y1[:, :4]),
                                   np.asarray(y2[:, :4]), rtol=1e-5)


class TestAudioTower:
    def test_shapes_and_reduction(self):
        cfg = tiny_audio_config()
        tower = AudioModel(cfg)
        params = tiny_audio_params(cfg)
        mel = jnp.asarray(np.random.default_rng(2).standard_normal(
            (1, 32, cfg.input_feat_size)), jnp.float32)
        out, mask = tower(params, mel)
        # SSCP: T 32 -> 16 -> 8; reduction 2 -> 4
        assert out.shape == (1, 4, cfg.hidden_size)
        assert mask.shape == (1, 4)
        assert np.isfinite(np.asarray(out)).all()

    def test_padding_masked_out(self):
        cfg = tiny_audio_config()
        tower = AudioModel(cfg)
        params = tiny_audio_params(cfg)
        mel = jnp.asarray(np.random.default_rng(3).standard_normal(
            (1, 32, cfg.input_feat_size)), jnp.float32)
        pad_mask = jnp.asarray(
            np.concatenate([np.zeros((1, 16), bool),
                            np.ones((1, 16), bool)], 1))
        out, mask = tower(params, mel, pad_mask)
        assert bool(mask[0, -1])  # tail is padded
        np.testing.assert_allclose(np.asarray(out[0, -1]), 0.0)

    def test_local_attention_window(self):
        """A frame far in the future must not influence an early chunk
        (left context 3 chunks of 4, right 0 -> strictly causal)."""
        cfg = tiny_audio_config()
        tower = AudioModel(cfg)
        params = tiny_audio_params(cfg)
        rng = np.random.default_rng(4)
        mel = rng.standard_normal((1, 32, cfg.input_feat_size)).astype(
            np.float32)
        out1, _ = tower(params, jnp.asarray(mel))
        mel2 = mel.copy()
        mel2[:, 28:] += 50.0  # perturb the tail only
        out2, _ = tower(params, jnp.asarray(mel2))
        np.testing.assert_allclose(np.asarray(out1[0, 0]),
                                   np.asarray(out2[0, 0]), rtol=1e-4,
                                   atol=1e-5)


TINY_PLAN = [
    [_er(3, 8, 2)],
    [_uir(3, 3, 12, 2, 2.0)],
    [_uir(3, 0, 12, 1, 2.0), _mqa(2, 4, 1)],
    [_uir(3, 3, 16, 2, 2.0)],
]


def tiny_vision_params(seed=0, scale=0.08):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    def cna(cin, cout, k):
        return {"conv": {"weight": rand(k, k, cin, cout)},
                "bn": {"weight": jnp.ones(cout)}}

    def uir(cin, cout, ks, km, e):
        mid = int(cin * e + 4) // 8 * 8 or 8
        p = {}
        if ks:
            p["dw_start"] = {"conv": {"weight": rand(ks, ks, 1, cin)},
                             "bn": {"weight": jnp.ones(cin)}}
        p["pw_exp"] = cna(cin, mid, 1)
        if km:
            p["dw_mid"] = {"conv": {"weight": rand(km, km, 1, mid)},
                           "bn": {"weight": jnp.ones(mid)}}
        p["pw_proj"] = cna(mid, cout, 1)
        p["layer_scale"] = {"gamma": jnp.ones(cout) * 1e-1}
        return p

    tm = {"conv_stem": {"conv": {"weight": rand(3, 3, 3, 6),
                                 "bias": rand(6)},
                        "bn": {"weight": jnp.ones(6)}},
          "blocks": {}}
    # stage 0: er 6->8
    mid0 = 6 * 4
    tm["blocks"]["0"] = {"0": {
        "conv_exp": {"weight": rand(3, 3, 6, mid0)},
        "bn1": {"weight": jnp.ones(mid0)},
        "conv_pwl": {"weight": rand(1, 1, mid0, 8)},
        "bn2": {"weight": jnp.ones(8)},
    }}
    tm["blocks"]["1"] = {"0": uir(8, 12, 3, 3, 2.0)}
    tm["blocks"]["2"] = {
        "0": uir(12, 12, 3, 0, 2.0),
        "1": {"norm": {"weight": jnp.ones(12)},
              "attn": {
                  "query": {"proj": {"weight": rand(1, 1, 12, 8),
                                     "bias": rand(8)}},
                  "key": {"proj": {"weight": rand(1, 1, 12, 4)}},
                  "value": {"proj": {"weight": rand(1, 1, 12, 4)}},
                  "output": {"proj": {"weight": rand(1, 1, 8, 12)}},
              },
              "layer_scale": {"gamma": jnp.ones(12) * 1e-1}},
    }
    tm["blocks"]["3"] = {"0": uir(12, 16, 3, 3, 2.0)}
    # msfa: in = 12 + 16 = 28 -> out 16
    mid_m = int(28 * 2.0 + 4) // 8 * 8
    msfa = {"ffn": {"pw_exp": cna(28, mid_m, 1),
                    "pw_proj": cna(mid_m, 16, 1)},
            "norm": {"weight": jnp.ones(16)}}
    return {"timm_model": tm, "msfa": msfa}


class TestVisionTower:
    def test_tiny_plan_shapes(self):
        cfg = VisionConfig(hidden_size=16)
        tower = VisionTower(cfg)
        tower.plan = TINY_PLAN
        tower.msfa_output_resolution = (4, 4)
        params = tiny_vision_params()
        # pretend msfa lives under timm_model like the HF layout
        params["timm_model"]["msfa"] = params.pop("msfa")
        px = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (1, 3, 64, 64)), jnp.float32)

        # route msfa params where the tower looks for them
        class P(dict):
            pass

        p = {"timm_model": params["timm_model"],
             "msfa": params["timm_model"]["msfa"]}
        out = tower(p, px)
        # stem /2 -> 32; stages: /2 -> 16, /2 -> 8, mqa same, /2 -> 4
        # intermediates at 8x8 (stage3... plan idx) fused and pooled
        assert out.ndim == 4
        assert out.shape[-1] == 16
        assert np.isfinite(np.asarray(out)).all()


class TestGlue:
    def _model(self):
        cfg = {
            "model_type": "gemma3n",
            "image_token_id": 230,
            "audio_token_id": 240,
            "audio_soft_tokens_per_image": 4,
            "vision_soft_tokens_per_image": 4,
            "text_config": tiny_g3n_config(),
            "vision_config": {"hidden_size": 16, "vocab_size": 10,
                              "vocab_offset": 230},
            "audio_config": {
                "input_feat_size": 12, "hidden_size": 16,
                "conf_attention_chunk_size": 4,
                "conf_attention_context_left": 3,
                "conf_attention_context_right": 0,
                "conf_num_attention_heads": 2,
                "conf_num_hidden_layers": 2,
                "conf_conv_kernel_size": 3,
                "conf_reduction_factor": 2,
                "sscp_conv_channel_size": [4, 2],
                "vocab_size": 16, "vocab_offset": 240,
            },
        }
        w = dict(tiny_g3n_weights(cfg["text_config"]))
        acfg = AudioConfig.from_dict(cfg["audio_config"])
        ap = tiny_audio_params(acfg)
        flat_audio = {}

        def flatten(tree, prefix):
            for k, v in tree.items():
                path = f"{prefix}.{k}"
                if isinstance(v, dict):
                    flatten(v, path)
                else:
                    flat_audio[path] = np.asarray(v)

        # unstack conformer blocks back to indexed keys
        sub = {k: v for k, v in ap.items() if k != "conformer"}
        flatten(sub, "audio_tower")
        for i in range(acfg.conf_num_hidden_layers):
            blk = jax.tree.map(lambda x: x[i], ap["conformer"])
            flatten(blk, f"audio_tower.conformer.{i}")
        w.update(flat_audio)
        rng = np.random.default_rng(9)

        def rand(*shape):
            return (rng.standard_normal(shape) * 0.08).astype(np.float32)

        D = cfg["text_config"]["hidden_size"]
        for nm, mmdim, voc in (("embed_vision", 16, 10),
                               ("embed_audio", 16, 16)):
            w[f"{nm}.embedding.weight"] = rand(voc, mmdim)
            w[f"{nm}.hard_embedding_norm.weight"] = np.ones(mmdim,
                                                            np.float32)
            w[f"{nm}.soft_embedding_norm.weight"] = np.ones(mmdim,
                                                            np.float32)
            w[f"{nm}.embedding_projection.weight"] = rand(D, mmdim)
        return load_model_from_weights(cfg, w, jnp.float32)

    def test_audio_merge_and_generate(self):
        from mlx_vlm_tpu.generate.ar import generate_step

        model = self._model()
        n_aud = model.config.audio_soft_tokens_per_image
        ids = np.asarray([[1, 5] + [240] * n_aud + [9]], np.int32)
        mel = jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, 32, 12)), jnp.float32)
        emb = model.get_input_embeddings(
            model.params, jnp.asarray(ids), input_features=mel)
        # channel-packed width: D + L*Dp
        tc = model.config.text_config
        assert emb.shape[-1] == (tc.hidden_size
                                 + tc.num_hidden_layers
                                 * tc.hidden_size_per_layer_input)
        toks = [int(t[0]) for t, _ in generate_step(emb, model,
                                                    max_tokens=3)]
        assert len(toks) == 3

    def test_audio_features_change_output(self):
        model = self._model()
        n_aud = model.config.audio_soft_tokens_per_image
        ids = np.asarray([[1, 5] + [240] * n_aud + [9]], np.int32)
        rng = np.random.default_rng
        mel_a = jnp.asarray(rng(1).standard_normal((1, 32, 12)), jnp.float32)
        mel_b = jnp.asarray(rng(2).standard_normal((1, 32, 12)), jnp.float32)
        ea = model.get_input_embeddings(model.params, jnp.asarray(ids),
                                        input_features=mel_a)
        eb = model.get_input_embeddings(model.params, jnp.asarray(ids),
                                        input_features=mel_b)
        assert not np.allclose(np.asarray(ea), np.asarray(eb))
        np.testing.assert_allclose(np.asarray(ea[:, :2]),
                                   np.asarray(eb[:, :2]), rtol=1e-6)
