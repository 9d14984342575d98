"""RT-DETRv2 detection family: load pipeline, forward shapes, predictor.

Reference parity: mlx_vlm/models/rt_detr_v2 — ResNet-vd backbone, hybrid
encoder, deformable-attention decoder, focal top-K postprocessing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.utils.loader import load_model_from_weights


def _tiny_cfg():
    return {
        "model_type": "rt_detr_v2",
        "image_size": 64,
        "num_labels": 5,
        "id2label": {str(i): f"c{i}" for i in range(5)},
        "backbone_config": {
            "model_type": "rt_detr_resnet",
            "depths": [1, 1, 1, 1],
            "embedding_size": 8,
            "hidden_sizes": [16, 32, 64, 128],
            "out_features": ["stage2", "stage3", "stage4"],
        },
        "d_model": 16,
        "encoder_hidden_dim": 16,
        "encoder_in_channels": [32, 64, 128],
        "encoder_layers": 1,
        "encoder_ffn_dim": 32,
        "encoder_attention_heads": 2,
        "encode_proj_layers": [2],
        "decoder_layers": 2,
        "decoder_attention_heads": 2,
        "decoder_ffn_dim": 32,
        "decoder_in_channels": [16, 16, 16],
        "decoder_n_levels": 3,
        "decoder_n_points": 2,
        "num_queries": 10,
    }


def _hf_weights(cfg, seed=0):
    """HF-style RTDetrV2 state dict (torch key names + OIHW convs)."""
    rng = np.random.default_rng(seed)
    w = {}

    def lin(p, i, o, bias=True):
        w[f"{p}.weight"] = rng.standard_normal((o, i)).astype(np.float32) * 0.1
        if bias:
            w[f"{p}.bias"] = np.zeros(o, np.float32)

    def conv(p, i, o, k):
        w[f"{p}.weight"] = rng.standard_normal(
            (o, i, k, k)).astype(np.float32) * 0.1

    def bn(p, c):
        w[f"{p}.weight"] = np.ones(c, np.float32)
        w[f"{p}.bias"] = np.zeros(c, np.float32)
        w[f"{p}.running_mean"] = np.zeros(c, np.float32)
        w[f"{p}.running_var"] = np.ones(c, np.float32)
        w[f"{p}.num_batches_tracked"] = np.zeros((), np.int64)

    def conv_norm(p, i, o, k):
        conv(f"{p}.convolution", i, o, k)
        bn(f"{p}.normalization", o)

    def enc_conv(p, i, o, k):
        conv(f"{p}.conv", i, o, k)
        bn(f"{p}.norm", o)

    def ln(p, c):
        w[f"{p}.weight"] = np.ones(c, np.float32)
        w[f"{p}.bias"] = np.zeros(c, np.float32)

    bc = cfg["backbone_config"]
    emb = bc["embedding_size"]
    bb = "model.backbone.model"
    conv_norm(f"{bb}.embedder.embedder.0", 3, emb // 2, 3)
    conv_norm(f"{bb}.embedder.embedder.1", emb // 2, emb // 2, 3)
    conv_norm(f"{bb}.embedder.embedder.2", emb // 2, emb, 3)
    prev = emb
    for s, (out, depth) in enumerate(zip(bc["hidden_sizes"], bc["depths"])):
        for b in range(depth):
            p = f"{bb}.encoder.stages.{s}.layers.{b}"
            i = prev if b == 0 else out
            red = out // 4
            if b == 0:
                if s == 0:  # stride 1, channels change: plain shortcut
                    conv(f"{p}.shortcut.convolution", i, out, 1)
                    bn(f"{p}.shortcut.normalization", out)
                else:       # stride 2: AvgPool + ShortCut at index .1
                    conv(f"{p}.shortcut.1.convolution", i, out, 1)
                    bn(f"{p}.shortcut.1.normalization", out)
            conv_norm(f"{p}.layer.0", i, red, 1)
            conv_norm(f"{p}.layer.1", red, red, 3)
            conv_norm(f"{p}.layer.2", red, out, 1)
        prev = out

    d = cfg["d_model"]
    for l, c in enumerate(cfg["encoder_in_channels"]):
        conv(f"model.encoder_input_proj.{l}.0", c, d, 1)
        bn(f"model.encoder_input_proj.{l}.1", d)

    # AIFI (saved under encoder.encoder.{i})
    for i in range(len(cfg["encode_proj_layers"])):
        for j in range(cfg["encoder_layers"]):
            p = f"model.encoder.encoder.{i}.layers.{j}"
            for h in ("q_proj", "k_proj", "v_proj", "out_proj"):
                lin(f"{p}.self_attn.{h}", d, d)
            ln(f"{p}.self_attn_layer_norm", d)
            lin(f"{p}.fc1", d, cfg["encoder_ffn_dim"])
            lin(f"{p}.fc2", cfg["encoder_ffn_dim"], d)
            ln(f"{p}.final_layer_norm", d)

    n_fpn = len(cfg["encoder_in_channels"]) - 1
    for i in range(n_fpn):
        enc_conv(f"model.encoder.lateral_convs.{i}", d, d, 1)
        enc_conv(f"model.encoder.downsample_convs.{i}", d, d, 3)
        for blk in ("fpn_blocks", "pan_blocks"):
            p = f"model.encoder.{blk}.{i}"
            enc_conv(f"{p}.conv1", 2 * d, d, 1)
            enc_conv(f"{p}.conv2", 2 * d, d, 1)
            for j in range(3):
                enc_conv(f"{p}.bottlenecks.{j}.conv1", d, d, 3)
                enc_conv(f"{p}.bottlenecks.{j}.conv2", d, d, 1)

    for l in range(len(cfg["decoder_in_channels"])):
        conv(f"model.decoder_input_proj.{l}.0", d, d, 1)
        bn(f"model.decoder_input_proj.{l}.1", d)

    lin("model.enc_output.0", d, d)
    ln("model.enc_output.1", d)
    lin("model.enc_score_head", d, cfg["num_labels"])
    for i, (di, do) in enumerate([(d, d), (d, d), (d, 4)]):
        lin(f"model.enc_bbox_head.layers.{i}", di, do)
    w["model.denoising_class_embed.weight"] = rng.standard_normal(
        (cfg["num_labels"] + 1, d)).astype(np.float32) * 0.1

    nL, nP = cfg["decoder_n_levels"], cfg["decoder_n_points"]
    nH = cfg["decoder_attention_heads"]
    for i in range(cfg["decoder_layers"]):
        p = f"model.decoder.layers.{i}"
        for h in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin(f"{p}.self_attn.{h}", d, d)
        ln(f"{p}.self_attn_layer_norm", d)
        lin(f"{p}.encoder_attn.sampling_offsets", d, nH * nL * nP * 2)
        lin(f"{p}.encoder_attn.attention_weights", d, nH * nL * nP)
        lin(f"{p}.encoder_attn.value_proj", d, d)
        lin(f"{p}.encoder_attn.output_proj", d, d)
        ln(f"{p}.encoder_attn_layer_norm", d)
        lin(f"{p}.fc1", d, cfg["decoder_ffn_dim"])
        lin(f"{p}.fc2", cfg["decoder_ffn_dim"], d)
        ln(f"{p}.final_layer_norm", d)
    for i, (di, do) in enumerate([(4, 2 * d), (2 * d, d)]):
        lin(f"model.decoder.query_pos_head.layers.{i}", di, do)
    for l in range(cfg["decoder_layers"]):
        lin(f"model.decoder.class_embed.{l}", d, cfg["num_labels"])
        for i, (di, do) in enumerate([(d, d), (d, d), (d, 4)]):
            lin(f"model.decoder.bbox_embed.{l}.layers.{i}", di, do)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = _tiny_cfg()
    return load_model_from_weights(cfg, _hf_weights(cfg), jnp.float32)


class TestRTDetrV2:
    def test_forward_shapes(self, model):
        px = jnp.asarray(
            np.random.default_rng(0).random((2, 64, 64, 3)), jnp.float32)
        out = jax.jit(lambda p, x: model(p, x))(model.params, px)
        assert out["pred_logits"].shape == (2, 10, 5)
        assert out["pred_boxes"].shape == (2, 10, 4)
        boxes = np.asarray(out["pred_boxes"])
        assert (boxes >= 0).all() and (boxes <= 1).all()
        assert np.isfinite(np.asarray(out["pred_logits"])).all()

    def test_iterative_refinement_trajectory(self, model):
        px = jnp.asarray(
            np.random.default_rng(1).random((1, 64, 64, 3)), jnp.float32)
        out = model(model.params, px)
        refs = np.asarray(out["intermediate_reference_points"])
        assert refs.shape == (1, 2, 10, 4)
        # box refinement actually changes the boxes layer to layer
        assert np.abs(refs[:, 0] - refs[:, 1]).max() > 1e-6

    def test_predictor_end_to_end(self, model):
        from PIL import Image

        from mlx_vlm_tpu.models.rt_detr_v2 import (
            RTDetrV2Predictor,
            RTDetrV2Processor,
        )
        from mlx_vlm_tpu.models.rt_detr_v2.processing import (
            RTDetrV2ProcessorConfig,
        )

        img = Image.fromarray(
            (np.random.default_rng(2).random((48, 80, 3)) * 255
             ).astype(np.uint8))
        proc = RTDetrV2Processor(RTDetrV2ProcessorConfig(image_size=64))
        pred = RTDetrV2Predictor(model, proc, threshold=0.0)
        res = pred.predict(img)
        assert res.boxes.shape[1] == 4
        assert len(res.scores) == len(res.labels) == len(res.class_names)
        assert res.class_names and res.class_names[0].startswith("c")
        # boxes land inside the ORIGINAL image frame (80x48)
        assert (res.boxes[:, [0, 2]] <= 80).all()
        assert (res.boxes[:, [1, 3]] <= 48).all()

    def test_bilinear_gather_matches_numpy(self):
        """The TPU gather-based sampler vs a straightforward numpy
        bilinear (align_corners=False, zero padding)."""
        from mlx_vlm_tpu.models.rt_detr_v2.rt_detr_v2 import _bilinear_gather

        rng = np.random.default_rng(3)
        H, W, C = 5, 7, 4
        v = rng.standard_normal((2, H * W, C)).astype(np.float32)
        loc = rng.uniform(-0.1, 1.1, (2, 9, 2)).astype(np.float32)
        got = np.asarray(_bilinear_gather(
            jnp.asarray(v), jnp.asarray(loc), H, W, False))

        def ref_one(vmap, xy):
            x = xy[0] * W - 0.5
            y = xy[1] * H - 0.5
            x0, y0 = int(np.floor(x)), int(np.floor(y))
            dx, dy = x - x0, y - y0
            out = np.zeros(C, np.float32)
            for (cx, cy, wgt) in [(x0, y0, (1 - dx) * (1 - dy)),
                                  (x0 + 1, y0, dx * (1 - dy)),
                                  (x0, y0 + 1, (1 - dx) * dy),
                                  (x0 + 1, y0 + 1, dx * dy)]:
                if 0 <= cx < W and 0 <= cy < H:
                    out += wgt * vmap[cy * W + cx]
            return out

        for b in range(2):
            for s in range(9):
                np.testing.assert_allclose(
                    got[b, s], ref_one(v[b], loc[b, s]), rtol=1e-5,
                    atol=1e-5)
