"""FastVLM: FastViT-HD conv-hybrid tower + qwen2 decoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_cfg():
    return {
        "model_type": "fastvlm",
        "image_token_index": -200,
        "mm_hidden_size": 32,  # cls_ratio * embed_dims[-1]
        "mm_projector_type": "mlp2x_gelu",
        "text_config": {
            "model_type": "qwen2",
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "intermediate_size": 64,
            "vocab_size": 128,
            "rms_norm_eps": 1e-6,
        },
        "vision_config": {
            "model_type": "fastvithd",
            "layers": [1, 1, 1, 1, 1],
            "embed_dims": [8, 8, 8, 16, 16],
            "mlp_ratios": [2, 2, 2, 2, 2],
            "pos_embs_shapes": [None, None, None, [3, 3], [3, 3]],
            "token_mixers": ["repmixer", "repmixer", "repmixer",
                             "attention", "attention"],
            "down_patch_size": 3,
            "down_stride": 2,
            "cls_ratio": 2.0,
            "head_dim": 8,
        },
    }


def weights(cfg, seed=0):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.1).astype(np.float32)

    vc = cfg["vision_config"]
    dims = vc["embed_dims"]
    tc = cfg["text_config"]
    D, V = tc["hidden_size"], tc["vocab_size"]
    P = "model.vision_tower.vision_tower.model."
    w = {}

    def conv(base, o, i, k, bias=True):
        w[base + ".weight"] = rand(o, i, k, k)
        if bias:
            w[base + ".bias"] = rand(o)

    def mobileone(base, o, i, k, groups=1, se=False):
        conv(base + ".reparam_conv", o, i // groups, k)
        if se:
            rd = max(int(o * 0.0625), 1)
            conv(base + ".se.reduce", rd, o, 1)
            conv(base + ".se.expand", o, rd, 1)

    def convffn(base, dim, hidden):
        conv(base + ".conv.conv", dim, 1, 7, bias=False)  # depthwise
        w[base + ".conv.bn.weight"] = 1.0 + rand(dim) * 0.1
        w[base + ".conv.bn.bias"] = rand(dim)
        w[base + ".conv.bn.running_mean"] = rand(dim) * 0.1
        w[base + ".conv.bn.running_var"] = 1.0 + rand(dim) * 0.1
        conv(base + ".fc1", hidden, dim, 1)
        conv(base + ".fc2", dim, hidden, 1)

    # stem
    mobileone(P + "patch_embed.0", dims[0], 3, 3)
    mobileone(P + "patch_embed.1", dims[0], dims[0], 3, groups=dims[0])
    mobileone(P + "patch_embed.2", dims[0], dims[0], 1)
    # network plan: s0 pe s1 pe s2 pe cpe s3 pe cpe s4
    idx = 0
    for i in range(5):
        dim = dims[i]
        if vc["pos_embs_shapes"][i] is not None:
            conv(P + f"network.{idx}.reparam_conv", dim, 1, 3)  # dw
            idx += 1
        for b in range(vc["layers"][i]):
            base = P + f"network.{idx}.{b}"
            hid = dim * vc["mlp_ratios"][i]
            if vc["token_mixers"][i] == "repmixer":
                conv(base + ".token_mixer.reparam_conv", dim, 1, 3)
                w[base + ".layer_scale"] = np.full((1, 1, dim), 0.5,
                                                   np.float32)
            else:
                w[base + ".norm.weight"] = np.ones(dim, np.float32)
                w[base + ".norm.bias"] = np.zeros(dim, np.float32)
                w[base + ".token_mixer.qkv.weight"] = rand(3 * dim, dim)
                w[base + ".token_mixer.proj.weight"] = rand(dim, dim)
                w[base + ".token_mixer.proj.bias"] = rand(dim)
                w[base + ".layer_scale_1"] = np.full((1, 1, dim), 0.5,
                                                     np.float32)
                w[base + ".layer_scale_2"] = np.full((1, 1, dim), 0.5,
                                                     np.float32)
            convffn(base + ".convffn", dim, hid)
        idx += 1
        if i < 4:
            conv(P + f"network.{idx}.proj.0.lkb_reparam", dims[i + 1], 1,
                 vc["down_patch_size"])
            mobileone(P + f"network.{idx}.proj.1", dims[i + 1],
                      dims[i + 1], 1)
            idx += 1
    # conv_exp + projector
    mobileone(P + "conv_exp", int(dims[-1] * 2), dims[-1], 3,
              groups=dims[-1], se=True)
    w["model.mm_projector.0.weight"] = rand(D, cfg["mm_hidden_size"])
    w["model.mm_projector.0.bias"] = rand(D)
    w["model.mm_projector.2.weight"] = rand(D, D)
    w["model.mm_projector.2.bias"] = rand(D)
    # qwen2 text
    w["model.embed_tokens.weight"] = rand(V, D)
    w["model.norm.weight"] = np.ones(D, np.float32)
    w["lm_head.weight"] = rand(V, D)
    for i in range(2):
        p = f"model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.q_proj.weight"] = rand(D, D)
        w[p + "self_attn.q_proj.bias"] = rand(D)
        w[p + "self_attn.k_proj.weight"] = rand(16, D)
        w[p + "self_attn.k_proj.bias"] = rand(16)
        w[p + "self_attn.v_proj.weight"] = rand(16, D)
        w[p + "self_attn.v_proj.bias"] = rand(16)
        w[p + "self_attn.o_proj.weight"] = rand(D, D)
        w[p + "mlp.gate_proj.weight"] = rand(64, D)
        w[p + "mlp.up_proj.weight"] = rand(64, D)
        w[p + "mlp.down_proj.weight"] = rand(D, 64)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    return load_model_from_weights(cfg, weights(cfg), jnp.float32)


class TestFastVLM:
    def test_feature_map_shape(self, model):
        # 64x64 input: stem /4 -> 16, four downsamples /2 each -> 1
        px = jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, 64, 64, 3)).astype(np.float32) * 0.1)
        feats = model.vision_features(model.params, px)
        assert feats.shape == (1, 32)  # 1x1 map, projected to D

    def test_image_generate(self, model):
        ids = np.asarray([[1, -200, 5, 6]], np.int32)
        px = np.random.default_rng(1).standard_normal(
            (1, 64, 64, 3)).astype(np.float32) * 0.1
        e = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), pixel_values=jnp.asarray(px))
        toks = [int(t[0]) for t, _ in generate_step(e, model,
                                                    max_tokens=3)]
        assert len(toks) == 3

    def test_bn_folding_exact(self):
        """Folded conv must equal conv+BN applied sequentially."""
        from mlx_vlm_tpu.models.fastvlm.vision import VisionModel

        rng = np.random.default_rng(3)
        dim = 8
        w = {"x.conv.conv.weight": rng.standard_normal(
                (dim, 1, 7, 7)).astype(np.float32),
             "x.conv.bn.weight": 1.0 + rng.standard_normal(
                 dim).astype(np.float32) * 0.1,
             "x.conv.bn.bias": rng.standard_normal(dim).astype(np.float32),
             "x.conv.bn.running_mean": rng.standard_normal(
                 dim).astype(np.float32),
             "x.conv.bn.running_var": 1.0 + np.abs(rng.standard_normal(
                 dim)).astype(np.float32)}
        folded = VisionModel.fold_bn(dict(w))
        x = rng.standard_normal((1, 8, 8, dim)).astype(np.float32)
        import jax.numpy as jnp
        from mlx_vlm_tpu.models.fastvlm.vision import conv2d

        def hwio(a):
            return jnp.asarray(np.transpose(a, (2, 3, 1, 0)))

        y_fold = conv2d({"weight": hwio(folded["x.conv.conv.weight"]),
                         "bias": jnp.asarray(folded["x.conv.conv.bias"])},
                        jnp.asarray(x), padding=3, groups=dim)
        y_raw = conv2d({"weight": hwio(w["x.conv.conv.weight"])},
                       jnp.asarray(x), padding=3, groups=dim)
        scale = w["x.conv.bn.weight"] / np.sqrt(
            w["x.conv.bn.running_var"] + 1e-5)
        y_bn = (np.asarray(y_raw) - w["x.conv.bn.running_mean"]) * scale \
            + w["x.conv.bn.bias"]
        np.testing.assert_allclose(np.asarray(y_fold), y_bn, atol=1e-4)
