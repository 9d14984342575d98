"""DeepSeek-OCR: SAM tower (windowed rel-pos ViT), CLIP injection, fused
projector, deepseek decoder.

Contract parity: reference mlx_vlm/models/deepseekocr/ — SAM neck output
injected as CLIP patch embeddings (vision.py:167), concat(clip[:,1:],
sam_flat) fusion (deepseekocr.py:175), downsample-MLP-GELU projector
(deepseekocr.py:27), newline+view-separator layout (deepseekocr.py:258).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def tiny_ocr_config():
    return {
        "model_type": "deepseekocr",
        "image_token_id": 250,
        "text_config": {
            "model_type": "deepseek_v2",
            "hidden_size": 32,
            "intermediate_size": 64,
            "moe_intermediate_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "num_key_value_heads": 4,
            "kv_lora_rank": 16,
            "q_lora_rank": 0,
            "qk_rope_head_dim": 8,
            "qk_nope_head_dim": 8,
            "v_head_dim": 8,
            "n_routed_experts": None,
            "n_shared_experts": None,
            "first_k_dense_replace": 2,
            "vocab_size": 256,
            "rms_norm_eps": 1e-6,
            "rope_theta": 10000.0,
        },
        "vision_config": {
            "model_type": "vision",
            "layers": 2,
            "hidden_size": 16,
            "intermediate_size": 32,
            "num_attention_heads": 2,
            "image_size": 32,
            "patch_size": 8,
        },
        "sam_config": {
            "img_size": 32,
            "patch_size": 4,
            "embed_dim": 8,
            "depth": 3,
            "num_heads": 2,
            "out_chans": 8,
            "window_size": 4,
            "global_attn_indexes": [2],
            "final_out_chans": 16,
        },
        "projector_config": {
            "projector_type": "downsample_mlp_gelu",
            "input_dim": 32,
            "n_embed": 32,
            "depth": 2,
            "mlp_ratio": 1,
            "downsample_ratio": 1,
        },
    }


def tiny_ocr_weights(cfg, seed=0, scale=0.06):
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def ln(d):
        return {"weight": np.ones(d, np.float32),
                "bias": np.zeros(d, np.float32)}

    tc = cfg["text_config"]
    D, V = tc["hidden_size"], tc["vocab_size"]
    w = {
        "model.embed_tokens.weight": rand(V, D),
        "model.norm.weight": np.ones(D, np.float32),
        "lm_head.weight": rand(V, D),
    }
    # deepseek MLA decoder weights
    qd = tc["qk_rope_head_dim"] + tc["qk_nope_head_dim"]
    nh = tc["num_attention_heads"]
    for i in range(tc["num_hidden_layers"]):
        p = f"model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.q_proj.weight"] = rand(nh * qd, D)
        w[p + "self_attn.kv_a_proj_with_mqa.weight"] = rand(
            tc["kv_lora_rank"] + tc["qk_rope_head_dim"], D)
        w[p + "self_attn.kv_a_layernorm.weight"] = np.ones(
            tc["kv_lora_rank"], np.float32)
        w[p + "self_attn.kv_b_proj.weight"] = rand(
            nh * (tc["qk_nope_head_dim"] + tc["v_head_dim"]),
            tc["kv_lora_rank"])
        w[p + "self_attn.o_proj.weight"] = rand(D, nh * tc["v_head_dim"])
        w[p + "mlp.gate_proj.weight"] = rand(tc["intermediate_size"], D)
        w[p + "mlp.up_proj.weight"] = rand(tc["intermediate_size"], D)
        w[p + "mlp.down_proj.weight"] = rand(D, tc["intermediate_size"])

    # SAM
    sc = cfg["sam_config"]
    E, P = sc["embed_dim"], sc["patch_size"]
    g = sc["img_size"] // P
    sp = "model.sam_model."
    w[sp + "patch_embed.proj.weight"] = rand(E, 3, P, P)
    w[sp + "patch_embed.proj.bias"] = rand(E)
    w[sp + "pos_embed"] = rand(1, g, g, E)
    hd = E // sc["num_heads"]
    for i in range(sc["depth"]):
        q = sp + f"blocks.{i}."
        for nm in ("norm1", "norm2"):
            for kk, vv in ln(E).items():
                w[q + nm + f".{kk}"] = vv
        w[q + "attn.qkv.weight"] = rand(3 * E, E)
        w[q + "attn.qkv.bias"] = rand(3 * E)
        w[q + "attn.proj.weight"] = rand(E, E)
        w[q + "attn.proj.bias"] = rand(E)
        size = g if i in sc["global_attn_indexes"] else sc["window_size"]
        w[q + "attn.rel_pos_h"] = rand(2 * size - 1, hd)
        w[q + "attn.rel_pos_w"] = rand(2 * size - 1, hd)
        w[q + "mlp.lin1.weight"] = rand(4 * E, E)
        w[q + "mlp.lin1.bias"] = rand(4 * E)
        w[q + "mlp.lin2.weight"] = rand(E, 4 * E)
        w[q + "mlp.lin2.bias"] = rand(E)
    oc = sc["out_chans"]
    w[sp + "neck.0.weight"] = rand(oc, E, 1, 1)
    for kk, vv in ln(oc).items():
        w[sp + f"neck.1.{kk}"] = vv
    w[sp + "neck.2.weight"] = rand(oc, oc, 3, 3)
    for kk, vv in ln(oc).items():
        w[sp + f"neck.3.{kk}"] = vv
    w[sp + "net_2.weight"] = rand(12, oc, 3, 3)
    w[sp + "net_3.weight"] = rand(sc["final_out_chans"], 12, 3, 3)

    # CLIP
    vc = cfg["vision_config"]
    Ev = vc["hidden_size"]
    vp = "model.vision_model."
    w[vp + "embeddings.class_embedding"] = rand(Ev)
    w[vp + "embeddings.patch_embedding.weight"] = rand(Ev, 3,
                                                       vc["patch_size"],
                                                       vc["patch_size"])
    n_pos = (vc["image_size"] // vc["patch_size"]) ** 2 + 1
    w[vp + "embeddings.position_embedding.weight"] = rand(n_pos, Ev)
    for kk, vv in ln(Ev).items():
        w[vp + f"pre_layrnorm.{kk}"] = vv
    for i in range(vc["layers"]):
        q = vp + f"transformer.layers.{i}."
        for nm in ("layer_norm1", "layer_norm2"):
            for kk, vv in ln(Ev).items():
                w[q + nm + f".{kk}"] = vv
        w[q + "self_attn.qkv_proj.weight"] = rand(3 * Ev, Ev)
        w[q + "self_attn.qkv_proj.bias"] = rand(3 * Ev)
        w[q + "self_attn.out_proj.weight"] = rand(Ev, Ev)
        w[q + "self_attn.out_proj.bias"] = rand(Ev)
        w[q + "mlp.fc1.weight"] = rand(vc["intermediate_size"], Ev)
        w[q + "mlp.fc1.bias"] = rand(vc["intermediate_size"])
        w[q + "mlp.fc2.weight"] = rand(Ev, vc["intermediate_size"])
        w[q + "mlp.fc2.bias"] = rand(Ev)

    pc = cfg["projector_config"]
    # fused input = clip Ev + sam final = 16 + 16 = 32
    w["model.projector.layers.0.weight"] = rand(pc["n_embed"],
                                                pc["input_dim"])
    w["model.projector.layers.0.bias"] = rand(pc["n_embed"])
    w["model.projector.layers.2.weight"] = rand(pc["n_embed"],
                                                pc["n_embed"])
    w["model.projector.layers.2.bias"] = rand(pc["n_embed"])
    w["model.image_newline"] = rand(pc["n_embed"])
    w["model.view_seperator"] = rand(pc["n_embed"])
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_ocr_config()
    return load_model_from_weights(cfg, tiny_ocr_weights(cfg), jnp.float32)


class TestSAM:
    def test_encoder_shapes(self, model):
        px = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (1, 32, 32, 3)), jnp.float32)
        out = model.sam_model(model.params["sam_model"], px)
        # patch /4 -> 8x8; net_2 /2 -> 4x4; net_3 /2 -> 2x2
        assert out.shape == (1, 2, 2, 16)
        assert np.isfinite(np.asarray(out)).all()

    def test_role_split(self, model):
        sm = model.params["sam_model"]
        assert sm["window_blocks"]["attn"]["qkv"]["weight"].shape[0] == 2
        assert sm["global_blocks"]["attn"]["qkv"]["weight"].shape[0] == 1
        # per-role rel tables sized for window vs grid
        assert sm["window_blocks"]["attn"]["rel_pos_h"].shape[1:] == (7, 4)
        assert sm["global_blocks"]["attn"]["rel_pos_h"].shape[1:] == (15, 4)


class TestFusion:
    def test_vision_features_layout(self, model):
        px = jnp.asarray(np.random.default_rng(1).uniform(
            0, 1, (1, 32, 32, 3)), jnp.float32)
        feats = model.vision_features(model.params, px)
        # sam 2x2 -> clip gets 4 injected patches -> projector ds=1 keeps
        # 4 tokens -> 2x(2+newline) + separator = 7
        assert feats.shape == (7, 32)
        assert np.isfinite(np.asarray(feats)).all()

    def test_merge_and_generate(self, model):
        n_img = 7
        ids = np.asarray([[1, 3] + [250] * n_img + [9]], np.int32)
        px = jnp.asarray(np.random.default_rng(2).uniform(
            0, 1, (1, 3, 32, 32)), jnp.float32)
        emb = model.get_input_embeddings(model.params, jnp.asarray(ids), px)
        assert emb.shape == (1, 10, 32)
        toks = [int(t[0]) for t, _ in generate_step(emb, model,
                                                    max_tokens=4)]
        assert len(toks) == 4
