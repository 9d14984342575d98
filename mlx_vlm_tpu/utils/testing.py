"""Random-weight model synthesis for tests and benchmarks.

Role parity: reference tests instantiate every architecture from tiny
hand-written configs with random weights (mlx_vlm/tests/test_models.py:14).
Here weights are generated in the *HF checkpoint layout* and pushed through
the real load pipeline (sanitize -> quant-fold -> stack -> device), so tests
exercise the loader too.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp

from .loader import load_model_from_weights


def tiny_qwen2_vl_config(**overrides) -> dict:
    cfg = {
        "model_type": "qwen2_vl",
        "hidden_size": 64,
        "num_hidden_layers": 2,
        "intermediate_size": 128,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "rms_norm_eps": 1e-6,
        "vocab_size": 256,
        "rope_theta": 10000.0,
        "rope_scaling": {"type": "mrope", "mrope_section": [2, 3, 3]},
        "tie_word_embeddings": False,
        "max_position_embeddings": 1024,
        "image_token_id": 151655,
        "video_token_id": 151656,
        "vision_start_token_id": 151652,
        "vision_config": {
            "depth": 2,
            "embed_dim": 32,
            "hidden_size": 64,
            "num_heads": 4,
            "patch_size": 14,
            "mlp_ratio": 4.0,
            "in_channels": 3,
            "spatial_merge_size": 2,
            "temporal_patch_size": 2,
        },
    }
    # qwen2-vl uses huge special ids; shrink for tiny vocab tests
    if cfg["vocab_size"] <= 1024:
        cfg["image_token_id"] = 151655 % cfg["vocab_size"]
        cfg["video_token_id"] = 151656 % cfg["vocab_size"]
        cfg["vision_start_token_id"] = 151652 % cfg["vocab_size"]
    cfg.update(overrides)
    return cfg


def qwen2_vl_hf_weights(
    config: dict, seed: int = 0, scale: float = 0.05, zeros: bool = False
) -> dict:
    """Random weights with HF qwen2-vl checkpoint keys (visual.*, model.*).

    zeros=True fills tensors with zeros (fast; for pure-throughput benches —
    identical FLOPs/bandwidth, no host RNG cost).
    """
    rng = np.random.default_rng(seed)
    w = {}

    def rand(*shape):
        if zeros:
            return np.zeros(shape, np.float32)
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    D = config["hidden_size"]
    V = config["vocab_size"]
    I = config["intermediate_size"]
    nh = config["num_attention_heads"]
    nkv = config["num_key_value_heads"]
    hd = D // nh

    w["model.embed_tokens.weight"] = rand(V, D)
    for i in range(config["num_hidden_layers"]):
        p = f"model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.q_proj.weight"] = rand(nh * hd, D)
        w[p + "self_attn.q_proj.bias"] = rand(nh * hd)
        w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.k_proj.bias"] = rand(nkv * hd)
        w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.v_proj.bias"] = rand(nkv * hd)
        w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
        w[p + "mlp.gate_proj.weight"] = rand(I, D)
        w[p + "mlp.up_proj.weight"] = rand(I, D)
        w[p + "mlp.down_proj.weight"] = rand(D, I)
    w["model.norm.weight"] = np.ones(D, np.float32)
    if not config.get("tie_word_embeddings"):
        w["lm_head.weight"] = rand(V, D)

    vc = config["vision_config"]
    E = vc["embed_dim"]
    P = vc.get("patch_size", 14)
    T = vc.get("temporal_patch_size", 2)
    C = vc.get("in_channels", 3)
    m = vc.get("spatial_merge_size", 2)
    ratio = int(E * vc.get("mlp_ratio", 4.0))
    w["visual.patch_embed.proj.weight"] = rand(E, C, T, P, P)
    for i in range(vc["depth"]):
        p = f"visual.blocks.{i}."
        w[p + "norm1.weight"] = np.ones(E, np.float32)
        w[p + "norm1.bias"] = np.zeros(E, np.float32)
        w[p + "norm2.weight"] = np.ones(E, np.float32)
        w[p + "norm2.bias"] = np.zeros(E, np.float32)
        w[p + "attn.qkv.weight"] = rand(3 * E, E)
        w[p + "attn.qkv.bias"] = rand(3 * E)
        w[p + "attn.proj.weight"] = rand(E, E)
        w[p + "attn.proj.bias"] = rand(E)
        w[p + "mlp.fc1.weight"] = rand(ratio, E)
        w[p + "mlp.fc1.bias"] = rand(ratio)
        w[p + "mlp.fc2.weight"] = rand(E, ratio)
        w[p + "mlp.fc2.bias"] = rand(E)
    hidden_m = E * m * m
    w["visual.merger.ln_q.weight"] = np.ones(E, np.float32)
    w["visual.merger.ln_q.bias"] = np.zeros(E, np.float32)
    w["visual.merger.mlp.0.weight"] = rand(hidden_m, hidden_m)
    w["visual.merger.mlp.0.bias"] = rand(hidden_m)
    w["visual.merger.mlp.2.weight"] = rand(D, hidden_m)
    w["visual.merger.mlp.2.bias"] = rand(D)
    return w


def make_tiny_qwen2_vl(seed: int = 0, dtype=jnp.float32, config: Optional[dict] = None):
    cfg = config or tiny_qwen2_vl_config()
    weights = qwen2_vl_hf_weights(cfg, seed)
    return load_model_from_weights(cfg, weights, dtype)


def tiny_qwen2_5_vl_config(**overrides) -> dict:
    cfg = {
        "model_type": "qwen2_5_vl",
        "hidden_size": 64,
        "num_hidden_layers": 2,
        "intermediate_size": 128,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "rms_norm_eps": 1e-6,
        "vocab_size": 256,
        "rope_theta": 10000.0,
        "rope_scaling": {"type": "mrope", "mrope_section": [2, 3, 3]},
        "tie_word_embeddings": False,
        "max_position_embeddings": 1024,
        "image_token_id": 151655 % 256,
        "video_token_id": 151656 % 256,
        "vision_start_token_id": 151652 % 256,
        "vision_config": {
            "depth": 3,
            "hidden_size": 32,
            "intermediate_size": 64,
            "out_hidden_size": 64,
            "num_heads": 4,
            "patch_size": 14,
            "in_channels": 3,
            "spatial_merge_size": 2,
            "temporal_patch_size": 2,
            "window_size": 56,  # vit_ws = 56/2/14 = 2 merged tokens per side
            "fullatt_block_indexes": [1],
        },
    }
    cfg.update(overrides)
    return cfg


def qwen2_5_vl_hf_weights(config: dict, seed: int = 0, scale: float = 0.05) -> dict:
    """Random weights with HF qwen2.5-vl checkpoint keys."""
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    # language part identical to qwen2_vl (swap in a qwen2_vl-style vision
    # config so the generator runs, then drop its visual.* keys)
    lang_cfg = dict(config)
    lang_cfg["vision_config"] = tiny_qwen2_vl_config()["vision_config"]
    w = {
        k: v
        for k, v in qwen2_vl_hf_weights(lang_cfg, seed, scale).items()
        if not k.startswith("visual.")
    }
    vc = config["vision_config"]
    E = vc["hidden_size"]
    I = vc["intermediate_size"]
    P = vc.get("patch_size", 14)
    T = vc.get("temporal_patch_size", 2)
    C = vc.get("in_channels", 3)
    m = vc.get("spatial_merge_size", 2)
    out_d = vc["out_hidden_size"]
    w["visual.patch_embed.proj.weight"] = rand(E, C, T, P, P)
    for i in range(vc["depth"]):
        p = f"visual.blocks.{i}."
        w[p + "norm1.weight"] = np.ones(E, np.float32)
        w[p + "norm2.weight"] = np.ones(E, np.float32)
        w[p + "attn.qkv.weight"] = rand(3 * E, E)
        w[p + "attn.qkv.bias"] = rand(3 * E)
        w[p + "attn.proj.weight"] = rand(E, E)
        w[p + "attn.proj.bias"] = rand(E)
        w[p + "mlp.gate_proj.weight"] = rand(I, E)
        w[p + "mlp.gate_proj.bias"] = rand(I)
        w[p + "mlp.up_proj.weight"] = rand(I, E)
        w[p + "mlp.up_proj.bias"] = rand(I)
        w[p + "mlp.down_proj.weight"] = rand(E, I)
        w[p + "mlp.down_proj.bias"] = rand(E)
    hidden_m = E * m * m
    w["visual.merger.ln_q.weight"] = np.ones(E, np.float32)
    w["visual.merger.mlp.0.weight"] = rand(hidden_m, hidden_m)
    w["visual.merger.mlp.0.bias"] = rand(hidden_m)
    w["visual.merger.mlp.2.weight"] = rand(out_d, hidden_m)
    w["visual.merger.mlp.2.bias"] = rand(out_d)
    return w


def make_tiny_qwen2_5_vl(seed: int = 0, dtype=jnp.float32, config: Optional[dict] = None):
    cfg = config or tiny_qwen2_5_vl_config()
    weights = qwen2_5_vl_hf_weights(cfg, seed)
    return load_model_from_weights(cfg, weights, dtype)


def tiny_llama_config(**overrides) -> dict:
    cfg = {
        "model_type": "llama",
        "hidden_size": 64,
        "num_hidden_layers": 2,
        "intermediate_size": 128,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "rms_norm_eps": 1e-5,
        "vocab_size": 256,
        "rope_theta": 10000.0,
        "tie_word_embeddings": False,
        "max_position_embeddings": 1024,
    }
    cfg.update(overrides)
    return cfg


def llama_hf_weights(config: dict, seed: int = 0, scale: float = 0.05) -> dict:
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    D = config["hidden_size"]
    V = config["vocab_size"]
    I = config["intermediate_size"]
    nh = config["num_attention_heads"]
    nkv = config.get("num_key_value_heads") or nh
    hd = config.get("head_dim") or D // nh
    w = {"model.embed_tokens.weight": rand(V, D), "model.norm.weight": np.ones(D, np.float32)}
    for i in range(config["num_hidden_layers"]):
        p = f"model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.q_proj.weight"] = rand(nh * hd, D)
        w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
        w[p + "mlp.gate_proj.weight"] = rand(I, D)
        w[p + "mlp.up_proj.weight"] = rand(I, D)
        w[p + "mlp.down_proj.weight"] = rand(D, I)
    if not config.get("tie_word_embeddings"):
        w["lm_head.weight"] = rand(V, D)
    return w


def tiny_qwen2_moe_config(**overrides) -> dict:
    cfg = tiny_llama_config(
        model_type="qwen2_moe",
        num_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=32,
        shared_expert_intermediate_size=64,
        norm_topk_prob=False,
    )
    cfg.update(overrides)
    return cfg


def qwen2_moe_hf_weights(config: dict, seed: int = 0, scale: float = 0.05) -> dict:
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    D = config["hidden_size"]
    E = config["num_experts"]
    Im = config["moe_intermediate_size"]
    Is = config["shared_expert_intermediate_size"]
    w = llama_hf_weights(config, seed, scale)
    for i in range(config["num_hidden_layers"]):
        p = f"model.layers.{i}.mlp."
        # replace the dense MLP with MoE weights
        for nm in ("gate_proj", "up_proj", "down_proj"):
            del w[f"model.layers.{i}.mlp.{nm}.weight"]
        w[p + "gate.weight"] = rand(E, D)
        for e in range(E):
            w[p + f"experts.{e}.gate_proj.weight"] = rand(Im, D)
            w[p + f"experts.{e}.up_proj.weight"] = rand(Im, D)
            w[p + f"experts.{e}.down_proj.weight"] = rand(D, Im)
        w[p + "shared_expert.gate_proj.weight"] = rand(Is, D)
        w[p + "shared_expert.up_proj.weight"] = rand(Is, D)
        w[p + "shared_expert.down_proj.weight"] = rand(D, Is)
        w[p + "shared_expert_gate.weight"] = rand(1, D)
    return w


def tiny_llava_config(**overrides) -> dict:
    cfg = {
        "model_type": "llava",
        "image_token_index": 32,
        "vision_feature_layer": -2,
        "vision_feature_select_strategy": "default",
        "vocab_size": 256,
        "text_config": tiny_llama_config(),
        "vision_config": {
            "model_type": "clip_vision_model",
            "num_hidden_layers": 2,
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_attention_heads": 4,
            "image_size": 28,
            "patch_size": 14,
            "num_channels": 3,
        },
    }
    cfg.update(overrides)
    return cfg


def llava_hf_weights(config: dict, seed: int = 0, scale: float = 0.05) -> dict:
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tc, vc = config["text_config"], config["vision_config"]
    w = {
        "language_model." + k: v for k, v in llama_hf_weights(tc, seed, scale).items()
    }
    E = vc["hidden_size"]
    P = vc["patch_size"]
    C = vc.get("num_channels", 3)
    I = vc["intermediate_size"]
    n_pos = (vc["image_size"] // P) ** 2 + 1
    p = "vision_tower.vision_model."
    w[p + "embeddings.class_embedding"] = rand(E)
    w[p + "embeddings.patch_embedding.weight"] = rand(E, C, P, P)
    w[p + "embeddings.position_embedding.weight"] = rand(n_pos, E)
    w[p + "pre_layrnorm.weight"] = np.ones(E, np.float32)
    w[p + "pre_layrnorm.bias"] = np.zeros(E, np.float32)
    w[p + "post_layernorm.weight"] = np.ones(E, np.float32)
    w[p + "post_layernorm.bias"] = np.zeros(E, np.float32)
    for i in range(vc["num_hidden_layers"]):
        q = p + f"encoder.layers.{i}."
        for nm in ("layer_norm1", "layer_norm2"):
            w[q + nm + ".weight"] = np.ones(E, np.float32)
            w[q + nm + ".bias"] = np.zeros(E, np.float32)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            w[q + f"self_attn.{nm}.weight"] = rand(E, E)
            w[q + f"self_attn.{nm}.bias"] = rand(E)
        w[q + "mlp.fc1.weight"] = rand(I, E)
        w[q + "mlp.fc1.bias"] = rand(I)
        w[q + "mlp.fc2.weight"] = rand(E, I)
        w[q + "mlp.fc2.bias"] = rand(E)
    D = tc["hidden_size"]
    w["multi_modal_projector.linear_1.weight"] = rand(D, E)
    w["multi_modal_projector.linear_1.bias"] = rand(D)
    w["multi_modal_projector.linear_2.weight"] = rand(D, D)
    w["multi_modal_projector.linear_2.bias"] = rand(D)
    return w


def make_tiny_llava(seed: int = 0, dtype=jnp.float32, config: Optional[dict] = None):
    cfg = config or tiny_llava_config()
    return load_model_from_weights(cfg, llava_hf_weights(cfg, seed), dtype)


def tiny_paligemma_config(gemma2: bool = False, **overrides) -> dict:
    text = {
        "model_type": "gemma2" if gemma2 else "gemma",
        "hidden_size": 48,
        "num_hidden_layers": 4,
        "intermediate_size": 96,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "vocab_size": 256,
        "rms_norm_eps": 1e-6,
    }
    if gemma2:
        text.update(
            head_dim=16,
            query_pre_attn_scalar=16.0,
            attn_logit_softcapping=50.0,
            final_logit_softcapping=30.0,
            sliding_window=4,
        )
    cfg = {
        "model_type": "paligemma",
        "image_token_index": 64,
        "hidden_size": 48,
        "pad_token_id": 0,
        "projection_dim": 48,
        "text_config": text,
        "vision_config": {
            "model_type": "siglip_vision_model",
            "num_hidden_layers": 2,
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_attention_heads": 4,
            "image_size": 28,  # 2x2 patches
            "patch_size": 14,
            "num_channels": 3,
            "projection_dim": 48,
        },
    }
    cfg.update(overrides)
    return cfg


def paligemma_hf_weights(config: dict, seed: int = 0, scale: float = 0.05) -> dict:
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tc, vc = config["text_config"], config["vision_config"]
    gemma2 = tc["model_type"] == "gemma2"
    D = tc["hidden_size"]
    nh, nkv = tc["num_attention_heads"], tc["num_key_value_heads"]
    hd = tc.get("head_dim", D // nh) if gemma2 else D // nh
    I = tc["intermediate_size"]
    w = {
        "language_model.model.embed_tokens.weight": rand(tc["vocab_size"], D),
        "language_model.model.norm.weight": np.zeros(D, np.float32),
    }
    for i in range(tc["num_hidden_layers"]):
        p = f"language_model.model.layers.{i}."
        norms = ["input_layernorm", "post_attention_layernorm"]
        if gemma2:
            norms += ["pre_feedforward_layernorm", "post_feedforward_layernorm"]
        for nm in norms:
            w[p + nm + ".weight"] = np.zeros(D, np.float32)
        w[p + "self_attn.q_proj.weight"] = rand(nh * hd, D)
        w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
        w[p + "mlp.gate_proj.weight"] = rand(I, D)
        w[p + "mlp.up_proj.weight"] = rand(I, D)
        w[p + "mlp.down_proj.weight"] = rand(D, I)
    E = vc["hidden_size"]
    P = vc["patch_size"]
    C = vc.get("num_channels", 3)
    Iv = vc["intermediate_size"]
    n_pos = (vc["image_size"] // P) ** 2
    p = "vision_tower.vision_model."
    w[p + "embeddings.patch_embedding.weight"] = rand(E, C, P, P)
    w[p + "embeddings.patch_embedding.bias"] = rand(E)
    w[p + "embeddings.position_embedding.weight"] = rand(n_pos, E)
    w[p + "post_layernorm.weight"] = np.ones(E, np.float32)
    w[p + "post_layernorm.bias"] = np.zeros(E, np.float32)
    for i in range(vc["num_hidden_layers"]):
        q = p + f"encoder.layers.{i}."
        for nm in ("layer_norm1", "layer_norm2"):
            w[q + nm + ".weight"] = np.ones(E, np.float32)
            w[q + nm + ".bias"] = np.zeros(E, np.float32)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            w[q + f"self_attn.{nm}.weight"] = rand(E, E)
            w[q + f"self_attn.{nm}.bias"] = rand(E)
        w[q + "mlp.fc1.weight"] = rand(Iv, E)
        w[q + "mlp.fc1.bias"] = rand(Iv)
        w[q + "mlp.fc2.weight"] = rand(E, Iv)
        w[q + "mlp.fc2.bias"] = rand(E)
    w["multi_modal_projector.linear.weight"] = rand(D, E)
    w["multi_modal_projector.linear.bias"] = rand(D)
    return w


def make_tiny_paligemma(seed: int = 0, dtype=jnp.float32,
                        config: Optional[dict] = None, gemma2: bool = False):
    cfg = config or tiny_paligemma_config(gemma2=gemma2)
    return load_model_from_weights(cfg, paligemma_hf_weights(cfg, seed), dtype)


def tiny_gemma3_config(**overrides) -> dict:
    cfg = {
        "model_type": "gemma3",
        "image_token_index": 64,
        "hidden_size": 48,  # top-level hidden (feature scaling divisor)
        "pad_token_id": 0,
        "text_config": {
            "model_type": "gemma3_text",
            "hidden_size": 48,
            "num_hidden_layers": 4,
            "intermediate_size": 96,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "head_dim": 16,
            "rms_norm_eps": 1e-6,
            "vocab_size": 256,
            "sliding_window": 4,
            "sliding_window_pattern": 2,  # every 2nd layer global
            "mm_tokens_per_image": 4,
        },
        "vision_config": {
            "model_type": "siglip_vision_model",
            "num_hidden_layers": 2,
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_attention_heads": 4,
            "image_size": 56,  # 4x4 patches
            "patch_size": 14,
            "num_channels": 3,
        },
    }
    cfg.update(overrides)
    return cfg


def gemma3_hf_weights(config: dict, seed: int = 0, scale: float = 0.05) -> dict:
    rng = np.random.default_rng(seed)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tc, vc = config["text_config"], config["vision_config"]
    D = tc["hidden_size"]
    V = tc["vocab_size"]
    I = tc["intermediate_size"]
    nh, nkv, hd = tc["num_attention_heads"], tc["num_key_value_heads"], tc["head_dim"]
    w = {
        "language_model.model.embed_tokens.weight": rand(V, D),
        "language_model.model.norm.weight": np.zeros(D, np.float32),
    }
    for i in range(tc["num_hidden_layers"]):
        p = f"language_model.model.layers.{i}."
        for nm in (
            "input_layernorm", "post_attention_layernorm",
            "pre_feedforward_layernorm", "post_feedforward_layernorm",
        ):
            w[p + nm + ".weight"] = np.zeros(D, np.float32)
        w[p + "self_attn.q_proj.weight"] = rand(nh * hd, D)
        w[p + "self_attn.k_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.v_proj.weight"] = rand(nkv * hd, D)
        w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
        w[p + "self_attn.q_norm.weight"] = np.zeros(hd, np.float32)
        w[p + "self_attn.k_norm.weight"] = np.zeros(hd, np.float32)
        w[p + "mlp.gate_proj.weight"] = rand(I, D)
        w[p + "mlp.up_proj.weight"] = rand(I, D)
        w[p + "mlp.down_proj.weight"] = rand(D, I)
    E = vc["hidden_size"]
    P = vc["patch_size"]
    C = vc.get("num_channels", 3)
    Iv = vc["intermediate_size"]
    n_pos = (vc["image_size"] // P) ** 2
    p = "vision_tower.vision_model."
    w[p + "embeddings.patch_embedding.weight"] = rand(E, C, P, P)
    w[p + "embeddings.patch_embedding.bias"] = rand(E)
    w[p + "embeddings.position_embedding.weight"] = rand(n_pos, E)
    w[p + "post_layernorm.weight"] = np.ones(E, np.float32)
    w[p + "post_layernorm.bias"] = np.zeros(E, np.float32)
    for i in range(vc["num_hidden_layers"]):
        q = p + f"encoder.layers.{i}."
        for nm in ("layer_norm1", "layer_norm2"):
            w[q + nm + ".weight"] = np.ones(E, np.float32)
            w[q + nm + ".bias"] = np.zeros(E, np.float32)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            w[q + f"self_attn.{nm}.weight"] = rand(E, E)
            w[q + f"self_attn.{nm}.bias"] = rand(E)
        w[q + "mlp.fc1.weight"] = rand(Iv, E)
        w[q + "mlp.fc1.bias"] = rand(Iv)
        w[q + "mlp.fc2.weight"] = rand(E, Iv)
        w[q + "mlp.fc2.bias"] = rand(E)
    w["multi_modal_projector.mm_input_projection_weight"] = rand(E, D)
    w["multi_modal_projector.mm_soft_emb_norm.weight"] = np.zeros(E, np.float32)
    return w


def make_tiny_gemma3(seed: int = 0, dtype=jnp.float32, config: Optional[dict] = None):
    cfg = config or tiny_gemma3_config()
    return load_model_from_weights(cfg, gemma3_hf_weights(cfg, seed), dtype)


def build_tiny_checkpoint(directory: str, seed: int = 11, scale: float = 0.5) -> dict:
    """Write a complete loadable qwen2-vl checkpoint (weights + config + a
    real trained BPE tokenizer) into `directory`.  Returns the config."""
    import json
    import os

    from safetensors.numpy import save_file
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    specials = [
        "<|im_start|>", "<|im_end|>", "<|vision_start|>", "<|vision_end|>",
        "<|image_pad|>", "<|video_pad|>", "<|endoftext|>",
    ]
    trainer = trainers.BpeTrainer(vocab_size=300, special_tokens=specials)
    tok.train_from_iterator(
        [
            "What is in this image? A photo of a cat sitting on a mat. " * 20,
            "Describe the picture please, thank you very much. " * 20,
            # JSON structural bytes so constrained-decoding tests have the
            # tokens they need (a corpus-only ByteLevel alphabet would
            # otherwise lack {, }, [, ], :, ", digits)
            '{"kind": "cat", "n": [0, 1, 2, 3, 4567.89], "ok": true, '
            '"dog": null, "x": false} ' * 20,
        ],
        trainer,
    )
    tok.save(os.path.join(directory, "tokenizer.json"))
    with open(os.path.join(directory, "tokenizer_config.json"), "w") as f:
        json.dump(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "eos_token": "<|im_end|>",
                "pad_token": "<|endoftext|>",
            },
            f,
        )
    ids = {s: tok.token_to_id(s) for s in specials}
    vocab = max(320, tok.get_vocab_size())
    cfg = tiny_qwen2_vl_config(
        vocab_size=vocab,
        image_token_id=ids["<|image_pad|>"],
        video_token_id=ids["<|video_pad|>"],
        vision_start_token_id=ids["<|vision_start|>"],
        eos_token_id=ids["<|im_end|>"],
    )
    save_file(qwen2_vl_hf_weights(cfg, seed=seed, scale=scale),
              os.path.join(directory, "model.safetensors"))
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(cfg, f)
    return cfg


def qwen2_vl_2b_config() -> dict:
    """Real Qwen2-VL-2B-Instruct dimensions (for benchmarking w/o weights)."""
    return tiny_qwen2_vl_config(
        hidden_size=1536,
        num_hidden_layers=28,
        intermediate_size=8960,
        num_attention_heads=12,
        num_key_value_heads=2,
        vocab_size=151936,
        rope_theta=1000000.0,
        rope_scaling={"type": "mrope", "mrope_section": [16, 24, 24]},
        image_token_id=151655,
        video_token_id=151656,
        vision_start_token_id=151652,
        vision_config={
            "depth": 32,
            "embed_dim": 1280,
            "hidden_size": 1536,
            "num_heads": 16,
            "patch_size": 14,
            "mlp_ratio": 4.0,
            "in_channels": 3,
            "spatial_merge_size": 2,
            "temporal_patch_size": 2,
        },
    )


def qwen2_vl_7b_config() -> dict:
    """Real Qwen2-VL-7B-Instruct dimensions."""
    return tiny_qwen2_vl_config(
        hidden_size=3584,
        num_hidden_layers=28,
        intermediate_size=18944,
        num_attention_heads=28,
        num_key_value_heads=4,
        vocab_size=152064,
        rope_theta=1000000.0,
        rope_scaling={"type": "mrope", "mrope_section": [16, 24, 24]},
        image_token_id=151655,
        video_token_id=151656,
        vision_start_token_id=151652,
        vision_config={
            "depth": 32,
            "embed_dim": 1280,
            "hidden_size": 3584,
            "num_heads": 16,
            "patch_size": 14,
            "mlp_ratio": 4.0,
            "in_channels": 3,
            "spatial_merge_size": 2,
            "temporal_patch_size": 2,
        },
    )


def channel_quantize_lm_weights(weights: dict) -> dict:
    """Swap 2-D language-model linear weights for zero-filled per-channel
    int8 shells (ChannelQuantizedTensor) — the runtime layout 4-bit
    checkpoints load into.  For throughput benches: identical HBM traffic
    and compute to a real quantized load, no host quantization cost.

    Vision-tower and embedding weights stay dense (matching the loader's
    skip-multimodal predicate, reference utils.py:322).
    """
    from ..core.quant import ChannelQuantizedTensor

    out = {}
    for k, v in weights.items():
        is_lm_linear = (
            k.startswith(("model.layers.", "lm_head."))
            and k.endswith(".weight")
            and getattr(v, "ndim", 0) == 2
            and "layernorm" not in k
            and v.shape[1] >= 64
        )
        if not is_lm_linear:
            out[k] = v
            continue
        n, kk = v.shape
        out[k] = ChannelQuantizedTensor(
            q8=np.zeros((kk, n), np.int8),
            scales=np.zeros((1, n), np.float32),
            biases=np.zeros((1, n), np.float32),
            src_bits=4,
            out_dtype="bfloat16",
        )
    return out


def int4_grouped_lm_weights(weights: dict, group_size: int = 64) -> dict:
    """Swap 2-D language-model linear weights for zero-filled grouped-int4
    shells (Int4GroupedTensor) — the DEFAULT runtime layout 4-bit
    checkpoints load into (w4grp).  For throughput benches: identical HBM
    traffic and compute to a real quantized load, no host quantization.
    """
    from ..core.quant import Int4GroupedTensor, _int4_half_width

    out = {}
    for k, v in weights.items():
        is_lm_linear = (
            k.startswith(("model.layers.", "lm_head."))
            and k.endswith(".weight")
            and getattr(v, "ndim", 0) == 2
            and "layernorm" not in k
            and v.shape[1] >= 64
            and v.shape[1] % group_size == 0
        )
        if not is_lm_linear:
            out[k] = v
            continue
        n, kk = v.shape
        g = group_size
        n2p = _int4_half_width(n)
        out[k] = Int4GroupedTensor(
            qp=np.zeros((kk, n2p), np.uint8),
            sl=np.zeros((kk // g, 1, n2p), np.float32),
            sh=np.zeros((kk // g, 1, n2p), np.float32),
            bl=np.zeros((kk // g, 1, n2p), np.float32),
            bh=np.zeros((kk // g, 1, n2p), np.float32),
            n=n,
            group_size=g,
            out_dtype="bfloat16",
        )
    return out
