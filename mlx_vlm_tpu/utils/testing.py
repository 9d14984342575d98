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
