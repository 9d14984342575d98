"""granite4_vision: SigLIP tower + WindowQFormer projector + granite
decoder with fused SharedMLP split."""

import numpy as np

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights

E, P, VL, D = 16, 8, 2, 32


def _cfg():
    return {"model_type": "granite4_vision", "image_token_index": 90,
            "downsample_rate": "1/2",
            "text_config": {"model_type": "granitemoehybrid",
                            "hidden_size": D, "num_hidden_layers": 2,
                            "intermediate_size": 64,
                            "num_attention_heads": 4,
                            "num_key_value_heads": 2, "rms_norm_eps": 1e-5,
                            "vocab_size": 96, "rope_theta": 1e7,
                            "tie_word_embeddings": True,
                            "embedding_multiplier": 12.0,
                            "attention_multiplier": 0.015625,
                            "residual_multiplier": 0.22,
                            "logits_scaling": 10.0,
                            "shared_intermediate_size": 64},
            "vision_config": {"model_type": "siglip_vision_model",
                              "num_hidden_layers": VL, "hidden_size": E,
                              "intermediate_size": 32,
                              "num_attention_heads": 2, "image_size": 32,
                              "patch_size": P}}


def _weights(seed=0):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    side = 32 // P
    w = {"language_model.model.embed_tokens.weight": rand(96, D),
         "language_model.model.norm.weight": np.ones(D, np.float32)}
    for i in range(2):
        p = f"language_model.model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.q_proj.weight"] = rand(D, D)
        w[p + "self_attn.k_proj.weight"] = rand(16, D)
        w[p + "self_attn.v_proj.weight"] = rand(16, D)
        w[p + "self_attn.o_proj.weight"] = rand(D, D)
        # fused SharedMLP checkpoint layout
        w[p + "shared_mlp.input_linear.weight"] = rand(128, D)
        w[p + "shared_mlp.output_linear.weight"] = rand(D, 64)
    vt = "vision_tower.vision_model."
    w[vt + "embeddings.patch_embedding.weight"] = rand(E, 3, P, P)
    w[vt + "embeddings.patch_embedding.bias"] = rand(E)
    w[vt + "embeddings.position_embedding.weight"] = rand(side * side, E)
    for i in range(VL):
        pp = vt + f"encoder.layers.{i}."
        for n in ("layer_norm1", "layer_norm2"):
            w[pp + n + ".weight"] = np.ones(E, np.float32)
            w[pp + n + ".bias"] = np.zeros(E, np.float32)
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            w[pp + f"self_attn.{n}.weight"] = rand(E, E)
            w[pp + f"self_attn.{n}.bias"] = rand(E)
        w[pp + "mlp.fc1.weight"] = rand(32, E)
        w[pp + "mlp.fc1.bias"] = rand(32)
        w[pp + "mlp.fc2.weight"] = rand(E, 32)
        w[pp + "mlp.fc2.bias"] = rand(E)
    mp = "multi_modal_projector."
    w[mp + "norm.weight"] = np.ones(E, np.float32)
    w[mp + "norm.bias"] = np.zeros(E, np.float32)
    w[mp + "query"] = rand(1, 1, E)
    w[mp + "image_positions"] = rand(1, 4, E)
    w[mp + "out_linear.weight"] = rand(D, E)
    w[mp + "out_linear.bias"] = rand(D)
    qf = mp + "qformer."
    w[qf + "layernorm.weight"] = np.ones(E, np.float32)
    w[qf + "layernorm.bias"] = np.zeros(E, np.float32)
    lp = qf + "encoder.layer.0."
    for blk in ("attention", "crossattention"):
        w[lp + blk + ".attention.query.weight"] = rand(E, E)
        w[lp + blk + ".attention.query.bias"] = rand(E)
        w[lp + blk + ".attention.key.weight"] = rand(E, E)
        w[lp + blk + ".attention.key.bias"] = rand(E)
        w[lp + blk + ".attention.value.weight"] = rand(E, E)
        w[lp + blk + ".attention.value.bias"] = rand(E)
        w[lp + blk + ".output.dense.weight"] = rand(E, E)
        w[lp + blk + ".output.dense.bias"] = rand(E)
        w[lp + blk + ".output.LayerNorm.weight"] = np.ones(E, np.float32)
        w[lp + blk + ".output.LayerNorm.bias"] = np.zeros(E, np.float32)
    w[lp + "intermediate_query.dense.weight"] = rand(48, E)
    w[lp + "intermediate_query.dense.bias"] = rand(48)
    w[lp + "output_query.dense.weight"] = rand(E, 48)
    w[lp + "output_query.dense.bias"] = rand(E)
    w[lp + "output_query.LayerNorm.weight"] = np.ones(E, np.float32)
    w[lp + "output_query.LayerNorm.bias"] = np.zeros(E, np.float32)
    return w


def test_image_generate():
    m = load_model_from_weights(_cfg(), _weights(), jnp.float32)
    rng = np.random.default_rng(1)
    # 32x32 -> 4x4 patches; 2x2 windows (n=2); 1x1 queries -> 4 tokens
    ids = np.array([[5, 6] + [90] * 4 + [7]], np.int32)
    px = jnp.asarray((rng.standard_normal((1, 32, 32, 3)) * 0.1
                      ).astype(np.float32))
    e = m.get_input_embeddings(m.params, jnp.asarray(ids), px)
    assert e.shape == (1, 7, D)
    pos, _ = m.prepare_position_ids(ids)
    toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=3,
                                                position_ids=pos)]
    assert len(toks) == 3


def test_projector_token_count():
    m = load_model_from_weights(_cfg(), _weights(seed=2), jnp.float32)
    rng = np.random.default_rng(3)
    px = jnp.asarray((rng.standard_normal((1, 32, 32, 3)) * 0.1
                      ).astype(np.float32))
    feats = m.vision_tower(m.params["vision_tower"], px)
    out = m._project(m.params, feats)
    # n^2 * query_side^2 = 4 tokens at LLM width
    assert out.shape == (1, 4, D)
