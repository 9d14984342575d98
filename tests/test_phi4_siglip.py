"""phi4_siglip: SigLIP2-NaFlex tower + phi-4 decoder (-200 placeholders)."""

import numpy as np

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights

P, E, VL, D = 4, 16, 2, 32


def _cfg():
    return {"model_type": "phi4-siglip",
            "hidden_size": D, "num_hidden_layers": 2,
            "intermediate_size": 64, "num_attention_heads": 4,
            "num_key_value_heads": 2, "rms_norm_eps": 1e-5,
            "vocab_size": 96, "rope_theta": 500000.0,
            "partial_rotary_factor": 0.5,
            "mm_hidden_size": E, "mm_vision_select_layer": -2,
            "vision_config": {"model_type": "siglip2_vision_model",
                              "hidden_size": E, "intermediate_size": 32,
                              "num_hidden_layers": VL,
                              "num_attention_heads": 2,
                              "patch_size": P, "num_patches": 16,
                              "num_channels": 3}}


def _weights(seed=0):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    w = {"model.embed_tokens.weight": rand(96, D),
         "model.norm.weight": np.ones(D, np.float32),
         "lm_head.weight": rand(96, D)}
    for i in range(2):
        p = f"model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "self_attn.qkv_proj.weight"] = rand((4 + 2 + 2) * 8, D)
        w[p + "self_attn.o_proj.weight"] = rand(D, 32)
        w[p + "mlp.gate_up_proj.weight"] = rand(2 * 64, D)
        w[p + "mlp.down_proj.weight"] = rand(D, 64)
    vt = "vision_tower.vision_tower.vision_model."
    w[vt + "embeddings.patch_embedding.weight"] = rand(E, 3 * P * P)
    w[vt + "embeddings.patch_embedding.bias"] = rand(E)
    w[vt + "embeddings.position_embedding.weight"] = rand(16, E)
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
    w[vt + "post_layernorm.weight"] = np.ones(E, np.float32)
    w[vt + "post_layernorm.bias"] = np.zeros(E, np.float32)
    w["mm_projector.linear_1.weight"] = rand(D, E)
    w["mm_projector.linear_1.bias"] = rand(D)
    w["mm_projector.linear_2.weight"] = rand(D, D)
    w["mm_projector.linear_2.bias"] = rand(D)
    return w


def test_image_generate():
    m = load_model_from_weights(_cfg(), _weights(), jnp.float32)
    ids = np.array([[5, 6, 7, 8] + [-200] * 6 + [9, 10]], np.int32)
    grid = np.asarray([[1, 2, 3]])
    aux = {k: jnp.asarray(v)
           for k, v in m.vision_aux_inputs(grid).items()}
    rng = np.random.default_rng(1)
    pv = (rng.standard_normal((6, 3 * P * P)) * 0.1).astype(np.float32)
    e = m.get_input_embeddings(m.params, jnp.asarray(ids),
                               jnp.asarray(pv), **aux)
    assert e.shape == (1, 12, D)
    pos, _ = m.prepare_position_ids(ids)
    toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=3,
                                                position_ids=pos)]
    assert len(toks) == 3


def test_select_layer_minus_two_skips_final_layer():
    """mm_vision_select_layer=-2 must differ from -1 (post-norm path)."""
    cfg = _cfg()
    w = _weights()
    m1 = load_model_from_weights(dict(cfg), dict(w), jnp.float32)
    cfg2 = dict(cfg, mm_vision_select_layer=-1)
    m2 = load_model_from_weights(cfg2, dict(w), jnp.float32)
    grid = np.asarray([[1, 2, 3]])
    aux = {k: jnp.asarray(v) for k, v in m1.vision_aux_inputs(grid).items()}
    rng = np.random.default_rng(2)
    pv = jnp.asarray((rng.standard_normal((6, 3 * P * P)) * 0.1
                      ).astype(np.float32))
    f1 = m1.vision_features(m1.params, pv, **aux)
    f2 = m2.vision_features(m2.params, pv, **aux)
    assert np.abs(np.asarray(f1) - np.asarray(f2)).max() > 1e-5
