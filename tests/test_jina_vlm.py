"""jina_vlm: multi-layer ViT feature concat, window cross-attn pooling
connector, fused qkv/gate_up decoder, additive merge at image_input_idx."""

import numpy as np

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights

E, VL, D, P = 16, 3, 32, 4


def _cfg():
    return {"model_type": "jina_vlm", "image_token_index": 94,
            "text_config": {"model_type": "jina_vlm", "hidden_size": D,
                            "num_hidden_layers": 2, "intermediate_size": 48,
                            "num_attention_heads": 4,
                            "num_key_value_heads": 2, "head_dim": 8,
                            "vocab_size": 90, "additional_vocab_size": 6,
                            "rms_norm_eps": 1e-6, "rope_theta": 1e6,
                            "tie_word_embeddings": False},
            "vision_config": {"model_type": "jina_vlm", "hidden_size": E,
                              "num_hidden_layers": VL,
                              "num_attention_heads": 2, "head_dim": 8,
                              "patch_size": P, "image_size": 16,
                              "intermediate_size": 32,
                              "vit_layers": (-1, -3), "output_size": D,
                              "pooling_h": 2, "pooling_w": 2,
                              "connector_hidden_size": 24,
                              "use_bias": True, "post_layer_norm": True}}


def _weights(seed=0):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    w = {"language_model.embedding.embedding": rand(90, D),
         "language_model.embedding.new_embedding": rand(6, D),
         "language_model.ln_f.weight": np.ones(D, np.float32),
         "lm_head.weight": rand(96, D)}
    for i in range(2):
        p = f"language_model.layers.{i}."
        w[p + "attn_norm.weight"] = np.ones(D, np.float32)
        w[p + "ffn_norm.weight"] = np.ones(D, np.float32)
        w[p + "attn.qkv.weight"] = rand((4 + 2 + 2) * 8, D)
        w[p + "attn.out.weight"] = rand(D, 32)
        w[p + "attn.q_norm.weight"] = np.ones(8, np.float32)
        w[p + "attn.k_norm.weight"] = np.ones(8, np.float32)
        w[p + "ffn.gate_up.weight"] = rand(96, D)
        w[p + "ffn.down.weight"] = rand(D, 48)
    side = 16 // P  # 4x4 patches
    vm = "vision_model."
    w[vm + "patch_embed.proj.weight"] = rand(E, 3 * P * P)
    w[vm + "patch_embed.proj.bias"] = rand(E)
    w[vm + "pos_embed"] = rand(side * side, E)
    for i in range(VL):
        p = vm + f"layers.{i}."
        for n in ("attn_norm", "ffn_norm"):
            w[p + n + ".weight"] = np.ones(E, np.float32)
            w[p + n + ".bias"] = np.zeros(E, np.float32)
        w[p + "attn.qkv.weight"] = rand(3 * E, E)
        w[p + "attn.qkv.bias"] = rand(3 * E)
        w[p + "attn.out.weight"] = rand(E, E)
        w[p + "attn.out.bias"] = rand(E)
        w[p + "ffn.up.weight"] = rand(32, E)
        w[p + "ffn.up.bias"] = rand(32)
        w[p + "ffn.down.weight"] = rand(E, 32)
        w[p + "ffn.down.bias"] = rand(E)
    w[vm + "post_norm.weight"] = np.ones(E, np.float32)
    w[vm + "post_norm.bias"] = np.zeros(E, np.float32)
    C2 = E * 2  # two vit layers concatenated
    vc = "vl_connector."
    w[vc + "pooling.q.weight"] = rand(2 * 8, C2)
    w[vc + "pooling.q.bias"] = rand(16)
    w[vc + "pooling.kv.weight"] = rand(2 * 16, C2)
    w[vc + "pooling.kv.bias"] = rand(32)
    w[vc + "pooling.out.weight"] = rand(E, 16)
    w[vc + "pooling.out.bias"] = rand(E)
    w[vc + "projector.gate_up.weight"] = rand(48, E)
    w[vc + "projector.down.weight"] = rand(D, 24)
    return w


def test_image_generate_additive_merge():
    m = load_model_from_weights(_cfg(), _weights(), jnp.float32)
    # one crop: 4x4 patches -> pooled 2x2 = 4 feature tokens
    rng = np.random.default_rng(1)
    px = jnp.asarray((rng.standard_normal((1, 1, 16, 3 * P * P)) * 0.1
                      ).astype(np.float32))
    ids = np.array([[5, 6, 92, 92, 92, 92, 7]], np.int32)
    image_input_idx = np.asarray([[2, 3, 4, 5]], np.int32)
    e_img = m.get_input_embeddings(m.params, jnp.asarray(ids), px,
                                   image_input_idx=image_input_idx)
    e_txt = m.get_input_embeddings(m.params, jnp.asarray(ids))
    diff = np.abs(np.asarray(e_img) - np.asarray(e_txt)).max(axis=-1)[0]
    # features added exactly at positions 2..5 (additive merge)
    assert (diff[2:6] > 1e-6).all()
    assert diff[0] == 0 and diff[1] == 0 and diff[6] == 0

    pos, _ = m.prepare_position_ids(ids)
    toks = [int(t[0]) for t, _ in generate_step(e_img, m, max_tokens=3,
                                                position_ids=pos)]
    assert len(toks) == 3


def test_extended_vocab_rows_loaded():
    m = load_model_from_weights(_cfg(), _weights(seed=2), jnp.float32)
    tbl = m.params["language_model"]["model"]["embed_tokens"]["weight"]
    assert tbl.shape[0] == 96  # 90 base + 6 additional
