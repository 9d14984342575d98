"""phi4mm: Phi-4 LM (fused qkv + LoRA merge) + SigLIP NaFlex + Conformer audio.

Role parity: reference mlx_vlm/models/phi4mm (phi4mm.py, audio.py, vision.py).
Weights below use RAW checkpoint names (base_layer / lora_A.vision /
embed_tokens_extend.*) so the full sanitize path is exercised.
"""

import numpy as np

import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights

P, E, VL, D = 4, 16, 2, 32  # vision patch/width/layers, LM width
AD, AH, AB, AF = 16, 2, 2, 12  # audio dim/heads/blocks/ffn


def _cfg():
    return {
        "model_type": "phi4mm",
        "hidden_size": D, "num_hidden_layers": 2,
        "intermediate_size": 64, "num_attention_heads": 4,
        "num_key_value_heads": 2, "rms_norm_eps": 1e-5,
        "vocab_size": 96, "rope_theta": 10000.0,
        "partial_rotary_factor": 0.75,
        "tie_word_embeddings": True,
        "vision_lora": {"r": 4, "lora_alpha": 8},
        "speech_lora": {"r": 4, "lora_alpha": 8},
        "audio_processor": {"config": {
            "attention_dim": AD, "attention_heads": AH, "num_blocks": AB,
            "linear_units": AF, "input_size": 8, "time_reduction": 8,
            "conv_channels": AD, "ext_pw_out_channel": AD,
            "depthwise_seperable_out_channel": AD,
            "t5_bias_max_distance": 32,
        }},
        "vision_config": {"model_type": "siglip2_vision_model",
                          "hidden_size": E, "intermediate_size": 32,
                          "num_hidden_layers": VL,
                          "num_attention_heads": 2,
                          "patch_size": P, "num_patches": 16,
                          "num_channels": 3},
    }


def _weights(seed=0):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    w = {"model.embed_tokens.weight": rand(96, D),
         "model.norm.weight": np.ones(D, np.float32)}
    for i in range(2):
        p = f"model.layers.{i}."
        w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        # fused qkv/gate_up ship as LoRA base_layer weights in the checkpoint
        w[p + "self_attn.qkv_proj.base_layer.weight"] = rand((4 + 2 + 2) * 8, D)
        w[p + "self_attn.o_proj.base_layer.weight"] = rand(D, 32)
        w[p + "mlp.gate_up_proj.base_layer.weight"] = rand(2 * 64, D)
        w[p + "mlp.down_proj.base_layer.weight"] = rand(D, 64)
        for stem, rows in ((p + "self_attn.qkv_proj.", (4 + 2 + 2) * 8),
                           (p + "self_attn.o_proj.", D)):
            for branch in ("vision", "speech"):
                w[stem + f"lora_A.{branch}.weight"] = rand(4, D if rows != D
                                                           else 32)
                w[stem + f"lora_B.{branch}.weight"] = rand(rows, 4)

    vt = "model.embed_tokens_extend.image_embed.img_processor."
    w[vt + "embeddings.patch_embedding.weight"] = rand(E, 3, P, P)
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
    w[vt + "head.attention.in_proj_weight"] = rand(3 * E, E)  # dropped
    w["model.embed_tokens_extend.image_embed.glb_GN"] = rand(1, 1, E)
    w["model.embed_tokens_extend.image_embed.sub_GN"] = rand(1, 1, 1, E)
    mp = "model.embed_tokens_extend.image_embed.img_projection."
    w[mp + "0.weight"] = rand(D, E)
    w[mp + "0.bias"] = rand(D)
    w[mp + "2.weight"] = rand(D, D)
    w[mp + "2.bias"] = rand(D)

    ae = "model.embed_tokens_extend.audio_embed.encoder."
    w[ae + "encoder_embedding.global_mean"] = rand(8)
    w[ae + "encoder_embedding.global_invstd"] = 1 + 0.1 * rand(8)
    w[ae + "embed.conv.0.weight"] = rand(AD, 1, 3, 3)
    w[ae + "embed.conv.0.bias"] = rand(AD)
    for slot, (o, i) in (("2", (AD, 1)), ("3", (AD, AD)),
                         ("5", (AD, 1)), ("6", (AD, AD))):
        kk = 3 if slot in ("2", "5") else 1
        w[ae + f"embed.conv.{slot}.weight"] = rand(o, i, kk, kk)
        w[ae + f"embed.conv.{slot}.bias"] = rand(o)
    w[ae + "embed.out.weight"] = rand(AD, AD * 1)  # freq 8 -> 4 -> 2 -> 1
    w[ae + "embed.out.bias"] = rand(AD)
    w[ae + "relative_attention_bias_layer.bias_values.weight"] = rand(64, AH)
    for i in range(AB):
        bp = ae + f"encoders.{i}."
        for ff in ("feed_forward_in", "feed_forward_out"):
            w[bp + ff + ".layer_norm.weight"] = np.ones(AD, np.float32)
            w[bp + ff + ".layer_norm.bias"] = np.zeros(AD, np.float32)
            w[bp + ff + ".net.0.linear.weight"] = rand(2 * AF, AD)
            w[bp + ff + ".net.0.linear.bias"] = rand(2 * AF)
            w[bp + ff + ".net.2.weight"] = rand(AD, AF)
            w[bp + ff + ".net.2.bias"] = rand(AD)
        for n in ("linear_q", "linear_k", "linear_v", "linear_out"):
            w[bp + f"self_attn.{n}.weight"] = rand(AD, AD)
            w[bp + f"self_attn.{n}.bias"] = rand(AD)
        for n in ("layer_norm_att", "layer_norm"):
            w[bp + n + ".weight"] = np.ones(AD, np.float32)
            w[bp + n + ".bias"] = np.zeros(AD, np.float32)
        cv = bp + "conv."
        w[cv + "layer_norm.weight"] = np.ones(AD, np.float32)
        w[cv + "layer_norm.bias"] = np.zeros(AD, np.float32)
        w[cv + "glu.ext_pw_conv_1d.weight"] = rand(2 * AD, AD, 1)  # Conv1d k=1
        w[cv + "glu.ext_pw_conv_1d.bias"] = rand(2 * AD)
        w[cv + "glu.b1"] = rand(1, AD, 1)
        w[cv + "glu.b2"] = rand(1, AD, 1)
        w[cv + "dw_sep_conv_1d.dw_conv.weight"] = rand(AD, 1, 3)
        w[cv + "dw_sep_conv_1d.dw_conv.bias"] = rand(AD)
        w[cv + "dw_sep_conv_1d.pw_conv.weight"] = rand(AD, AD, 1)
        w[cv + "dw_sep_conv_1d.pw_conv.bias"] = rand(AD)
        w[cv + "ext_pw_conv_1d.weight"] = rand(AD, AD, 1)
        w[cv + "ext_pw_conv_1d.bias"] = rand(AD)
    ap = "model.embed_tokens_extend.audio_embed.audio_projection."
    for branch in ("speech", "vision"):
        w[ap + branch + ".0.weight"] = rand(D, AD)
        w[ap + branch + ".0.bias"] = rand(D)
        w[ap + branch + ".2.weight"] = rand(D, D)
        w[ap + branch + ".2.bias"] = rand(D)
    return w


def _model():
    return load_model_from_weights(_cfg(), _weights(), jnp.float32)


def test_image_generate():
    m = _model()
    ids = np.array([[5, 6, 7, 8] + [-200] * 6 + [9, 10]], np.int32)
    grid = np.asarray([[1, 2, 3]])
    aux = {k: jnp.asarray(v) for k, v in m.vision_aux_inputs(grid).items()}
    rng = np.random.default_rng(1)
    pv = (rng.standard_normal((6, 3 * P * P)) * 0.1).astype(np.float32)
    e = m.get_input_embeddings(m.params, jnp.asarray(ids),
                               jnp.asarray(pv), **aux)
    assert e.shape == (1, 12, D)
    pos, _ = m.prepare_position_ids(ids)
    toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=3,
                                                position_ids=pos)]
    assert len(toks) == 3


def test_audio_generate():
    m = _model()
    # two clips of different mel lengths, padded to one batch
    f0 = np.random.default_rng(2).standard_normal((40, 8)) * 0.1
    f1 = np.random.default_rng(3).standard_normal((24, 8)) * 0.1
    fa = np.zeros((2, 40, 8), np.float32)
    fa[0], fa[1, :24] = f0, f1
    aux = m.audio_aux_inputs(fa, [40, 24])
    n0 = m.audio_embed_size(40)
    n1 = m.audio_embed_size(24)
    assert aux["audio_feat_idx"].shape == (n0 + n1,)
    ids = np.array([[5, 6] + [200011] * (n0 + n1) + [9]], np.int32)
    e = m.get_input_embeddings(
        m.params, jnp.asarray(ids),
        input_audio_embeds=jnp.asarray(aux["input_audio_embeds"]),
        audio_feat_idx=jnp.asarray(aux["audio_feat_idx"]))
    assert e.shape == (1, 3 + n0 + n1, D)
    pos, _ = m.prepare_position_ids(ids)
    toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=2,
                                                position_ids=pos)]
    assert len(toks) == 2


def test_lora_merge_changes_weights():
    """vision/speech LoRA pairs must fold into the base projections."""
    w = _weights()
    stripped = {k: v for k, v in w.items() if ".lora_" not in k}
    m1 = load_model_from_weights(_cfg(), w, jnp.float32)
    m2 = load_model_from_weights(_cfg(), stripped, jnp.float32)
    q1 = m1.params["language_model"]["model"]["layers"]["self_attn"][
        "q_proj"]["weight"]
    q2 = m2.params["language_model"]["model"]["layers"]["self_attn"][
        "q_proj"]["weight"]
    assert float(np.abs(np.asarray(q1) - np.asarray(q2)).max()) > 1e-6


def test_conformer_chunking_matches_unchunked():
    """>CHUNK-frame mels unfold to 500-frame windows; short clips do not."""
    from mlx_vlm_tpu.models.phi4mm import audio as A

    m = _model()
    rng = np.random.default_rng(4)
    mel = (rng.standard_normal((1, 16, 8)) * 0.1).astype(np.float32)
    out = A.conformer_encode(m.params["audio_encoder"],
                             m.audio_config, jnp.asarray(mel))
    assert out.shape == (1, m.audio_embed_size(16), AD)
