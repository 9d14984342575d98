"""zaya1_vl: CCA conv-mixed attention + MoD/EDA MoE + qwen2_5_vl vision.

Parity: reference mlx_vlm/models/zaya1_vl (language.py CCA:94, router:349,
switch mlp:406; zaya1_vl.py sanitize:129).  Weights use RAW checkpoint
names (local_experts.{e}, torch-layout conv_qk, no layer-0 residual scale)
so the full sanitize/homogenize path is exercised.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step, make_cache
from mlx_vlm_tpu.utils.loader import load_model_from_weights

D, NQ, NKV, HD = 32, 4, 2, 8
NE, EXP, FFN = 4, 16, 32  # experts, router expansion, gated ffn (I' = 16)
VE, VP, VL = 16, 4, 2  # vision width / patch / depth
R = 4  # lora rank
IMG_ID = 90


def _cfg(**over):
    cfg = {
        "model_type": "zaya1_vl",
        "vocab_size": 128,
        "hidden_size": D,
        "ffn_hidden_size": FFN,
        "num_hidden_layers": 2,
        "num_experts": NE,
        "num_attention_heads": NQ,
        "num_key_value_heads": NKV,
        "num_query_groups": NKV,
        "head_dim": HD,
        "moe_router_topk": 1,
        "zaya_mlp_expansion": EXP,
        "zaya_use_mod": True,
        "zaya_use_eda": True,
        "scale_residual_merge": True,
        "gated_linear_unit": True,
        "rope_theta": 10000.0,
        "partial_rotary_factor": 0.5,
        "cca_time0": 2,
        "cca_time1": 2,
        "vision_lora": True,
        "vision_lora_rank_attn": R,
        "vision_lora_rank_mlp": R,
        "tie_word_embeddings": True,
        "image_token_id": IMG_ID,
        "vision_config": {
            # zaya checkpoints use the in_chans / spatial_patch_size aliases
            "model_type": "qwen2_5_vl",
            "depth": VL, "hidden_size": VE, "intermediate_size": 32,
            "out_hidden_size": D, "num_heads": 2, "in_chans": 3,
            "spatial_patch_size": VP, "spatial_merge_size": 2,
            "temporal_patch_size": 1, "window_size": 16,
            "fullatt_block_indexes": [1],
        },
    }
    cfg.update(over)
    return cfg


def _weights(seed=0, with_lora=True):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    w = {"model.embed_tokens.weight": rand(128, D),
         "model.final_norm.weight": np.ones(D, np.float32),
         "model.res_scale.hidden_states_scale": 1 + 0.05 * rand(D),
         "model.res_scale.hidden_states_bias": 0.02 * rand(D),
         "model.res_scale.residual_scale": 1 + 0.05 * rand(D),
         "model.res_scale.residual_bias": 0.02 * rand(D)}
    C = (NQ + NKV) * HD
    for i in range(2):
        p = f"model.layers.{i}."
        w[p + "attn.input_norm.weight"] = np.ones(D, np.float32)
        w[p + "mlp.input_norm.weight"] = np.ones(D, np.float32)
        for half in ("attn", "mlp"):
            rs = p + half + ".res_scale."
            w[rs + "hidden_states_scale"] = 1 + 0.05 * rand(D)
            w[rs + "hidden_states_bias"] = 0.02 * rand(D)
            # layer-0 attn half has NO residual scale (reference
            # ResidualScaling(config, 0):75) — sanitize synthesizes identity
            if not (i == 0 and half == "attn"):
                w[rs + "residual_scale"] = 1 + 0.05 * rand(D)
                w[rs + "residual_bias"] = 0.02 * rand(D)
        sa = p + "attn.self_attn."
        w[sa + "o_proj.weight"] = rand(D, NQ * HD)
        qk = sa + "qkv."
        w[qk + "linear_q.weight"] = rand(NQ * HD, D)
        w[qk + "linear_k.weight"] = rand(NKV * HD, D)
        w[qk + "val_proj1.weight"] = rand(NKV * HD // 2, D)
        w[qk + "val_proj2.weight"] = rand(NKV * HD // 2, D)
        w[qk + "temp"] = 1 + 0.1 * rand(NKV)
        # torch Conv1d layouts: [O, I/groups, K]
        w[qk + "conv_qk.0.weight"] = rand(C, 1, 2)
        w[qk + "conv_qk.0.bias"] = 0.02 * rand(C)
        w[qk + "conv_qk.1.weight"] = rand(C, HD, 2)
        w[qk + "conv_qk.1.bias"] = 0.02 * rand(C)
        if with_lora:
            for stem, rows in ((qk + "lora_linear_q.", NQ * HD),
                               (qk + "lora_linear_k.", NKV * HD),
                               (qk + "lora_val_proj1.", NKV * HD // 2),
                               (qk + "lora_val_proj2.", NKV * HD // 2)):
                w[stem + "0.weight"] = rand(R, D)
                w[stem + "1.weight"] = rand(rows, R)
            w[sa + "lora_linear_o.0.weight"] = rand(R, NQ * HD)
            w[sa + "lora_linear_o.1.weight"] = rand(D, R)
        rt = p + "mlp.zaya_block.router."
        w[rt + "down_proj.weight"] = rand(EXP, D)
        w[rt + "down_proj.bias"] = 0.02 * rand(EXP)
        w[rt + "rmsnorm_eda.weight"] = np.ones(EXP, np.float32)
        if i != 0:  # reference: use_eda and layer_number != 0
            w[rt + "router_states_scale"] = 1 + 0.05 * rand(EXP)
        w[rt + "router_mlp.0.weight"] = rand(EXP, EXP)
        w[rt + "router_mlp.0.bias"] = 0.02 * rand(EXP)
        w[rt + "router_mlp.2.weight"] = rand(EXP, EXP)
        w[rt + "router_mlp.2.bias"] = 0.02 * rand(EXP)
        w[rt + "router_mlp.4.weight"] = rand(NE + 1, EXP)
        bb = np.zeros(NE + 1, np.float32)
        bb[-1] = -1.0
        w[rt + "balancing_biases"] = bb
        ex = p + "mlp.zaya_block.experts.local_experts."
        for e in range(NE):
            w[ex + f"{e}.linear_fc1.weight"] = rand(FFN, D)
            w[ex + f"{e}.linear_fc2.weight"] = rand(D, FFN // 2)
            if with_lora:
                w[ex + f"{e}.lora_fc1.0.weight"] = rand(R, D)
                w[ex + f"{e}.lora_fc1.1.weight"] = rand(FFN, R)
                w[ex + f"{e}.lora_fc2.0.weight"] = rand(R, FFN // 2)
                w[ex + f"{e}.lora_fc2.1.weight"] = rand(D, R)

    vt = "vision_tower."
    w[vt + "patch_embed.proj.weight"] = rand(VE, 3, 1, VP, VP)
    for i in range(VL):
        bp = vt + f"blocks.{i}."
        w[bp + "norm1.weight"] = np.ones(VE, np.float32)
        w[bp + "norm2.weight"] = np.ones(VE, np.float32)
        w[bp + "attn.qkv.weight"] = rand(3 * VE, VE)
        w[bp + "attn.qkv.bias"] = 0.02 * rand(3 * VE)
        w[bp + "attn.proj.weight"] = rand(VE, VE)
        w[bp + "attn.proj.bias"] = 0.02 * rand(VE)
        w[bp + "mlp.gate_proj.weight"] = rand(32, VE)
        w[bp + "mlp.gate_proj.bias"] = 0.02 * rand(32)
        w[bp + "mlp.up_proj.weight"] = rand(32, VE)
        w[bp + "mlp.up_proj.bias"] = 0.02 * rand(32)
        w[bp + "mlp.down_proj.weight"] = rand(VE, 32)
        w[bp + "mlp.down_proj.bias"] = 0.02 * rand(VE)
    w[vt + "merger.ln_q.weight"] = np.ones(VE, np.float32)
    w[vt + "merger.mlp.0.weight"] = rand(4 * VE, 4 * VE)
    w[vt + "merger.mlp.0.bias"] = 0.02 * rand(4 * VE)
    w[vt + "merger.mlp.2.weight"] = rand(D, 4 * VE)
    w[vt + "merger.mlp.2.bias"] = 0.02 * rand(D)
    return w


@pytest.fixture(scope="module")
def model():
    return load_model_from_weights(_cfg(), _weights(), jnp.float32)


def _prompt_embeds(model, ids):
    pos, _ = model.prepare_position_ids(ids)
    e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
    return e, pos


def test_text_generate(model):
    ids = (np.arange(7, dtype=np.int32) % 80 + 1)[None]
    e, pos = _prompt_embeds(model, ids)
    toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=4,
                                                position_ids=pos)]
    assert len(toks) == 4


def test_image_generate(model):
    grid = np.asarray([[1, 4, 4]])  # 16 patches -> 4 merged tokens
    aux = {k: jnp.asarray(v) for k, v in model.vision_aux_inputs(grid).items()}
    rng = np.random.default_rng(1)
    pv = (rng.standard_normal((16, 3 * VP * VP)) * 0.1).astype(np.float32)
    ids = np.array([[3, 4] + [IMG_ID] * 4 + [5]], np.int32)
    pos, _ = model.prepare_position_ids(ids)
    e = model.get_input_embeddings(model.params, jnp.asarray(ids),
                                   jnp.asarray(pv), **aux)
    assert e.shape == (1, 7, D)
    toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=3,
                                                position_ids=pos)]
    assert len(toks) == 3


def test_prefill_matches_stepwise(model):
    """CCA conv tail + val_proj2 hidden delay must carry across steps."""
    S = 6
    ids = (np.arange(S, dtype=np.int32) * 7 % 80 + 1)[None]
    e, pos = _prompt_embeds(model, ids)
    cache = make_cache(model, 1, 16, jnp.float32)
    logits_full, _ = model(model.params, e, cache, jnp.asarray(pos))

    model.prepare_position_ids(ids)  # re-stash (same mask)
    cache2 = make_cache(model, 1, 16, jnp.float32)
    last = None
    for t in range(S):
        p = np.full((3, 1, 1), t, np.int32)
        lg, cache2 = model(model.params, e[:, t:t + 1], cache2,
                           jnp.asarray(p))
        last = np.asarray(lg[0, 0])
    np.testing.assert_allclose(np.asarray(logits_full[0, -1]), last,
                               atol=2e-4, rtol=1e-3)


def test_padded_prefill_matches_exact(model):
    """Right-padded prefill (pos==0 sentinel) must not corrupt the conv
    tail or the one-token hidden delay."""
    S, pad = 5, 3
    ids = (np.arange(S, dtype=np.int32) * 3 % 80 + 1)[None]
    e, pos = _prompt_embeds(model, ids)
    e = np.asarray(e)
    cache = make_cache(model, 1, 16, jnp.float32)
    _, c_exact = model(model.params, jnp.asarray(e), cache, jnp.asarray(pos))

    model.prepare_position_ids(ids)
    e_p = np.concatenate([e, np.zeros((1, pad, D), e.dtype)], 1)
    pos_p = np.concatenate([pos, np.zeros((3, 1, pad), np.int32)], -1)
    cache = make_cache(model, 1, 16, jnp.float32)
    _, c_pad = model(model.params, jnp.asarray(e_p), cache,
                     jnp.asarray(pos_p))
    np.testing.assert_allclose(np.asarray(c_exact.conv),
                               np.asarray(c_pad.conv), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_exact.hprev),
                               np.asarray(c_pad.hprev), atol=1e-6)


def test_vision_lora_gates_on_image_tokens(model):
    """LoRA adapters must fire ONLY at image-token positions: stripping the
    LoRA weights changes image-position logits but not a text-only run."""
    stripped = {k: v for k, v in _weights().items() if ".lora_" not in k}
    m2 = load_model_from_weights(_cfg(vision_lora=False), stripped,
                                 jnp.float32)
    ids_txt = (np.arange(5, dtype=np.int32) % 80 + 1)[None]
    e1, pos = _prompt_embeds(model, ids_txt)
    c1 = make_cache(model, 1, 16, jnp.float32)
    l1, _ = model(model.params, e1, c1, jnp.asarray(pos))
    e2, _ = _prompt_embeds(m2, ids_txt)
    c2 = make_cache(m2, 1, 16, jnp.float32)
    l2, _ = m2(m2.params, e2, c2, jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               atol=2e-5, rtol=1e-4)

    ids_img = np.array([[3, IMG_ID, IMG_ID, 4, 5]], np.int32)
    e1, pos = _prompt_embeds(model, ids_img)
    c1 = make_cache(model, 1, 16, jnp.float32)
    l1, _ = model(model.params, e1, c1, jnp.asarray(pos))
    m2.prepare_position_ids(ids_img)
    c2 = make_cache(m2, 1, 16, jnp.float32)
    l2, _ = m2(m2.params, e1, c2, jnp.asarray(pos))
    assert float(np.abs(np.asarray(l1) - np.asarray(l2)).max()) > 1e-5


def test_mod_skip_expert_is_identity():
    """Tokens routed to the MoD expert (index E) pass through scaled by
    the route prob only (reference ZayaSwitchMLP:487-491)."""
    cfg = _cfg()
    w = _weights(with_lora=True)
    # force router to always pick the skip expert
    for i in range(2):
        k = f"model.layers.{i}.mlp.zaya_block.router.balancing_biases"
        bb = np.zeros(NE + 1, np.float32)
        bb[-1] = 100.0
        w[k] = bb
    m = load_model_from_weights(cfg, w, jnp.float32)
    ids = (np.arange(4, dtype=np.int32) % 80 + 1)[None]
    e, pos = _prompt_embeds(m, ids)
    c = make_cache(m, 1, 16, jnp.float32)
    logits, _ = m(m.params, e, c, jnp.asarray(pos))
    assert np.all(np.isfinite(np.asarray(logits)))
