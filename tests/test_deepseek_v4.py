"""deepseek_v4: hyper-connections, pooled/sparse attention, HISA, hash MoE.

Parity: reference mlx_vlm/models/deepseek_v4 (hyper_connection.py
_hc_split_sinkhorn_ops:204, language.py Compressor:430/_overlap:254,
hisa_kernel.py:15, MoEGate hash routing:100).  Weights use RAW checkpoint
keys (layers.N.hc_attn_fn, ffn.experts.N.w1, flat wo_a) to exercise
sanitize.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step, make_cache
from mlx_vlm_tpu.models.deepseek_v4 import (
    hc_collapse,
    hc_expand,
    hisa_select,
    pooled_refresh,
    v4_rope,
    v4_rope_rates,
)
from mlx_vlm_tpu.utils.loader import load_model_from_weights

D, V = 32, 64
NH, HD, QR = 4, 16, 8  # heads, head_dim, qk_rope_dim
QLORA, OG, OLORA = 16, 2, 8
NE, TOPK, MI = 4, 2, 16
IH, IHD = 2, 8  # index heads / head dim
HC = 4
PATTERN = [0, 128, 4, 0]


def _cfg(**over):
    cfg = {
        "model_type": "deepseek_v4",
        "vocab_size": V, "hidden_size": D, "intermediate_size": 32,
        "moe_intermediate_size": MI, "num_hidden_layers": len(PATTERN),
        "num_attention_heads": NH, "head_dim": HD, "qk_rope_head_dim": QR,
        "q_lora_rank": QLORA, "o_groups": OG, "o_lora_rank": OLORA,
        "n_routed_experts": NE, "num_experts_per_tok": TOPK,
        "n_shared_experts": 1, "num_hash_layers": 2,
        "sliding_window": 8, "compress_ratios": list(PATTERN),
        "hc_mult": HC, "hc_sinkhorn_iters": 6,
        "index_n_heads": IH, "index_head_dim": IHD,
        "index_topk": 4, "index_block": 2, "index_keep": 2,
        "rope_theta": 10000.0, "compress_rope_theta": 16000.0,
        "swiglu_limit": 10.0, "routed_scaling_factor": 1.5,
    }
    cfg.update(over)
    return cfg


def _weights(seed=0):
    rng = np.random.default_rng(seed)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)

    w = {
        "embed.weight": rand(V, D),
        "norm.weight": np.ones(D, np.float32),
        "head.weight": rand(V, D),
        "hc_head_fn": 0.3 * rand(HC, HC * D),
        "hc_head_base": 0.1 * rand(HC),
        "hc_head_scale": np.ones(1, np.float32),
    }
    for i, r in enumerate(PATTERN):
        p = f"layers.{i}."
        w[p + "attn_norm.weight"] = np.ones(D, np.float32)
        w[p + "ffn_norm.weight"] = np.ones(D, np.float32)
        mix = (2 + HC) * HC
        for sub in ("attn", "ffn"):
            w[p + f"hc_{sub}_fn"] = 0.3 * rand(mix, HC * D)
            w[p + f"hc_{sub}_base"] = 0.1 * rand(mix)
            w[p + f"hc_{sub}_scale"] = np.ones(3, np.float32)
        a = p + "attn."
        w[a + "wq_a.weight"] = rand(QLORA, D)
        w[a + "q_norm.weight"] = np.ones(QLORA, np.float32)
        w[a + "wq_b.weight"] = rand(NH * HD, QLORA)
        w[a + "wkv.weight"] = rand(HD, D)
        w[a + "kv_norm.weight"] = np.ones(HD, np.float32)
        w[a + "wo_a.weight"] = rand(OG * OLORA, NH * HD // OG)
        w[a + "wo_b.weight"] = rand(D, OG * OLORA)
        w[a + "attn_sink"] = 0.1 * rand(NH)
        if r in (4, 128):
            out_dim = HD * (2 if r == 4 else 1)
            c = a + "compressor."
            w[c + "wkv.weight"] = rand(out_dim, D)
            w[c + "wgate.weight"] = rand(out_dim, D)
            w[c + "ape"] = 0.1 * rand(r, out_dim)
            w[c + "norm.weight"] = np.ones(HD, np.float32)
        if r == 4:
            ix = a + "indexer."
            w[ix + "wq_b.weight"] = rand(IH * IHD, QLORA)
            w[ix + "weights_proj.weight"] = rand(IH, D)
            ic = ix + "compressor."
            w[ic + "wkv.weight"] = rand(2 * IHD, D)
            w[ic + "wgate.weight"] = rand(2 * IHD, D)
            w[ic + "ape"] = 0.1 * rand(4, 2 * IHD)
            w[ic + "norm.weight"] = np.ones(IHD, np.float32)
        f = p + "ffn."
        w[f + "gate.weight"] = rand(NE, D)
        if i < 2:  # hash layers
            w[f + "gate.tid2eid"] = rng.integers(
                0, NE, (V, TOPK)).astype(np.int32)
        else:
            w[f + "gate.bias"] = 0.05 * rand(NE)
        for e in range(NE):
            w[f + f"experts.{e}.w1.weight"] = rand(MI, D)
            w[f + f"experts.{e}.w3.weight"] = rand(MI, D)
            w[f + f"experts.{e}.w2.weight"] = rand(D, MI)
        w[f + "shared_experts.w1.weight"] = rand(MI, D)
        w[f + "shared_experts.w3.weight"] = rand(MI, D)
        w[f + "shared_experts.w2.weight"] = rand(D, MI)
    return w


@pytest.fixture(scope="module")
def model():
    return load_model_from_weights(_cfg(), _weights(), jnp.float32)


def test_hc_collapse_expand_properties():
    """Sinkhorn comb is doubly-stochastic; collapse/expand match a numpy
    port of the reference ops path (_hc_split_sinkhorn_ops:204)."""
    rng = np.random.default_rng(1)
    B, L, Dd = 2, 3, 8
    x = rng.standard_normal((B, L, HC, Dd)).astype(np.float32)
    p = {"fn": 0.5 * rng.standard_normal(((2 + HC) * HC, HC * Dd)).astype(
        np.float32),
        "base": 0.1 * rng.standard_normal((2 + HC) * HC).astype(np.float32),
        "scale": np.ones(3, np.float32)}
    col, post, comb = hc_collapse(
        {k: jnp.asarray(v) for k, v in p.items()}, jnp.asarray(x), HC, 20,
        1e-6, 1e-6)
    comb = np.asarray(comb)
    np.testing.assert_allclose(comb.sum(-1), 1.0, atol=2e-3)
    np.testing.assert_allclose(comb.sum(-2), 1.0, atol=2e-3)
    # numpy reference
    z = x.reshape(B, L, -1)
    z = z / np.sqrt((z * z).mean(-1, keepdims=True) + 1e-6)
    mixes = z @ p["fn"].T
    pre_ref = 1 / (1 + np.exp(-(mixes[..., :HC] + p["base"][:HC]))) + 1e-6
    col_ref = (pre_ref[..., None] * x).sum(2)
    np.testing.assert_allclose(np.asarray(col), col_ref, atol=1e-4,
                               rtol=1e-3)
    post_ref = 2 / (1 + np.exp(-(mixes[..., HC:2 * HC]
                                 + p["base"][HC:2 * HC])))
    np.testing.assert_allclose(np.asarray(post), post_ref, atol=1e-4,
                               rtol=1e-3)
    # expand: post scales the block output, comb^T mixes the residual
    y = rng.standard_normal((B, L, Dd)).astype(np.float32)
    out = hc_expand(jnp.asarray(y), jnp.asarray(x), post, jnp.asarray(comb))
    ref = post_ref[..., None] * y[:, :, None] + np.einsum(
        "blgh,blgd->blhd", comb, x)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-3)


def test_pooled_refresh_prefill_matches_decode():
    """One-shot window compression == token-by-token accumulation."""
    rng = np.random.default_rng(2)
    B, C, hd, r = 1, 32, 8, 4
    raw_kv = rng.standard_normal((B, C, hd)).astype(np.float32)
    raw_gate = rng.standard_normal((B, C, hd)).astype(np.float32)
    ape = 0.1 * rng.standard_normal((r, hd)).astype(np.float32)
    nw = np.ones(hd, np.float32)
    rates = jnp.asarray(v4_rope_rates(4, 10000.0, hd, None, freq_scale=r))
    S = 11
    pooled0 = jnp.zeros((B, C // r, hd))
    one = pooled_refresh(jnp.asarray(raw_kv), jnp.asarray(raw_gate),
                         pooled0, jnp.asarray(ape), jnp.asarray(nw), rates,
                         jnp.asarray(0), S, r, False, 1e-6)
    step = pooled0
    for t in range(S):
        step = pooled_refresh(jnp.asarray(raw_kv), jnp.asarray(raw_gate),
                              step, jnp.asarray(ape), jnp.asarray(nw),
                              rates, jnp.asarray(t), 1, r, False, 1e-6)
    np.testing.assert_allclose(np.asarray(one), np.asarray(step),
                               atol=1e-5, rtol=1e-4)
    # exactly S//r windows are complete; the rest stay zero
    assert np.abs(np.asarray(one)[0, S // r:]).max() == 0
    assert np.abs(np.asarray(one)[0, : S // r]).max() > 0


def test_pooled_refresh_overlap_uses_prev_window():
    """Overlap compressor (ratio 4) mixes the previous window's first-half
    channels (reference _overlap_compress_kv:254)."""
    rng = np.random.default_rng(3)
    B, C, hd, r = 1, 16, 4, 4
    raw_kv = rng.standard_normal((B, C, 2 * hd)).astype(np.float32)
    raw_gate = rng.standard_normal((B, C, 2 * hd)).astype(np.float32)
    ape = np.zeros((r, 2 * hd), np.float32)
    nw = np.ones(hd, np.float32)
    rates = jnp.asarray(np.zeros(hd // 2, np.float32))  # identity rope
    pooled0 = jnp.zeros((B, C // r, hd))
    base = pooled_refresh(jnp.asarray(raw_kv), jnp.asarray(raw_gate),
                          pooled0, jnp.asarray(ape), jnp.asarray(nw),
                          rates, jnp.asarray(0), 8, r, True, 1e-6)
    # perturb window-0 rows' FIRST-half channels -> window 1 must change
    kv2 = raw_kv.copy()
    kv2[0, :4, :hd] += 1.0
    pert = pooled_refresh(jnp.asarray(kv2), jnp.asarray(raw_gate),
                          pooled0, jnp.asarray(ape), jnp.asarray(nw),
                          rates, jnp.asarray(0), 8, r, True, 1e-6)
    d = np.abs(np.asarray(base) - np.asarray(pert))
    assert d[0, 1].max() > 1e-6  # window 1 saw window 0's kv_a
    # second-half channels of window 0 unchanged -> window 0 pooled
    # differs only via its own second half (kv_b untouched there)
    assert d[0, 0].max() < 1e-6


def test_hisa_matches_flat_when_all_blocks_kept():
    """index_keep >= n_blocks makes HISA exact: same top-k as flat scan."""
    rng = np.random.default_rng(4)
    B, H, L, hd = 1, 2, 3, 8
    Np, blk = 8, 2
    q = jnp.asarray(rng.standard_normal((B, H, L, hd)).astype(np.float32))
    pooled = jnp.asarray(rng.standard_normal((B, Np, hd)).astype(
        np.float32))
    wts = jnp.asarray(rng.standard_normal((B, L, H)).astype(np.float32))
    valid = jnp.full((B, L), Np, jnp.int32)
    k = 3
    sel = hisa_select(q, pooled, wts, hd**-0.5, k, blk, Np // blk, valid)
    # flat reference
    s = np.maximum(np.einsum("bhld,bnd->bhln", np.asarray(q),
                             np.asarray(pooled)), 0) * hd**-0.5
    flat = (s * np.asarray(wts).transpose(0, 2, 1)[..., None]).sum(1)
    ref = np.argsort(-flat, axis=-1)[..., :k]
    assert set(np.asarray(sel)[0, 0].tolist()) == set(ref[0, 0].tolist())


def test_hisa_respects_valid_len():
    rng = np.random.default_rng(5)
    B, H, L, hd, Np = 1, 2, 2, 8, 16
    q = jnp.asarray(rng.standard_normal((B, H, L, hd)).astype(np.float32))
    pooled = jnp.asarray(rng.standard_normal((B, Np, hd)).astype(
        np.float32))
    wts = jnp.asarray(np.abs(rng.standard_normal((B, L, H))).astype(
        np.float32))
    valid = jnp.asarray([[4, 16]], jnp.int32)
    sel = np.asarray(hisa_select(q, pooled, wts, hd**-0.5, 4, 2, 4, valid))
    assert (sel[0, 0] < 4).all()  # first query sees only 4 positions


def test_text_generate(model):
    ids = (np.arange(7, dtype=np.int32) % (V - 4) + 2)[None]
    pos, _ = model.prepare_position_ids(ids)
    e = model.get_input_embeddings(model.params, jnp.asarray(ids))
    toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=4,
                                                position_ids=pos)]
    assert len(toks) == 4


def test_prefill_matches_stepwise(model):
    """Pooling remainders, sliding window, HISA and hash routing must all
    carry across steps identically to one-shot prefill."""
    S = 10
    rng = np.random.default_rng(6)
    ids = rng.integers(2, V - 2, (1, S)).astype(np.int32)
    pos, _ = model.prepare_position_ids(ids)
    e = model.get_input_embeddings(model.params, jnp.asarray(ids))
    cache = make_cache(model, 1, 64, jnp.float32)
    logits_full, _ = model(model.params, e, cache, jnp.asarray(pos))

    cache2 = make_cache(model, 1, 64, jnp.float32)
    last = None
    for t in range(S):
        lg, cache2 = model(model.params, e[:, t:t + 1], cache2,
                           jnp.asarray(pos[:, :, t:t + 1]))
        last = np.asarray(lg[0, 0])
    np.testing.assert_allclose(np.asarray(logits_full[0, -1]), last,
                               atol=3e-4, rtol=2e-3)


def test_hash_routing_uses_token_table(model):
    """Changing tid2eid on a hash layer changes the output; changing it on
    a bias layer does not (reference MoEGate hash:345)."""
    ids = (np.arange(5, dtype=np.int32) % (V - 4) + 2)[None]
    pos, _ = model.prepare_position_ids(ids)
    e = model.get_input_embeddings(model.params, jnp.asarray(ids))

    def run(params):
        cache = make_cache(model, 1, 64, jnp.float32)
        lg, _ = model(params, e, cache, jnp.asarray(pos))
        return np.asarray(lg)

    base = run(model.params)
    # layer 0 is a hash layer (local type, ordinal 0)
    p2 = jax.tree.map(lambda x: x, model.params)
    t2 = np.asarray(
        p2["language_model"]["model"]["local_layers"]["ffn"]["gate"]
        ["tid2eid"]).copy()
    t2[0] = (t2[0] + 1) % NE
    p2["language_model"]["model"]["local_layers"]["ffn"]["gate"][
        "tid2eid"] = jnp.asarray(t2)
    assert np.abs(run(p2) - base).max() > 1e-6
    # bias layers ignore their (synthesized) tid2eid
    p3 = jax.tree.map(lambda x: x, model.params)
    t3 = np.asarray(
        p3["language_model"]["model"]["sparse_layers"]["ffn"]["gate"]
        ["tid2eid"]).copy()
    t3 = (t3 + 1) % NE
    p3["language_model"]["model"]["sparse_layers"]["ffn"]["gate"][
        "tid2eid"] = jnp.asarray(t3)
    np.testing.assert_allclose(run(p3), base, atol=1e-7)


def test_sliding_window_locality(model):
    """A local-layer-only perturbation outside the window cannot leak in
    through local attention (it can only travel via pooled tokens)."""
    a = model.config
    assert a.sliding_window == 8
    # sanity: the mask helper itself
    lm = model.language_model
    m = np.asarray(lm._local_mask(jnp.asarray(10), 1, 64,
                                  jnp.zeros(1, jnp.int32)))[0, 0, 0]
    assert m[10] and m[3] and not m[2] and not m[11]


def test_v4_rope_identity_pairs():
    """First (head_dim - rope_dims)/2 pairs are rotation-free (reference
    _get_freqs inf padding:178)."""
    rates = v4_rope_rates(8, 10000.0, 16, None)
    assert (rates[:4] == 0).all() and (rates[4:] > 0).all()
    x = jnp.asarray(np.random.default_rng(7).standard_normal(
        (1, 5, 16)).astype(np.float32))
    y = v4_rope(x, jnp.arange(5), jnp.asarray(rates))
    np.testing.assert_allclose(np.asarray(y)[..., :8],
                               np.asarray(x)[..., :8], atol=1e-6)
    assert np.abs(np.asarray(y)[..., 8:] - np.asarray(x)[..., 8:]).max() \
        > 1e-3
    # inverse rope undoes it
    z = v4_rope(y, jnp.arange(5), jnp.asarray(rates), inverse=True)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-5)
