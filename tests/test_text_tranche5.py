"""Text-family tranche 5: dbrx, openelm, baichuan_m1, hunyuan (MoE),
phi3small, minicpm3."""

import numpy as np

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights

IDS = (np.arange(7, dtype=np.int32) * 11 % 90)[None]


def _rand(rng):
    def f(*sh):
        return (rng.standard_normal(sh) * 0.08).astype(np.float32)
    return f


def _gen(model, n=3):
    e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(IDS))
    return [int(t[0]) for t, _ in generate_step(e, model, max_tokens=n)]


def _full_logits(model, ids):
    e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
    S = ids.shape[1]
    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S)).copy()
    logits, _ = model(model.params, e, None, jnp.asarray(pos))
    return np.asarray(logits)


def _chunked_last_logits(model, ids, split):
    """Prefill in two chunks through the real cache; return the final-step
    logits — exercises cross-chunk cache/state carry."""
    lm = model.language_model
    e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
    S = ids.shape[1]
    cache = lm.init_cache(1, S, jnp.float32)
    p1 = np.arange(split, dtype=np.int32)[None]
    p2 = np.arange(split, S, dtype=np.int32)[None]
    _, cache = model(model.params, e[:, :split], cache, jnp.asarray(p1))
    logits, _ = model(model.params, e[:, split:], cache, jnp.asarray(p2))
    return np.asarray(logits[:, -1])


class TestDBRX:
    def _cfg(self):
        return {"model_type": "dbrx", "vocab_size": 120, "d_model": 32,
                "n_layers": 2, "n_heads": 4, "max_seq_len": 256,
                "attn_config": {"kv_n_heads": 2, "clip_qkv": 8.0,
                                "rope_theta": 500000.0},
                "ffn_config": {"ffn_hidden_size": 48, "moe_num_experts": 4,
                               "moe_top_k": 2}}

    def _weights(self, cfg, seed=0):
        rand = _rand(np.random.default_rng(seed))
        D = cfg["d_model"]
        I = cfg["ffn_config"]["ffn_hidden_size"]
        E = cfg["ffn_config"]["moe_num_experts"]
        kvd = cfg["attn_config"]["kv_n_heads"] * (D // cfg["n_heads"])
        w = {"transformer.wte.weight": rand(cfg["vocab_size"], D),
             "transformer.norm_f.weight": np.ones(D, np.float32),
             "lm_head.weight": rand(cfg["vocab_size"], D)}
        for i in range(cfg["n_layers"]):
            p = f"transformer.blocks.{i}."
            w[p + "norm_attn_norm.norm_1.weight"] = np.ones(D, np.float32)
            w[p + "norm_attn_norm.norm_2.weight"] = np.ones(D, np.float32)
            w[p + "norm_attn_norm.attn.Wqkv.weight"] = rand(D + 2 * kvd, D)
            w[p + "norm_attn_norm.attn.out_proj.weight"] = rand(D, D)
            w[p + "ffn.router.layer.weight"] = rand(E, D)
            w[p + "ffn.experts.mlp.w1"] = rand(E * I, D)
            w[p + "ffn.experts.mlp.v1"] = rand(E * I, D)
            w[p + "ffn.experts.mlp.w2"] = rand(E * I, D)
        return w

    def test_generate(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        assert len(_gen(m)) == 3

    def test_chunked_prefill_parity(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        whole = _full_logits(m, IDS)[:, -1]
        chunked = _chunked_last_logits(m, IDS, split=4)
        np.testing.assert_allclose(chunked, whole, atol=2e-5)

    def test_clip_qkv_changes_output(self):
        cfg = self._cfg()
        w = self._weights(cfg, seed=3)
        # blow up one qkv row so clipping bites
        key = "transformer.blocks.0.norm_attn_norm.attn.Wqkv.weight"
        w[key] = w[key] * 400.0
        m1 = load_model_from_weights(dict(cfg), dict(w), jnp.float32)
        cfg2 = dict(cfg)
        cfg2["attn_config"] = dict(cfg["attn_config"], clip_qkv=1e9)
        m2 = load_model_from_weights(cfg2, dict(w), jnp.float32)
        assert np.abs(_full_logits(m1, IDS) - _full_logits(m2, IDS)).max() > 1e-4


class TestOpenELM:
    def _cfg(self):
        return {"model_type": "openelm", "head_dim": 8,
                "num_transformer_layers": 3, "model_dim": 32,
                "vocab_size": 100, "num_query_heads": [2, 3, 4],
                "num_kv_heads": [1, 1, 2], "ffn_multipliers": [0.5, 1.0, 2.0],
                "ffn_dim_divisor": 8, "normalize_qk_projections": True,
                "share_input_output_layers": True,
                "max_context_length": 256}

    def _weights(self, cfg, seed=0):
        rand = _rand(np.random.default_rng(seed))
        D, hd = cfg["model_dim"], cfg["head_dim"]
        w = {"transformer.token_embeddings.weight": rand(cfg["vocab_size"], D),
             "transformer.norm.weight": np.ones(D, np.float32)}
        for i in range(cfg["num_transformer_layers"]):
            nh, nkv = cfg["num_query_heads"][i], cfg["num_kv_heads"][i]
            ffi = int(cfg["ffn_multipliers"][i] * D)
            p = f"transformer.layers.{i}."
            w[p + "attn_norm.weight"] = np.ones(D, np.float32)
            w[p + "ffn_norm.weight"] = np.ones(D, np.float32)
            w[p + "attn.qkv_proj.weight"] = rand((nh + 2 * nkv) * hd, D)
            w[p + "attn.out_proj.weight"] = rand(D, nh * hd)
            w[p + "attn.q_norm.weight"] = np.ones(hd, np.float32)
            w[p + "attn.k_norm.weight"] = np.ones(hd, np.float32)
            w[p + "ffn.proj_1.weight"] = rand(2 * ffi, D)
            w[p + "ffn.proj_2.weight"] = rand(D, ffi)
        return w

    def test_generate_per_layer_heads(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        assert len(_gen(m)) == 3

    def test_chunked_prefill_parity(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        whole = _full_logits(m, IDS)[:, -1]
        chunked = _chunked_last_logits(m, IDS, split=3)
        np.testing.assert_allclose(chunked, whole, atol=2e-5)


class TestBaichuanM1:
    def _cfg(self):
        return {"model_type": "baichuan_m1", "vocab_size": 110,
                "hidden_size": 32, "intermediate_size": 64,
                "num_hidden_layers": 3, "num_attention_heads": 4,
                "num_key_value_heads": 2, "rope_theta": 100000.0,
                "sliding_window": 4, "sliding_window_layers": [1],
                "num_swa_attention_heads": 2, "num_swa_key_value_heads": 1,
                "conv_window": 2, "rms_norm_eps": 1e-6,
                "max_position_embeddings": 256}

    def _weights(self, cfg, seed=0):
        rand = _rand(np.random.default_rng(seed))
        D, I, V = (cfg["hidden_size"], cfg["intermediate_size"],
                   cfg["vocab_size"])
        hd = D // cfg["num_attention_heads"]
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.norm.weight": np.ones(D, np.float32),
             "lm_head.weight": rand(V, D)}
        for i in range(cfg["num_hidden_layers"]):
            swa = i in cfg["sliding_window_layers"]
            nh = cfg["num_swa_attention_heads"] if swa else cfg["num_attention_heads"]
            nkv = cfg["num_swa_key_value_heads"] if swa else cfg["num_key_value_heads"]
            p = f"model.layers.{i}."
            w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
            w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
            w[p + "self_attn.W_pack.weight"] = rand((nh + 2 * nkv) * hd, D)
            w[p + "self_attn.o_proj.weight"] = rand(D, nh * hd)
            w[p + "self_attn.conv_k"] = (
                np.full((1, 1, nkv, 1, 2), 0.5, np.float32))
            w[p + "self_attn.conv_v"] = (
                np.full((1, 1, nkv, 1, 2), 0.5, np.float32))
            w[p + "mlp.gate_proj.weight"] = rand(I, D)
            w[p + "mlp.up_proj.weight"] = rand(I, D)
            w[p + "mlp.down_proj.weight"] = rand(D, I)
        return w

    def test_generate(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        assert len(_gen(m)) == 3

    def test_conv_state_carries_across_chunks(self):
        """The 2-tap KV conv needs the previous chunk's last RAW token —
        chunked prefill must match whole-prompt logits exactly."""
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        whole = _full_logits(m, IDS)[:, -1]
        for split in (1, 3, 5):
            chunked = _chunked_last_logits(m, IDS, split=split)
            np.testing.assert_allclose(chunked, whole, atol=2e-5)

    def test_lm_head_is_normalized(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        w = np.asarray(m.params["language_model"]["lm_head"]["weight"])
        np.testing.assert_allclose(
            np.linalg.norm(w, axis=-1), np.ones(w.shape[0]), atol=1e-3)


class TestHunyuanMoE:
    def _cfg(self, use_cla=True):
        return {"model_type": "hunyuan", "vocab_size": 130,
                "hidden_size": 32, "num_hidden_layers": 2,
                "intermediate_size": 64, "num_attention_heads": 4,
                "num_key_value_heads": 2, "attention_bias": False,
                "moe_topk": 2, "num_experts": 4, "num_shared_expert": 1,
                "use_mixed_mlp_moe": True, "use_qk_norm": True,
                "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
                "use_cla": use_cla, "cla_share_factor": 2,
                "moe_intermediate_size": 48,
                "rope_scaling": {"type": "dynamic", "alpha": 1000.0,
                                 "factor": 1.0},
                "tie_word_embeddings": True}

    def _weights(self, cfg, seed=0):
        rand = _rand(np.random.default_rng(seed))
        D, V = cfg["hidden_size"], cfg["vocab_size"]
        hd = D // cfg["num_attention_heads"]
        kvd = cfg["num_key_value_heads"] * hd
        E, MI = cfg["num_experts"], cfg["moe_intermediate_size"]
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.norm.weight": np.ones(D, np.float32)}
        for i in range(cfg["num_hidden_layers"]):
            p = f"model.layers.{i}."
            w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
            w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
            w[p + "self_attn.q_proj.weight"] = rand(D, D)
            has_kv = (not cfg["use_cla"]) or i % cfg["cla_share_factor"] == 0
            if has_kv:
                w[p + "self_attn.k_proj.weight"] = rand(kvd, D)
                w[p + "self_attn.v_proj.weight"] = rand(kvd, D)
            w[p + "self_attn.o_proj.weight"] = rand(D, D)
            w[p + "self_attn.query_layernorm.weight"] = np.ones(hd, np.float32)
            w[p + "self_attn.key_layernorm.weight"] = np.ones(hd, np.float32)
            w[p + "mlp.gate.wg.weight"] = rand(E, D)
            for e in range(E):
                w[p + f"mlp.experts.{e}.gate_proj.weight"] = rand(MI, D)
                w[p + f"mlp.experts.{e}.up_proj.weight"] = rand(MI, D)
                w[p + f"mlp.experts.{e}.down_proj.weight"] = rand(D, MI)
            w[p + "mlp.shared_mlp.gate_proj.weight"] = rand(
                cfg["intermediate_size"], D)
            w[p + "mlp.shared_mlp.up_proj.weight"] = rand(
                cfg["intermediate_size"], D)
            w[p + "mlp.shared_mlp.down_proj.weight"] = rand(
                D, cfg["intermediate_size"])
        return w

    def test_generate_cla(self):
        cfg = self._cfg(use_cla=True)
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        assert len(_gen(m)) == 3

    def test_chunked_prefill_parity(self):
        cfg = self._cfg(use_cla=True)
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        whole = _full_logits(m, IDS)[:, -1]
        chunked = _chunked_last_logits(m, IDS, split=4)
        np.testing.assert_allclose(chunked, whole, atol=2e-5)

    def test_cla_shares_kv(self):
        """With CLA, layer 1 consumes layer 0's pre-rope k/v: its cache
        content must equal layer 0's."""
        cfg = self._cfg(use_cla=True)
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        lm = m.language_model
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(IDS))
        S = IDS.shape[1]
        cache = lm.init_cache(1, S, jnp.float32)
        pos = np.arange(S, dtype=np.int32)[None]
        _, cache = m(m.params, e, cache, jnp.asarray(pos))
        # same pre-rope kv + same positions + identity key_layernorm
        np.testing.assert_allclose(np.asarray(cache.k[0]),
                                   np.asarray(cache.k[1]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(cache.v[0]),
                                   np.asarray(cache.v[1]), atol=1e-6)


class TestPhi3Small:
    def _cfg(self):
        return {"model_type": "phi3small", "hidden_size": 32,
                "dense_attention_every_n_layers": 2,
                "ff_intermediate_size": 64, "gegelu_limit": 20.0,
                "num_hidden_layers": 2, "num_attention_heads": 4,
                "layer_norm_epsilon": 1e-5, "vocab_size": 128,
                "num_key_value_heads": 2, "mup_attn_multiplier": 1.0,
                "mup_use_scaling": True, "mup_embedding_multiplier": 10.0,
                "mup_width_multiplier": 8.0,
                "blocksparse_block_size": 2,
                "blocksparse_num_local_blocks": 2,
                "blocksparse_vert_stride": 3,
                "max_position_embeddings": 256}

    def _weights(self, cfg, seed=0):
        rand = _rand(np.random.default_rng(seed))
        D, V, I = cfg["hidden_size"], cfg["vocab_size"], \
            cfg["ff_intermediate_size"]
        nh, nkv = cfg["num_attention_heads"], cfg["num_key_value_heads"]
        hd = D // nh
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.final_layernorm.weight": np.ones(D, np.float32),
             "model.final_layernorm.bias": np.zeros(D, np.float32)}
        for i in range(cfg["num_hidden_layers"]):
            p = f"model.layers.{i}."
            for n in ("input_layernorm", "post_attention_layernorm"):
                w[p + n + ".weight"] = np.ones(D, np.float32)
                w[p + n + ".bias"] = np.zeros(D, np.float32)
            w[p + "self_attn.query_key_value.weight"] = rand(
                (nh + 2 * nkv) * hd, D)
            w[p + "self_attn.query_key_value.bias"] = rand((nh + 2 * nkv) * hd)
            w[p + "self_attn.dense.weight"] = rand(D, D)
            w[p + "self_attn.dense.bias"] = rand(D)
            w[p + "mlp.up_proj.weight"] = rand(2 * I, D)
            w[p + "mlp.up_proj.bias"] = rand(2 * I)
            w[p + "mlp.down_proj.weight"] = rand(D, I)
            w[p + "mlp.down_proj.bias"] = rand(D)
        return w

    def test_generate(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        assert len(_gen(m)) == 3

    def test_blocksparse_plane(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        lm = m.language_model
        pos = jnp.arange(12, dtype=jnp.int32)[None]
        plane = np.asarray(lm._blocksparse_plane(pos, 12))  # [H, S, C]
        bs, local, vert = 2, 2, 3
        H = cfg["num_attention_heads"]
        for h in range(H):
            for q in range(12):
                for kk in range(12):
                    qb, kb = q // bs, kk // bs
                    want = (qb >= kb) and (
                        (qb - kb < local) or ((kb + h + 1) % vert == 0))
                    assert plane[h, q, kk] == want, (h, q, kk)

    def test_chunked_prefill_parity(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        whole = _full_logits(m, IDS)[:, -1]
        chunked = _chunked_last_logits(m, IDS, split=4)
        np.testing.assert_allclose(chunked, whole, atol=2e-5)


class TestMiniCPM3:
    def _cfg(self, **over):
        cfg = {"model_type": "minicpm3", "vocab_size": 140,
               "hidden_size": 32, "intermediate_size": 64,
               "num_hidden_layers": 2, "num_attention_heads": 2,
               "num_key_value_heads": 2, "q_lora_rank": 16,
               "kv_lora_rank": 16, "qk_nope_head_dim": 8,
               "qk_rope_head_dim": 4, "dim_model_base": 32,
               "scale_depth": 1.4, "scale_emb": 12.0,
               "rms_norm_eps": 1e-6, "rope_theta": 10000.0,
               "max_position_embeddings": 256,
               "tie_word_embeddings": False}
        cfg.update(over)
        return cfg

    def _weights(self, cfg, seed=0):
        rand = _rand(np.random.default_rng(seed))
        D, V, I = (cfg["hidden_size"], cfg["vocab_size"],
                   cfg["intermediate_size"])
        nh = cfg["num_attention_heads"]
        qd = cfg["qk_nope_head_dim"] + cfg["qk_rope_head_dim"]
        vd = D // nh
        r, qr = cfg["kv_lora_rank"], cfg["q_lora_rank"]
        w = {"model.embed_tokens.weight": rand(V, D),
             "model.norm.weight": np.ones(D, np.float32),
             "lm_head.weight": rand(V, D)}
        for i in range(cfg["num_hidden_layers"]):
            p = f"model.layers.{i}."
            w[p + "input_layernorm.weight"] = np.ones(D, np.float32)
            w[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
            w[p + "self_attn.q_a_proj.weight"] = rand(qr, D)
            w[p + "self_attn.q_a_layernorm.weight"] = np.ones(qr, np.float32)
            w[p + "self_attn.q_b_proj.weight"] = rand(nh * qd, qr)
            w[p + "self_attn.kv_a_proj_with_mqa.weight"] = rand(
                r + cfg["qk_rope_head_dim"], D)
            w[p + "self_attn.kv_a_layernorm.weight"] = np.ones(r, np.float32)
            w[p + "self_attn.kv_b_proj.weight"] = rand(
                nh * (cfg["qk_nope_head_dim"] + vd), r)
            w[p + "self_attn.o_proj.weight"] = rand(D, nh * vd)
            w[p + "mlp.gate_proj.weight"] = rand(I, D)
            w[p + "mlp.up_proj.weight"] = rand(I, D)
            w[p + "mlp.down_proj.weight"] = rand(D, I)
        return w

    def test_generate(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, self._weights(cfg), jnp.float32)
        assert len(_gen(m)) == 3

    def test_neutral_scalings_match_deepseek_v2(self):
        """scale_emb=1, scale_depth=sqrt(L), dim_model_base=hidden_size
        turn minicpm3 into exactly the deepseek_v2 MLA decoder."""
        L = 2
        cfg = self._cfg(scale_emb=1.0, scale_depth=float(np.sqrt(L)),
                        dim_model_base=32)
        w = self._weights(cfg, seed=5)
        m = load_model_from_weights(dict(cfg), dict(w), jnp.float32)

        ds = dict(cfg)
        ds["model_type"] = "deepseek_v2"
        ds["v_head_dim"] = 16
        ds["first_k_dense_replace"] = L  # all dense
        d = load_model_from_weights(ds, dict(w), jnp.float32)

        def logits_with_cache(model):
            e = jax.jit(model.get_input_embeddings)(model.params,
                                                    jnp.asarray(IDS))
            S = IDS.shape[1]
            cache = model.language_model.init_cache(1, S, jnp.float32)
            pos = np.arange(S, dtype=np.int32)[None]
            out, _ = model(model.params, e, cache, jnp.asarray(pos))
            return np.asarray(out)

        np.testing.assert_allclose(logits_with_cache(m),
                                   logits_with_cache(d), atol=3e-5)
