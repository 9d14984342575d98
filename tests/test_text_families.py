"""Text-only family registrations: granite, cohere2/cohere, phi3 remap."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from mlx_vlm_tpu.utils.testing import llama_hf_weights, tiny_llama_config


class TestGranite:
    def test_multipliers_and_generate(self):
        cfg = tiny_llama_config()
        cfg.update(model_type="granite", embedding_multiplier=12.0,
                   residual_multiplier=0.22, logits_scaling=8.0,
                   attention_multiplier=0.015, tie_word_embeddings=False)
        m = load_model_from_weights(cfg, llama_hf_weights(cfg, 0), jnp.float32)
        lcfg = dict(cfg)
        lcfg.update(model_type="llama")
        plain = load_model_from_weights(lcfg, llama_hf_weights(cfg, 0),
                                        jnp.float32)
        ids = (np.arange(5, dtype=np.int32) % 200)[None]
        e_g = np.asarray(jax.jit(m.get_input_embeddings)(m.params,
                                                         jnp.asarray(ids)))
        e_p = np.asarray(jax.jit(plain.get_input_embeddings)(
            plain.params, jnp.asarray(ids)))
        np.testing.assert_allclose(e_g, e_p * 12.0, atol=1e-5)
        toks = [int(t[0]) for t, _ in generate_step(
            jnp.asarray(e_g), m, max_tokens=3)]
        assert len(toks) == 3


class TestCohereText:
    def test_cohere_v1_remap_full_attention(self):
        from tests.test_aya_vision import tiny_aya_config, tiny_aya_weights

        acfg = tiny_aya_config()
        tcfg = dict(acfg["text_config"])
        tcfg["model_type"] = "cohere"  # v1 -> remapped, full attention
        del tcfg["sliding_window"], tcfg["sliding_window_pattern"]
        tw = {k[len("language_model."):]: v
              for k, v in tiny_aya_weights(acfg).items()
              if k.startswith("language_model.")}
        m = load_model_from_weights(tcfg, tw, jnp.float32)
        assert all(not g for g in m.language_model.is_global[:3])
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=3)]
        assert len(toks) == 3


class TestPhi3Text:
    def test_phi3_remap(self):
        from tests.test_phi3_v import tiny_phi3v_config, tiny_phi3v_weights

        pcfg = {k: v for k, v in tiny_phi3v_config().items()
                if k != "vision_config"}
        pcfg["model_type"] = "phi3"
        pw = {k: v for k, v in tiny_phi3v_weights(tiny_phi3v_config()).items()
              if "vision" not in k}
        m = load_model_from_weights(pcfg, pw, jnp.float32)
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=3)]
        assert len(toks) == 3


class TestInternLM2:
    def test_wqkv_split_matches_separate(self):
        """Fused grouped wqkv must split to the same model as separate
        q/k/v weights."""
        cfg = tiny_llama_config()
        w = llama_hf_weights(cfg, 0)
        nh, nkv = cfg["num_attention_heads"], cfg["num_key_value_heads"]
        hd = cfg["hidden_size"] // nh
        g = nh // nkv
        iw = {
            "model.tok_embeddings.weight": w["model.embed_tokens.weight"],
            "model.norm.weight": w["model.norm.weight"],
            "output.weight": w["lm_head.weight"],
        }
        for i in range(cfg["num_hidden_layers"]):
            p = f"model.layers.{i}."
            q = w[p + "self_attn.q_proj.weight"].reshape(nkv, g, hd, -1)
            k = w[p + "self_attn.k_proj.weight"].reshape(nkv, 1, hd, -1)
            v = w[p + "self_attn.v_proj.weight"].reshape(nkv, 1, hd, -1)
            iw[p + "attention.wqkv.weight"] = np.concatenate(
                [q, k, v], axis=1).reshape(-1, cfg["hidden_size"])
            iw[p + "attention.wo.weight"] = w[p + "self_attn.o_proj.weight"]
            iw[p + "attention_norm.weight"] = w[p + "input_layernorm.weight"]
            iw[p + "ffn_norm.weight"] = w[p + "post_attention_layernorm.weight"]
            iw[p + "feed_forward.w1.weight"] = w[p + "mlp.gate_proj.weight"]
            iw[p + "feed_forward.w3.weight"] = w[p + "mlp.up_proj.weight"]
            iw[p + "feed_forward.w2.weight"] = w[p + "mlp.down_proj.weight"]
        icfg = dict(cfg)
        icfg["model_type"] = "internlm2"
        m = load_model_from_weights(icfg, iw, jnp.float32)
        plain = load_model_from_weights(cfg, w, jnp.float32)
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(plain.get_input_embeddings)(plain.params, jnp.asarray(ids))
        pos = np.broadcast_to(np.arange(6, dtype=np.int32), (3, 1, 6)).copy()
        l1, _ = m(m.params, e, None, jnp.asarray(pos))
        l2, _ = plain(plain.params, e, None, jnp.asarray(pos))
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


class TestOlmo2:
    def test_generate(self):
        cfg = tiny_llama_config()
        cfg["model_type"] = "olmo2"
        w = llama_hf_weights(cfg, 0)
        nh = cfg["num_attention_heads"]
        nkv = cfg["num_key_value_heads"]
        hd = cfg["hidden_size"] // nh
        for i in range(cfg["num_hidden_layers"]):
            p = f"model.layers.{i}."
            # olmo2 norms: full-width q/k norms, post-* branch norms
            del w[p + "input_layernorm.weight"]
            w[p + "self_attn.q_norm.weight"] = np.ones(nh * hd, np.float32)
            w[p + "self_attn.k_norm.weight"] = np.ones(nkv * hd, np.float32)
            w[p + "post_feedforward_layernorm.weight"] = np.ones(
                cfg["hidden_size"], np.float32)
        m = load_model_from_weights(cfg, w, jnp.float32)
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=3)]
        assert len(toks) == 3 and type(m).__module__.endswith("olmo2")


class TestLlamaRemaps:
    @pytest.mark.parametrize("mt", ["ernie4_5", "helium", "seed_oss", "internlm3", "telechat3"])
    def test_remapped_families_generate(self, mt):
        cfg = tiny_llama_config()
        cfg["model_type"] = mt
        m = load_model_from_weights(cfg, llama_hf_weights(cfg, 0), jnp.float32)
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=3)]
        assert len(toks) == 3


class TestSmolLM3:
    def test_nope_layers_and_generate(self):
        cfg = tiny_llama_config()
        cfg["model_type"] = "smollm3"
        cfg["no_rope_layer_interval"] = 2
        m = load_model_from_weights(cfg, llama_hf_weights(cfg, 0), jnp.float32)
        # every 2nd layer NoPE
        assert m.language_model.use_rope.tolist() == [True, False] * (
            cfg["num_hidden_layers"] // 2)
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=3)]
        assert len(toks) == 3

    def test_all_rope_matches_llama(self):
        """With every layer roped, smollm3 must equal plain llama."""
        cfg = tiny_llama_config()
        w = llama_hf_weights(cfg, 0)
        scfg = dict(cfg)
        scfg["model_type"] = "smollm3"
        scfg["no_rope_layer_interval"] = 10**6  # never NoPE
        m = load_model_from_weights(scfg, dict(w), jnp.float32)
        plain = load_model_from_weights(cfg, dict(w), jnp.float32)
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(plain.get_input_embeddings)(plain.params, jnp.asarray(ids))
        pos = np.broadcast_to(np.arange(6, dtype=np.int32), (3, 1, 6)).copy()
        l1, _ = m(m.params, e, None, jnp.asarray(pos))
        l2, _ = plain(plain.params, e, None, jnp.asarray(pos))
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


class TestExaone:
    def test_renamed_keys_match_llama(self):
        cfg = tiny_llama_config()
        w = llama_hf_weights(cfg, 0)
        ew = {}
        ren = [("model.layers.", "transformer.h."),
               (".input_layernorm.", ".ln_1."),
               (".post_attention_layernorm.", ".ln_2."),
               (".self_attn.q_proj.", ".attn.attention.q_proj."),
               (".self_attn.k_proj.", ".attn.attention.k_proj."),
               (".self_attn.v_proj.", ".attn.attention.v_proj."),
               (".self_attn.o_proj.", ".attn.attention.out_proj."),
               (".mlp.gate_proj.", ".mlp.c_fc_0."),
               (".mlp.up_proj.", ".mlp.c_fc_1."),
               (".mlp.down_proj.", ".mlp.c_proj."),
               ("model.embed_tokens.", "transformer.wte."),
               ("model.norm.", "transformer.ln_f.")]
        for k, v in w.items():
            for new, old in ren:
                k = k.replace(new, old)
            ew[k] = v
        ecfg = dict(cfg)
        ecfg["model_type"] = "exaone"
        m = load_model_from_weights(ecfg, ew, jnp.float32)
        plain = load_model_from_weights(cfg, w, jnp.float32)
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(plain.get_input_embeddings)(plain.params, jnp.asarray(ids))
        pos = np.broadcast_to(np.arange(6, dtype=np.int32), (3, 1, 6)).copy()
        l1, _ = m(m.params, e, None, jnp.asarray(pos))
        l2, _ = plain(plain.params, e, None, jnp.asarray(pos))
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


class TestGlm4Text:
    def test_generate(self):
        from tests.test_glm4v import tiny_glm4v_config, tiny_glm4v_weights

        vcfg = tiny_glm4v_config()
        tcfg = dict(vcfg["text_config"])
        tcfg["model_type"] = "glm4"
        tcfg.pop("rope_scaling")
        w = {}
        for k, v in tiny_glm4v_weights(vcfg).items():
            if k.startswith("model.language_model."):
                w["model." + k[len("model.language_model."):]] = v
            elif k.startswith("lm_head"):
                w[k] = v
        m = load_model_from_weights(tcfg, w, jnp.float32)
        assert type(m).__module__.endswith("glm4")
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=3)]
        assert len(toks) == 3


class TestHunyuanDense:
    def test_generate_with_qk_norm_and_ntk_alpha(self):
        cfg = tiny_llama_config()
        cfg["model_type"] = "hunyuan_v1_dense"
        cfg["use_qk_norm"] = True
        cfg["rope_scaling"] = {"alpha": 1000.0}
        w = llama_hf_weights(cfg, 0)
        nh = cfg["num_attention_heads"]
        nkv = cfg["num_key_value_heads"]
        hd = cfg["hidden_size"] // nh
        for i in range(cfg["num_hidden_layers"]):
            p = f"model.layers.{i}.self_attn."
            w[p + "query_layernorm.weight"] = np.ones(hd, np.float32)
            w[p + "key_layernorm.weight"] = np.ones(hd, np.float32)
        m = load_model_from_weights(cfg, w, jnp.float32)
        # NTK-alpha > 1 lengthens the rope wavelengths (smaller inv_freq)
        cfg0 = dict(cfg)
        cfg0["rope_scaling"] = None
        m0 = load_model_from_weights(cfg0, dict(w), jnp.float32)
        f_alpha = np.asarray(m.language_model.rope.inv_freq)
        f_plain = np.asarray(m0.language_model.rope.inv_freq)
        assert (f_alpha[1:] < f_plain[1:]).all()
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=3)]
        assert len(toks) == 3
