"""DeepSeek-V3.2: DSA lightning-indexer sparse attention over MLA."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights

from test_deepseek_v2 import tiny_dsv2_config, tiny_dsv2_weights


def tiny_cfg(**over):
    cfg = tiny_dsv2_config()
    cfg.update({
        "model_type": "deepseek_v32",
        "index_head_dim": 16,
        "index_n_heads": 2,
        "index_topk": 8,
    })
    cfg.update(over)
    return cfg


def weights(cfg, seed=0):
    w = tiny_dsv2_weights(cfg, seed)
    rng = np.random.default_rng(seed + 9)

    def rand(*sh):
        return (rng.standard_normal(sh) * 0.05).astype(np.float32)

    D = cfg["hidden_size"]
    Hi, Di = cfg["index_n_heads"], cfg["index_head_dim"]
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}.self_attn.indexer."
        w[p + "wq_b.weight"] = rand(Hi * Di, cfg["q_lora_rank"])
        w[p + "wk.weight"] = rand(Di, D)
        w[p + "k_norm.weight"] = np.ones(Di, np.float32)
        w[p + "k_norm.bias"] = np.zeros(Di, np.float32)
        w[p + "weights_proj.weight"] = rand(Hi, D)
    return w


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    return load_model_from_weights(cfg, weights(cfg), jnp.float32)


class TestDeepseekV32:
    def test_cache_has_indexer_keys(self, model):
        cache = model.language_model.init_cache(1, 16, jnp.float32)
        assert cache.ik.shape == (3, 1, 16, 16)

    def test_generate(self, model):
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(model.get_input_embeddings)(model.params,
                                                jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, model, max_tokens=4)]
        assert len(toks) == 4

    def test_sparse_equals_dense_when_topk_covers(self):
        """With index_topk >= valid positions the top-k restriction keeps
        every real token, so DSA must reproduce dense MLA exactly."""
        cfg = tiny_cfg()
        m32 = load_model_from_weights(cfg, weights(cfg, 3), jnp.float32)
        v2cfg = dict(tiny_dsv2_config(), model_type="deepseek_v2")
        w2 = {k: v for k, v in weights(cfg, 3).items()
              if ".indexer." not in k}
        mv2 = load_model_from_weights(v2cfg, w2, jnp.float32)

        S, C = 6, 16  # capacity 16 > index_topk 8 >= S 6 -> sparse active
        ids = (np.arange(S, dtype=np.int32) * 5 % 200)[None]
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S))

        def logits(m):
            e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
            cache = m.language_model.init_cache(1, C, jnp.float32)
            l, _ = m(m.params, e, cache, jnp.asarray(pos))
            return np.asarray(l)

        np.testing.assert_allclose(logits(m32), logits(mv2),
                                   atol=1e-5, rtol=1e-5)

    def test_sparse_restricts_when_topk_small(self):
        """index_topk < sequence length must change the logits (attention
        can no longer see every position)."""
        cfg = tiny_cfg(index_topk=2)
        m = load_model_from_weights(cfg, weights(cfg, 3), jnp.float32)
        v2cfg = dict(tiny_dsv2_config(), model_type="deepseek_v2")
        w2 = {k: v for k, v in weights(cfg, 3).items()
              if ".indexer." not in k}
        mv2 = load_model_from_weights(v2cfg, w2, jnp.float32)
        S, C = 6, 16
        ids = (np.arange(S, dtype=np.int32) * 5 % 200)[None]
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S))

        def logits(mm):
            e = jax.jit(mm.get_input_embeddings)(mm.params,
                                                 jnp.asarray(ids))
            cache = mm.language_model.init_cache(1, C, jnp.float32)
            l, _ = mm(mm.params, e, cache, jnp.asarray(pos))
            return np.asarray(l)

        assert not np.allclose(logits(m), logits(mv2), atol=1e-5)


class TestGlmMoeDsa:
    def _cfg(self, **over):
        cfg = tiny_cfg()
        cfg.update({
            "model_type": "glm_moe_dsa",
            "rope_parameters": {"rope_theta": 10000.0, "rope_type": "default"},
            "index_topk_freq": 2,
            "index_skip_topk_offset": 1,
        })
        cfg.update(over)
        return cfg

    def test_indexer_pattern(self):
        from mlx_vlm_tpu.models.glm_moe_dsa import ModelConfig

        cfg = ModelConfig.from_dict(self._cfg())
        # offset 1, freq 2 over 3 layers: i=0 -> max(0,0)%2==0 full;
        # i=1 -> 1%2 shared; i=2 -> 2%2 full
        assert cfg.indexer_types == ["full", "shared", "full"]
        cfg2 = ModelConfig.from_dict(self._cfg(index_topk_pattern="FSS"))
        assert cfg2.indexer_types == ["full", "shared", "shared"]

    def test_generate_and_shared_reuse(self):
        cfg = self._cfg()
        m = load_model_from_weights(cfg, weights(cfg), jnp.float32)
        # shared layers carry no indexer weights in real checkpoints; the
        # loaded tree still has them from the builder, which is harmless —
        # they are simply unused.  generation must run through both kinds.
        ids = (np.arange(6, dtype=np.int32) % 200)[None]
        e = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
        toks = [int(t[0]) for t, _ in generate_step(e, m, max_tokens=4)]
        assert len(toks) == 4

    def test_matches_v32_when_all_full(self):
        """All-'full' pattern must equal plain deepseek_v32."""
        cfg = self._cfg(index_topk_pattern="FFF")
        m = load_model_from_weights(cfg, weights(cfg, 4), jnp.float32)
        v32 = load_model_from_weights(tiny_cfg(), weights(tiny_cfg(), 4),
                                      jnp.float32)
        S, C = 6, 16
        ids = (np.arange(S, dtype=np.int32) * 5 % 200)[None]
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S))

        def logits(mm):
            e = jax.jit(mm.get_input_embeddings)(mm.params,
                                                 jnp.asarray(ids))
            cache = mm.language_model.init_cache(1, C, jnp.float32)
            l, _ = mm(mm.params, e, cache, jnp.asarray(pos))
            return np.asarray(l)

        np.testing.assert_allclose(logits(m), logits(v32), atol=1e-6)
