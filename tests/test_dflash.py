"""DFlash drafter: block-parallel speculative decoding.

Contract parity: reference mlx_vlm/speculative/dflash.py (_dflash_rounds —
lossless greedy output) + drafters/qwen3_dflash (draft_block shape,
checkpoint loading with dflash_config), and _dflash_next_block_size
(adaptive backoff).
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.speculative.dflash import DFlashStats, dflash_generate_step
from mlx_vlm_tpu.speculative.drafters.dflash import (DFlashConfig,
                                                     DFlashDrafter,
                                                     init_dflash_params,
                                                     next_block_size)
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from mlx_vlm_tpu.utils.testing import llama_hf_weights, tiny_llama_config


@pytest.fixture(scope="module")
def target():
    cfg = tiny_llama_config(num_hidden_layers=3)
    return load_model_from_weights(cfg, llama_hf_weights(cfg, seed=1),
                                   jnp.float32)


def _embeds(model, ids):
    return jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))


def _plain_greedy(model, ids, max_tokens):
    return [int(t[0]) for t, _ in
            generate_step(_embeds(model, ids), model, max_tokens=max_tokens)]


def _tiny_dflash(target, seed=3):
    tc = target.config
    cfg = DFlashConfig(
        hidden_size=tc.hidden_size,
        intermediate_size=tc.intermediate_size,
        num_attention_heads=tc.num_attention_heads,
        num_key_value_heads=tc.num_key_value_heads,
        vocab_size=tc.vocab_size,
        num_hidden_layers=2,
        mask_token_id=5,
        block_size=4,
        target_layer_ids=(0, 2),
        target_hidden_size=tc.hidden_size,
    )
    return DFlashDrafter(cfg), init_dflash_params(cfg, seed=seed)


class TestDFlash:
    def test_lossless_random_drafter(self, target):
        """Random drafter weights: output must equal plain target greedy."""
        drafter, dparams = _tiny_dflash(target)
        ids = (np.arange(9, dtype=np.int32) * 5 % 200)[None]
        ref = _plain_greedy(target, ids, 12)
        stats = DFlashStats()
        out = [int(t[0]) for t, _ in dflash_generate_step(
            _embeds(target, ids), target, drafter, dparams,
            max_tokens=12, stats=stats)]
        assert out == ref, f"{out} != {ref}"
        assert stats.rounds >= 1
        assert stats.drafted >= stats.rounds  # k >= 1 per round

    def test_lossless_other_prompt_and_seed(self, target):
        drafter, dparams = _tiny_dflash(target, seed=11)
        ids = (np.arange(6, dtype=np.int32) + 3)[None]
        ref = _plain_greedy(target, ids, 10)
        out = [int(t[0]) for t, _ in dflash_generate_step(
            _embeds(target, ids), target, drafter, dparams,
            max_tokens=10, adaptive=False)]
        assert out == ref, f"{out} != {ref}"

    def test_draft_block_shape(self, target):
        drafter, dparams = _tiny_dflash(target)
        bs = 4
        cache = drafter.init_cache(1, 32)
        # seed context with something
        ctx = jnp.ones((1, 3, 2 * target.config.hidden_size))
        cache = drafter.append_fn(3)(dparams, cache, ctx,
                                     jnp.asarray(3, jnp.int32))
        toks = drafter.draft_fn(target.language_model, bs)(
            target.params, dparams, cache, jnp.asarray([7], jnp.int32))
        assert toks.shape == (1, bs - 1)
        assert toks.dtype == jnp.int32

    def test_append_rollback_overwrites(self, target):
        """Rows past the advanced cursor are dead: appending 4 rows with
        n_valid=2 then 2 more rows must give the same K state as appending
        the 2 valid + 2 new rows directly."""
        drafter, dparams = _tiny_dflash(target)
        D2 = 2 * target.config.hidden_size
        rng = np.random.default_rng(0)
        seg_a = jnp.asarray(rng.standard_normal((1, 4, D2)), jnp.float32)
        seg_b = jnp.asarray(rng.standard_normal((1, 2, D2)), jnp.float32)

        c1 = drafter.init_cache(1, 16)
        c1 = drafter.append_fn(4)(dparams, c1, seg_a,
                                  jnp.asarray(2, jnp.int32))
        c1 = drafter.append_fn(2)(dparams, c1, seg_b,
                                  jnp.asarray(2, jnp.int32))

        c2 = drafter.init_cache(1, 16)
        direct = jnp.concatenate([seg_a[:, :2], seg_b], axis=1)
        c2 = drafter.append_fn(4)(dparams, c2, direct,
                                  jnp.asarray(4, jnp.int32))
        np.testing.assert_allclose(np.asarray(c1.k[:, :, :, :4]),
                                   np.asarray(c2.k[:, :, :, :4]),
                                   rtol=1e-5, atol=1e-5)
        assert int(c1.offset) == int(c2.offset) == 4


class TestAdaptiveBlockSize:
    def _stats(self, pairs):
        s = DFlashStats()
        for a, d in pairs:
            s.record(a, d)
        return s

    def test_defaults_to_ceiling(self):
        assert next_block_size(DFlashStats(), 16, 100) == 16

    def test_backoff_on_rejection(self):
        s = self._stats([(0, 15)] * 4)
        assert next_block_size(s, 16, 100) == 4

    def test_partial_acceptance_mid_size(self):
        s = self._stats([(6, 15)] * 4)
        assert next_block_size(s, 16, 100) == 8

    def test_grows_back_on_full_acceptance(self):
        s = self._stats([(0, 15)] * 3 + [(15, 15)] * 8)
        assert next_block_size(s, 16, 100) == 16

    def test_budget_clamp(self):
        assert next_block_size(DFlashStats(), 16, 3) == 3


class TestDFlashLoader:
    def test_load_from_checkpoint_dir(self, target, tmp_path):
        from safetensors.numpy import save_file

        from mlx_vlm_tpu.speculative.drafters import (load_drafter,
                                                      resolve_drafter_kind)

        assert resolve_drafter_kind("qwen3_dflash") == "dflash"

        tc = target.config
        cfg = DFlashConfig(
            hidden_size=tc.hidden_size,
            intermediate_size=tc.intermediate_size,
            num_attention_heads=tc.num_attention_heads,
            num_key_value_heads=tc.num_key_value_heads,
            vocab_size=tc.vocab_size,
            num_hidden_layers=2,
            target_layer_ids=(0, 2),
        )
        params = init_dflash_params(cfg, seed=0)
        flat = {"fc.weight": np.asarray(params["fc"]["weight"]),
                "hidden_norm.weight": np.asarray(
                    params["hidden_norm"]["weight"]),
                "norm.weight": np.asarray(params["norm"]["weight"])}
        for i in range(2):
            for path, leaf in [
                ("input_layernorm.weight",
                 params["layers"]["input_layernorm"]["weight"][i]),
                ("self_attn.q_proj.weight",
                 params["layers"]["self_attn"]["q_proj"]["weight"][i]),
                ("self_attn.k_proj.weight",
                 params["layers"]["self_attn"]["k_proj"]["weight"][i]),
                ("self_attn.v_proj.weight",
                 params["layers"]["self_attn"]["v_proj"]["weight"][i]),
                ("self_attn.o_proj.weight",
                 params["layers"]["self_attn"]["o_proj"]["weight"][i]),
                ("self_attn.q_norm.weight",
                 params["layers"]["self_attn"]["q_norm"]["weight"][i]),
                ("self_attn.k_norm.weight",
                 params["layers"]["self_attn"]["k_norm"]["weight"][i]),
                ("post_attention_layernorm.weight",
                 params["layers"]["post_attention_layernorm"]["weight"][i]),
                ("mlp.gate_proj.weight",
                 params["layers"]["mlp"]["gate_proj"]["weight"][i]),
                ("mlp.up_proj.weight",
                 params["layers"]["mlp"]["up_proj"]["weight"][i]),
                ("mlp.down_proj.weight",
                 params["layers"]["mlp"]["down_proj"]["weight"][i]),
            ]:
                flat[f"layers.{i}.{path}"] = np.asarray(leaf)
        save_file(flat, str(tmp_path / "model.safetensors"))
        (tmp_path / "config.json").write_text(json.dumps({
            "model_type": "qwen3_dflash",
            "hidden_size": tc.hidden_size,
            "intermediate_size": tc.intermediate_size,
            "num_attention_heads": tc.num_attention_heads,
            "num_key_value_heads": tc.num_key_value_heads,
            "vocab_size": tc.vocab_size,
            "num_hidden_layers": 2,
            "dflash_config": {"mask_token_id": 9,
                              "target_layer_ids": [0, 2]},
        }))
        drafter, loaded, kind = load_drafter(str(tmp_path), target)
        assert kind == "dflash"
        assert isinstance(drafter, DFlashDrafter)
        assert drafter.config.mask_token_id == 9
        assert drafter.config.target_layer_ids == (0, 2)
        q = loaded["layers"]["self_attn"]["q_proj"]["weight"]
        assert q.shape[0] == 2  # stacked layer axis
        # the loaded drafter must actually run losslessly
        ids = (np.arange(7, dtype=np.int32) * 3 % 100)[None]
        ref = _plain_greedy(target, ids, 8)
        out = [int(t[0]) for t, _ in dflash_generate_step(
            _embeds(target, ids), target, drafter, loaded, max_tokens=8)]
        assert out == ref


class TestDDTree:
    def test_build_tree_ordering_and_budget(self):
        from mlx_vlm_tpu.speculative.ddtree import build_ddtree

        rng = np.random.default_rng(0)
        logits = rng.standard_normal((3, 10)).astype(np.float32)
        tree = build_ddtree(logits, budget=6)
        assert len(tree) == 6
        # descending factorized log-prob
        lps = [n.log_prob for n in tree]
        assert lps == sorted(lps, reverse=True)
        # prefix-closed: every node's parent appears earlier
        for i, n in enumerate(tree):
            assert n.parent < i
        # the first node is the depth-1 argmax
        assert tree[0].depth == 1
        assert tree[0].token_ids[0] == int(np.argmax(logits[0]))

    def test_ancestor_mask(self):
        from mlx_vlm_tpu.speculative.ddtree import (build_ddtree,
                                                    tree_ancestor_mask)

        logits = np.random.default_rng(1).standard_normal((2, 6)).astype(
            np.float32)
        tree = build_ddtree(logits, budget=4)
        m = tree_ancestor_mask(tree)
        assert m.shape == (5, 5)
        assert m[:, 0].all()  # bonus visible to all
        for i, n in enumerate(tree):
            if n.parent >= 0:
                assert m[i + 1, n.parent + 1]
            # non-ancestor siblings invisible
            for j in range(len(tree)):
                anc = []
                p = n.parent
                while p != -1:
                    anc.append(p)
                    p = tree[p].parent
                if j != i and j not in anc:
                    assert not m[i + 1, j + 1]

    def test_walk_tree(self):
        from mlx_vlm_tpu.speculative.ddtree import DDTreeNode, walk_tree

        # tree: n0=(tokA, d1), n1=(tokB, d1), n2=(tokC, d2 child of n0)
        tree = [DDTreeNode((1,), (5,), -0.1, 1, -1),
                DDTreeNode((2,), (7,), -0.5, 1, -1),
                DDTreeNode((1, 1), (5, 9), -0.7, 2, 0)]
        # greedy after bonus = 5 -> n0; greedy after n0 = 9 -> n2; after n2
        # = anything not in tree -> stop
        greedy = np.asarray([5, 9, 0, 3])
        assert walk_tree(tree, greedy) == [0, 2]
        # no match at root
        assert walk_tree(tree, np.asarray([9, 9, 9, 9])) == []

    def test_tree_generate_lossless(self, target):
        from mlx_vlm_tpu.speculative.ddtree import tree_generate_step

        drafter, dparams = _tiny_dflash(target)
        ids = (np.arange(9, dtype=np.int32) * 5 % 200)[None]
        ref = _plain_greedy(target, ids, 12)
        out = [int(t[0]) for t, _ in tree_generate_step(
            _embeds(target, ids), target, drafter, dparams,
            max_tokens=12, tree_budget=6)]
        assert out == ref, f"{out} != {ref}"
