import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.speculative.utils import SpecStats, speculative_generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from mlx_vlm_tpu.utils.testing import llama_hf_weights, tiny_llama_config


@pytest.fixture(scope="module")
def target():
    cfg = tiny_llama_config(num_hidden_layers=3)
    return load_model_from_weights(cfg, llama_hf_weights(cfg, seed=1), jnp.float32)


@pytest.fixture(scope="module")
def drafter_same(target):
    cfg = tiny_llama_config(num_hidden_layers=3)
    return load_model_from_weights(cfg, llama_hf_weights(cfg, seed=1), jnp.float32)


@pytest.fixture(scope="module")
def drafter_diff():
    cfg = tiny_llama_config(num_hidden_layers=2)
    return load_model_from_weights(cfg, llama_hf_weights(cfg, seed=7), jnp.float32)


def _embeds(model, ids):
    return jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))


def _plain_greedy(model, ids, max_tokens):
    return [
        int(t[0]) for t, _ in generate_step(_embeds(model, ids), model, max_tokens=max_tokens)
    ]


def _spec_greedy(model, drafter, ids, max_tokens, k=3):
    stats = SpecStats()
    toks = [
        int(t[0])
        for t, _ in speculative_generate_step(
            _embeds(model, ids), model, drafter, input_ids=ids,
            max_tokens=max_tokens, num_draft=k, stats=stats,
        )
    ]
    return toks, stats


class TestSpeculative:
    def test_lossless_with_perfect_drafter(self, target, drafter_same):
        """Drafter == target: every draft accepted, output identical."""
        ids = (np.arange(10, dtype=np.int32) * 3 % 200)[None]
        ref = _plain_greedy(target, ids, 12)
        out, stats = _spec_greedy(target, drafter_same, ids, 12, k=3)
        assert out == ref, f"{out} != {ref}"
        # with a perfect drafter, acceptance is capped at k-1 per round
        assert stats.acceptance_rate > 0.6

    def test_lossless_with_weak_drafter(self, target, drafter_diff):
        """Different drafter: output must STILL equal target-only greedy."""
        ids = (np.arange(9, dtype=np.int32) * 11 % 200)[None]
        ref = _plain_greedy(target, ids, 14)
        out, stats = _spec_greedy(target, drafter_diff, ids, 14, k=4)
        assert out == ref, f"{out} != {ref}"
        assert stats.rounds >= 1

    def test_various_block_sizes(self, target, drafter_diff):
        ids = (np.arange(6, dtype=np.int32) + 3)[None]
        ref = _plain_greedy(target, ids, 10)
        for k in (2, 5):
            out, _ = _spec_greedy(target, drafter_diff, ids, 10, k=k)
            assert out == ref, f"k={k}: {out} != {ref}"

    def test_temperature_greedy_equivalence(self, target, drafter_diff):
        """temperature=0 through the rejection walk == plain greedy."""
        ids = (np.arange(7, dtype=np.int32) * 5 % 190)[None]
        ref = _plain_greedy(target, ids, 12)
        toks = [
            int(t[0]) for t, _ in speculative_generate_step(
                _embeds(target, ids), target, drafter_diff, input_ids=ids,
                max_tokens=12, num_draft=3, temperature=0.0, seed=11,
            )
        ]
        assert toks == ref

    def test_temperature_sampling_runs_end_to_end(self, target, drafter_diff):
        """temp>0 speculation yields max_tokens tokens without error and
        different seeds produce different continuations."""
        ids = (np.arange(7, dtype=np.int32) * 5 % 190)[None]
        runs = []
        for seed in (3, 4):
            toks = [
                int(t[0]) for t, _ in speculative_generate_step(
                    _embeds(target, ids), target, drafter_diff,
                    input_ids=ids, max_tokens=10, num_draft=3,
                    temperature=0.9, seed=seed,
                )
            ]
            assert len(toks) == 10
            runs.append(toks)
        assert runs[0] != runs[1]


class TestRejectionWalk:
    """Distribution preservation of the rejection-sampling walk itself
    (reference common.py:135): every committed token must be marginally
    distributed as the target distribution, for any drafter distribution."""

    def _empirical(self, p, q, k, n_trials=4000, seed=0):
        from mlx_vlm_tpu.speculative.utils import rejection_walk

        V = p.shape[-1]
        pt = jnp.asarray(np.tile(p, (1, k + 1, 1)), jnp.float32)  # [1,k+1,V]
        pd = jnp.asarray(np.tile(q, (1, k, 1)), jnp.float32)      # [1,k,V]

        def one(key):
            kd, kw = jax.random.split(key)
            draft = jax.random.categorical(
                kd, jnp.log(pd[0] + 1e-30), axis=-1)[None].astype(jnp.int32)
            out, n_acc = rejection_walk(pt, pd, draft, kw)
            return out[0, 0], out[0, 1], n_acc[0]

        keys = jax.random.split(jax.random.PRNGKey(seed), n_trials)
        t0, t1, n_acc = jax.jit(jax.vmap(one))(keys)
        t0 = np.asarray(t0)
        t1 = np.asarray(t1)
        n_acc = np.asarray(n_acc)
        first = np.bincount(t0, minlength=V) / n_trials
        # second committed token marginal, conditioned on >= 2 committed
        mask = n_acc >= 1
        second = (np.bincount(t1[mask], minlength=V) / max(mask.sum(), 1))
        return first, second, n_acc

    def test_first_token_matches_target(self):
        p = np.asarray([[[0.6, 0.25, 0.1, 0.05]]])
        q = np.asarray([[[0.1, 0.2, 0.3, 0.4]]])  # very different drafter
        first, _, n_acc = self._empirical(p, q, k=3)
        tv = 0.5 * np.abs(first - p[0, 0]).sum()
        assert tv < 0.03, f"TV {tv:.4f}: {first} vs {p[0,0]}"
        # weak drafter: acceptance must be well below 1 (walk is active)
        assert n_acc.mean() < 2.5

    def test_perfect_drafter_accepts_everything(self):
        p = np.asarray([[[0.5, 0.3, 0.15, 0.05]]])
        first, second, n_acc = self._empirical(p, p.copy(), k=3)
        # p_d == p_t: u*p <= p always -> all k drafts accepted
        assert (n_acc == 3).all()
        tv = 0.5 * np.abs(first - p[0, 0]).sum()
        assert tv < 0.03

    def test_second_token_matches_target(self):
        # i.i.d. positions: the second committed token is also ~ p_t
        p = np.asarray([[[0.7, 0.2, 0.08, 0.02]]])
        q = np.asarray([[[0.25, 0.25, 0.25, 0.25]]])
        _, second, _ = self._empirical(p, q, k=3)
        tv = 0.5 * np.abs(second - p[0, 0]).sum()
        assert tv < 0.05, f"TV {tv:.4f}: {second} vs {p[0,0]}"

    def test_one_hot_reduces_to_greedy(self):
        p = np.zeros((1, 1, 4)); p[..., 2] = 1.0
        q = np.zeros((1, 1, 4)); q[..., 1] = 1.0
        first, _, n_acc = self._empirical(p, q, k=2, n_trials=64)
        assert (n_acc == 0).all()          # every draft rejected
        assert first[2] == 1.0             # correction = target argmax

    def test_eagle3_lossless(self, target):
        """EAGLE-style drafter (random weights): output must equal plain
        target greedy regardless of drafter quality."""
        from mlx_vlm_tpu.speculative.drafters.eagle3 import (
            Eagle3Config,
            Eagle3Drafter,
            init_eagle3_params,
        )
        from mlx_vlm_tpu.speculative.utils import SpecStats, eagle3_generate_step

        tc = target.config
        cfg = Eagle3Config(
            hidden_size=tc.hidden_size,
            intermediate_size=tc.intermediate_size,
            num_attention_heads=tc.num_attention_heads,
            num_key_value_heads=tc.num_key_value_heads,
            vocab_size=tc.vocab_size,
            capture_layers=(0, 1, 2),
        )
        drafter = Eagle3Drafter(cfg)
        dparams = init_eagle3_params(cfg, seed=3)
        ids = (np.arange(9, dtype=np.int32) * 5 % 200)[None]
        ref = _plain_greedy(target, ids, 12)
        stats = SpecStats()
        out = [
            int(t[0])
            for t, _ in eagle3_generate_step(
                _embeds(target, ids), target, drafter, dparams,
                max_tokens=12, num_draft=3, stats=stats,
            )
        ]
        assert out == ref, f"{out} != {ref}"
        assert stats.rounds >= 1

    def test_drafter_kind_resolution(self):
        from mlx_vlm_tpu.speculative.drafters import resolve_drafter_kind

        assert resolve_drafter_kind("eagle3") == "eagle3"
        assert resolve_drafter_kind("llama") == "vanilla"

    def test_compat_validation(self, target):
        from mlx_vlm_tpu.speculative.utils import validate_drafter_compatibility

        cfg = tiny_llama_config(vocab_size=128)
        bad = load_model_from_weights(cfg, llama_hf_weights(cfg, 0), jnp.float32)
        with pytest.raises(ValueError):
            validate_drafter_compatibility(target, bad)


class TestMTPDrafter:
    def test_mtp_lossless(self, target):
        """MTP drafter with shared embed/lm_head: output equals plain target
        greedy regardless of drafter quality (greedy verify)."""
        from mlx_vlm_tpu.speculative.drafters.mtp import (
            MTPConfig, MTPDrafter, init_mtp_params,
        )
        from mlx_vlm_tpu.speculative.utils import SpecStats, eagle3_generate_step

        tc = target.config
        cfg = MTPConfig(
            hidden_size=tc.hidden_size,
            intermediate_size=tc.intermediate_size,
            num_attention_heads=tc.num_attention_heads,
            num_key_value_heads=tc.num_key_value_heads,
            vocab_size=tc.vocab_size,
        )
        drafter = MTPDrafter(cfg)
        shared = target.params["language_model"]["model"]["embed_tokens"][
            "weight"]
        dparams = init_mtp_params(cfg, seed=5, shared_embed=shared,
                                  shared_lm_head=shared)
        ids = (np.arange(9, dtype=np.int32) * 5 % 200)[None]
        ref = _plain_greedy(target, ids, 12)
        stats = SpecStats()
        out = [
            int(t[0])
            for t, _ in eagle3_generate_step(
                _embeds(target, ids), target, drafter, dparams,
                max_tokens=12, num_draft=3, stats=stats,
            )
        ]
        assert out == ref
        assert stats.rounds > 0


class TestDispatchWiring:
    def test_stream_generate_draft_model_lossless(self):
        """draft_model= through the public stream_generate matches plain
        greedy — regression for the M-RoPE verify position bug (pos was
        [1,B,k+1], NaN-filling qwen-style mrope gathers)."""
        from mlx_vlm_tpu.generate.dispatch import stream_generate
        from mlx_vlm_tpu.utils.testing import make_tiny_qwen2_vl

        target = make_tiny_qwen2_vl(seed=0, dtype=jnp.float32)
        draft = make_tiny_qwen2_vl(seed=9, dtype=jnp.float32)

        class _Tok:
            eos_token_id = 9999

            def decode(self, ids, **kw):
                return " ".join(str(i) for i in ids)

            def __call__(self, text, **kw):
                ids = [(ord(c) * 7) % 200 for c in str(text)][:12]
                return {"input_ids": np.asarray([ids]),
                        "attention_mask": np.ones((1, len(ids)), np.int64)}

        class _Proc:
            tokenizer = _Tok()

            def __call__(self, text=None, **kw):
                return self.tokenizer(text[0] if isinstance(text, list) else text)

        proc = _Proc()
        plain = "".join(r.text for r in stream_generate(
            target, proc, "quick brown fox", max_tokens=8, temperature=0.0))
        spec = "".join(r.text for r in stream_generate(
            target, proc, "quick brown fox", max_tokens=8, temperature=0.0,
            draft_model=draft, num_draft_tokens=3))
        assert spec == plain

        # temperature>0 is supported via the rejection walk (no guard)
        sampled = list(stream_generate(target, proc, "x", max_tokens=4,
                                       temperature=0.5, draft_model=draft,
                                       seed=9))
        assert len([r for r in sampled if r.text is not None]) >= 1

    def test_mrope_target_lossless(self):
        """speculative_generate_step on an M-RoPE (qwen2_vl) target."""
        from mlx_vlm_tpu.utils.testing import make_tiny_qwen2_vl

        target = make_tiny_qwen2_vl(seed=0, dtype=jnp.float32)
        draft = make_tiny_qwen2_vl(seed=9, dtype=jnp.float32)
        ids = (np.arange(8, dtype=np.int32) * 3 % 200)[None]
        e = jax.jit(target.get_input_embeddings)(target.params,
                                                 jnp.asarray(ids))
        plain = [int(t[0]) for t, _ in generate_step(e, target, max_tokens=8)]
        spec = [int(t[0]) for t, _ in speculative_generate_step(
            e, target, draft, input_ids=ids, max_tokens=8, num_draft=3)]
        assert spec == plain


class TestDrafterLoading:
    def test_load_mtp_drafter_shares_target_head(self, target, tmp_path):
        """load_drafter reads a checkpoint dir and pairs with the target;
        missing embed/lm_head are shared; losslessness holds end to end."""
        import json

        from safetensors.numpy import save_file

        from mlx_vlm_tpu.speculative.drafters import load_drafter
        from mlx_vlm_tpu.speculative.drafters.mtp import (
            MTPConfig, init_mtp_params,
        )
        from mlx_vlm_tpu.speculative.utils import eagle3_generate_step

        tc = target.config
        cfg = dict(
            model_type="qwen3_5_mtp",
            hidden_size=tc.hidden_size,
            intermediate_size=tc.intermediate_size,
            num_attention_heads=tc.num_attention_heads,
            num_key_value_heads=tc.num_key_value_heads,
            vocab_size=tc.vocab_size,
        )
        d = tmp_path / "drafter"
        d.mkdir()
        (d / "config.json").write_text(json.dumps(cfg))
        params = init_mtp_params(
            MTPConfig(**{k: v for k, v in cfg.items() if k != "model_type"}),
            seed=2,
        )
        flat = {}

        def walk(tree, prefix=""):
            for k, v in tree.items():
                if isinstance(v, dict):
                    walk(v, prefix + k + ".")
                else:
                    flat[prefix + k] = np.asarray(v)

        walk({k: v for k, v in params.items()
              if k not in ("embed_tokens", "lm_head")})
        save_file(flat, str(d / "model.safetensors"))

        drafter, dparams, kind = load_drafter(d, target)
        assert kind == "mtp"
        assert "embed_tokens" in dparams and "lm_head" in dparams
        ids = (np.arange(9, dtype=np.int32) * 5 % 200)[None]
        ref = _plain_greedy(target, ids, 10)
        out = [
            int(t[0]) for t, _ in eagle3_generate_step(
                _embeds(target, ids), target, drafter, dparams,
                max_tokens=10, num_draft=3,
            )
        ]
        assert out == ref

    def test_incompatible_hidden_size_rejected(self, target, tmp_path):
        import json

        from mlx_vlm_tpu.speculative.drafters import load_drafter

        d = tmp_path / "bad"
        d.mkdir()
        (d / "config.json").write_text(json.dumps(
            {"model_type": "qwen3_5_mtp", "hidden_size": 9999}))
        with pytest.raises(ValueError, match="hidden_size"):
            load_drafter(d, target)
