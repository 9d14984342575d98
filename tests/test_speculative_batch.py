"""Batched (server-grade) speculative decoding.

Reference parity: mlx_vlm/generate/ar.py:1342 SpeculativeGenerationBatch +
speculative/utils.py:118 run_speculative_server_rounds — concurrent
requests advance through shared draft/verify rounds, greedy rows must
reproduce the plain continuous-batching output exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.batch import (
    BatchGenerator,
    BatchRequest,
    SamplingParams,
)
from mlx_vlm_tpu.speculative.batch import SpeculativeBatchGenerator
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from mlx_vlm_tpu.utils.testing import llama_hf_weights, tiny_llama_config


@pytest.fixture(scope="module")
def target():
    cfg = tiny_llama_config(num_hidden_layers=3)
    return load_model_from_weights(cfg, llama_hf_weights(cfg, seed=1),
                                   jnp.float32)


@pytest.fixture(scope="module")
def drafter_same(target):
    cfg = tiny_llama_config(num_hidden_layers=3)
    return load_model_from_weights(cfg, llama_hf_weights(cfg, seed=1),
                                   jnp.float32)


@pytest.fixture(scope="module")
def drafter_diff():
    cfg = tiny_llama_config(num_hidden_layers=2)
    return load_model_from_weights(cfg, llama_hf_weights(cfg, seed=7),
                                   jnp.float32)


def _embeds(model, ids):
    return jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))


def _req(model, ids, uid, max_tokens=8, **sampling):
    return BatchRequest(
        uid=uid,
        inputs_embeds=_embeds(model, ids),
        max_tokens=max_tokens,
        input_ids=np.asarray(ids),
        sampling=SamplingParams(**sampling),
    )


def _drain(gen, uids, limit=200):
    outs = {u: [] for u in uids}
    for _ in range(limit):
        if not (gen.num_active or gen.queue):
            break
        for uid, toks in gen.next().items():
            outs[uid].extend(t for t, _ in toks)
    return outs


def _plain(model, prompts, max_tokens):
    gen = BatchGenerator(model, num_slots=4, capacity=256, block_size=2,
                         dtype=jnp.float32)
    for uid, p in enumerate(prompts):
        gen.insert(_req(model, p, uid, max_tokens))
    return _drain(gen, range(len(prompts)))


PROMPTS = [
    (np.arange(9, dtype=np.int32) * 5 % 200)[None],
    (np.arange(14, dtype=np.int32) * 3 % 200)[None],
    (np.arange(5, dtype=np.int32) * 11 % 200)[None],
]


class TestSpeculativeBatch:
    def test_greedy_matches_plain_batch(self, target, drafter_diff):
        """Concurrent greedy rows reproduce plain batching exactly."""
        max_tokens = 8
        expected = _plain(target, PROMPTS, max_tokens)
        gen = SpeculativeBatchGenerator(
            target, drafter_diff, num_draft=3, num_slots=4, capacity=256,
            dtype=jnp.float32,
        )
        for uid, p in enumerate(PROMPTS):
            gen.insert(_req(target, p, uid, max_tokens))
        outs = _drain(gen, range(len(PROMPTS)))
        for uid in range(len(PROMPTS)):
            assert outs[uid] == expected[uid], (
                f"row {uid}: {outs[uid]} != {expected[uid]}"
            )

    def test_perfect_drafter_accepts(self, target, drafter_same):
        """Drafter == target: greedy rounds accept every draft token."""
        max_tokens = 9
        expected = _plain(target, PROMPTS[:2], max_tokens)
        gen = SpeculativeBatchGenerator(
            target, drafter_same, num_draft=3, num_slots=4, capacity=256,
            dtype=jnp.float32,
        )
        for uid, p in enumerate(PROMPTS[:2]):
            gen.insert(_req(target, p, uid, max_tokens))
        outs = _drain(gen, range(2))
        for uid in range(2):
            assert outs[uid] == expected[uid]
        assert gen.stats.rounds > 0
        # perfect drafter: every draft accepted in every (pre-EOS) round
        assert gen.stats.accepted / gen.stats.rounds >= 1.0
        assert gen.stats.acceptance_rate > 0.9

    def test_late_insert_nonblocking(self, target, drafter_diff):
        """A row admitted mid-flight joins rounds without disturbing the
        in-flight row (reference: speculation must not block the batch)."""
        p1, p2 = PROMPTS[0], PROMPTS[1]
        expected = _plain(target, [p1, p2], 8)
        gen = SpeculativeBatchGenerator(
            target, drafter_diff, num_draft=3, num_slots=2, capacity=256,
            dtype=jnp.float32,
        )
        gen.insert(_req(target, p1, 0, 8))
        outs = {0: [], 1: []}
        for uid, toks in gen.next().items():   # admit + one round for row 0
            outs[uid].extend(t for t, _ in toks)
        gen.insert(_req(target, p2, 1, 8))
        for _ in range(100):
            if not (gen.num_active or gen.queue):
                break
            for uid, toks in gen.next().items():
                outs[uid].extend(t for t, _ in toks)
        assert outs[0] == expected[0]
        assert outs[1] == expected[1]

    def test_mixed_temperature_rows(self, target, drafter_diff):
        """temp>0 rows ride the rejection walk; greedy rows in the same
        batch still match plain greedy exactly."""
        max_tokens = 8
        expected = _plain(target, [PROMPTS[0]], max_tokens)
        gen = SpeculativeBatchGenerator(
            target, drafter_diff, num_draft=3, num_slots=4, capacity=256,
            dtype=jnp.float32,
        )
        gen.insert(_req(target, PROMPTS[0], 0, max_tokens))            # greedy
        gen.insert(_req(target, PROMPTS[1], 1, max_tokens, temp=0.8,
                        top_p=0.95))                                   # sampled
        outs = _drain(gen, range(2))
        assert outs[0] == expected[0], "greedy row must be exact"
        assert len(outs[1]) == max_tokens
        V = target.language_model.args.vocab_size
        assert all(0 <= t < V for t in outs[1])

    def test_requires_input_ids(self, target, drafter_diff):
        gen = SpeculativeBatchGenerator(
            target, drafter_diff, num_draft=3, num_slots=2, capacity=256,
            dtype=jnp.float32,
        )
        gen.insert(BatchRequest(
            uid=0, inputs_embeds=_embeds(target, PROMPTS[0]), max_tokens=4))
        with pytest.raises(ValueError, match="input_ids"):
            gen.next()
