import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.generate.batch import (
    BatchGenerator,
    BatchRequest,
    SamplingParams,
)
from mlx_vlm_tpu.utils.testing import make_tiny_qwen2_vl


@pytest.fixture(scope="module")
def model():
    return make_tiny_qwen2_vl(seed=3, dtype=jnp.float32)


def _embeds(model, ids):
    return jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))


def _single_stream_tokens(model, ids, max_tokens):
    e = _embeds(model, ids)
    return [int(t[0]) for t, _ in generate_step(e, model, max_tokens=max_tokens)]


def _drain(gen, uids):
    outs = {u: [] for u in uids}
    for _ in range(200):
        if not (gen.num_active or gen.queue):
            break
        for uid, toks in gen.next().items():
            outs[uid].extend(t for t, _ in toks)
    return outs


class TestBatchGenerator:
    def test_matches_single_stream_greedy(self, model):
        prompts = [
            (np.arange(9, dtype=np.int32) * 5 % 200)[None],
            (np.arange(14, dtype=np.int32) * 3 % 200)[None],
            (np.arange(5, dtype=np.int32) * 11 % 200)[None],
        ]
        max_tokens = 6
        expected = [_single_stream_tokens(model, p, max_tokens) for p in prompts]

        gen = BatchGenerator(model, num_slots=4, capacity=256, block_size=3,
                             dtype=jnp.float32)
        for uid, p in enumerate(prompts):
            gen.insert(BatchRequest(uid=uid, inputs_embeds=_embeds(model, p),
                                    max_tokens=max_tokens))
        outs = _drain(gen, range(len(prompts)))
        for uid, exp in enumerate(expected):
            assert outs[uid] == exp, f"row {uid}: {outs[uid]} != {exp}"

    def test_late_insert(self, model):
        p1 = (np.arange(8, dtype=np.int32) % 200)[None]
        p2 = (np.arange(6, dtype=np.int32) * 7 % 200)[None]
        expected2 = _single_stream_tokens(model, p2, 5)

        gen = BatchGenerator(model, num_slots=2, capacity=256, block_size=2,
                             dtype=jnp.float32)
        gen.insert(BatchRequest(uid="a", inputs_embeds=_embeds(model, p1),
                                max_tokens=10))
        out = {"a": [], "b": []}
        for uid, toks in gen.next().items():
            out[uid].extend(t for t, _ in toks)
        # now a is mid-flight; insert b
        gen.insert(BatchRequest(uid="b", inputs_embeds=_embeds(model, p2),
                                max_tokens=5))
        for _ in range(100):
            if not (gen.num_active or gen.queue):
                break
            for uid, toks in gen.next().items():
                out[uid].extend(t for t, _ in toks)
        assert len(out["a"]) == 10
        assert out["b"] == expected2, "late-inserted row must be unaffected"

    def test_queue_overflow_slots(self, model):
        """More requests than slots: all must finish, in-order per uid."""
        prompts = [(np.arange(4 + i, dtype=np.int32) % 200)[None] for i in range(5)]
        gen = BatchGenerator(model, num_slots=2, capacity=256, block_size=2,
                             dtype=jnp.float32)
        for uid, p in enumerate(prompts):
            gen.insert(BatchRequest(uid=uid, inputs_embeds=_embeds(model, p),
                                    max_tokens=4))
        outs = _drain(gen, range(5))
        for uid in range(5):
            assert len(outs[uid]) == 4

    def test_eos_stops_row(self, model):
        p = (np.arange(6, dtype=np.int32) % 200)[None]
        toks = _single_stream_tokens(model, p, 8)
        eos = toks[2]  # pretend the 3rd generated token is EOS
        gen = BatchGenerator(model, num_slots=2, capacity=256, block_size=2,
                             dtype=jnp.float32)
        gen.insert(BatchRequest(uid=0, inputs_embeds=_embeds(model, p),
                                max_tokens=8, eos_ids=(eos,)))
        outs = _drain(gen, [0])
        assert outs[0][:3] == toks[:3]
        assert outs[0][-1] == eos
        assert len(outs[0]) == 3

    def test_mixed_sampling_params(self, model):
        """A sampled row must not perturb a greedy row in the same batch."""
        p1 = (np.arange(7, dtype=np.int32) % 200)[None]
        p2 = (np.arange(9, dtype=np.int32) * 2 % 200)[None]
        expected1 = _single_stream_tokens(model, p1, 5)
        gen = BatchGenerator(model, num_slots=2, capacity=256, block_size=2,
                             dtype=jnp.float32)
        gen.insert(BatchRequest(uid=0, inputs_embeds=_embeds(model, p1),
                                max_tokens=5))
        gen.insert(BatchRequest(uid=1, inputs_embeds=_embeds(model, p2),
                                max_tokens=5,
                                sampling=SamplingParams(temp=1.0, top_p=0.9)))
        outs = _drain(gen, [0, 1])
        assert outs[0] == expected1
        assert len(outs[1]) == 5


class TestBatchGenerateAPI:
    def test_batch_generate_text(self, model):
        from mlx_vlm_tpu.generate.batch import batch_generate

        class _FakeTok:
            eos_token_id = 999

            def decode(self, ids, **kw):
                return " ".join(str(i) for i in ids)

            def __call__(self, text, **kw):
                ids = [int(x) % 200 for x in str(text).split()]
                return {"input_ids": np.asarray([ids]),
                        "attention_mask": np.ones((1, len(ids)), np.int64)}

        class _FakeProc:
            tokenizer = _FakeTok()

            def __call__(self, text=None, images=None, videos=None, **kw):
                return self.tokenizer(text[0] if isinstance(text, list) else text)

        res = batch_generate(
            model, _FakeProc(), ["1 2 3 4", "5 6 7"], max_tokens=4,
            num_slots=2, capacity=256,
        )
        assert len(res.texts) == 2
        assert res.stats["generation_tokens"] == 8


class TestChunkedBatchedAdmission:
    def test_mixed_long_prompts_match_single_stream(self, model):
        """Prompts longer than prefill_step admit in ONE chunked batched
        prefill (round-1 fell back to serial admission) and the outputs
        still equal single-stream greedy decoding."""
        prompts = [
            (np.arange(100, dtype=np.int32) * 5 % 200)[None],
            (np.arange(73, dtype=np.int32) * 3 % 200)[None],
        ]
        max_tokens = 5
        expected = [_single_stream_tokens(model, p, max_tokens)
                    for p in prompts]
        gen = BatchGenerator(model, num_slots=4, capacity=512, block_size=3,
                             prefill_step_size=64, dtype=jnp.float32)
        for uid, p in enumerate(prompts):
            gen.insert(BatchRequest(uid=uid,
                                    inputs_embeds=_embeds(model, p),
                                    max_tokens=max_tokens))
        outs = _drain(gen, range(len(prompts)))
        for uid, exp in enumerate(expected):
            assert outs[uid] == exp, f"row {uid}: {outs[uid]} != {exp}"
