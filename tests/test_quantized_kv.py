import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step, make_cache
from mlx_vlm_tpu.utils.testing import make_tiny_qwen2_vl


@pytest.fixture(scope="module")
def model():
    return make_tiny_qwen2_vl(seed=5, dtype=jnp.float32)


def _embeds(model, ids):
    return jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))


class TestQuantizedKVCache:
    def test_8bit_logits_close_to_fp(self, model):
        S = 10
        ids = (np.arange(S, dtype=np.int32) * 7 % 200)[None]
        embeds = _embeds(model, ids)
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S))

        cache_fp = make_cache(model, 1, 16, jnp.float32)
        ref, _ = model(model.params, embeds, cache_fp, jnp.asarray(pos))

        cache_q = make_cache(model, 1, 16, jnp.float32, kv_bits=8, kv_group_size=16)
        out, new_cache = model(model.params, embeds, cache_q, jnp.asarray(pos))
        assert int(new_cache.offset) == S
        err = np.abs(np.asarray(ref) - np.asarray(out)).max()
        assert err < 0.05, f"8-bit KV error too large: {err}"

    def test_4bit_runs_and_is_close(self, model):
        S = 8
        ids = (np.arange(S, dtype=np.int32) % 200)[None]
        embeds = _embeds(model, ids)
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, 1, S))
        cache_fp = make_cache(model, 1, 16, jnp.float32)
        ref, _ = model(model.params, embeds, cache_fp, jnp.asarray(pos))
        cache_q = make_cache(model, 1, 16, jnp.float32, kv_bits=4, kv_group_size=16)
        out, _ = model(model.params, embeds, cache_q, jnp.asarray(pos))
        err = np.abs(np.asarray(ref) - np.asarray(out)).max()
        assert err < 0.5, f"4-bit KV error too large: {err}"

    def test_generate_step_with_quantized_kv(self, model):
        ids = (np.arange(12, dtype=np.int32) % 200)[None]
        embeds = _embeds(model, ids)
        ref = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=6)]
        q8 = [
            int(t[0])
            for t, _ in generate_step(
                embeds, model, max_tokens=6, kv_bits=8, kv_group_size=16
            )
        ]
        assert len(q8) == 6
        # 8-bit KV should rarely flip greedy tokens on a tiny model
        assert sum(a == b for a, b in zip(ref, q8)) >= 4

    def test_batch_with_quantized_kv(self, model):
        from mlx_vlm_tpu.generate.batch import BatchGenerator, BatchRequest

        p = (np.arange(7, dtype=np.int32) % 200)[None]
        gen = BatchGenerator(
            model, num_slots=2, capacity=256, block_size=2,
            dtype=jnp.float32, kv_bits=8, kv_group_size=16,
        )
        gen.insert(BatchRequest(uid=0, inputs_embeds=_embeds(model, p), max_tokens=5))
        outs = []
        for _ in range(50):
            if not (gen.num_active or gen.queue):
                break
            for uid, toks in gen.next().items():
                outs.extend(t for t, _ in toks)
        assert len(outs) == 5


class TestQuantizedKVWithSoftcapFamilies:
    """kv_bits must work for families whose attend passes window /
    logit_softcap kwargs (gemma3 etc.) — regression for the attend
    signature mismatch."""

    def test_gemma3_generate_step_with_kv_bits(self):
        from mlx_vlm_tpu.utils.testing import make_tiny_gemma3

        m = make_tiny_gemma3(seed=3, dtype=jnp.float32)
        ids = np.arange(6, dtype=np.int32)[None] % 50
        embeds = jax.jit(m.get_input_embeddings)(m.params, jnp.asarray(ids))
        ref = [int(t[0]) for t, _ in generate_step(embeds, m, max_tokens=4)]
        got = [
            int(t[0])
            for t, _ in generate_step(
                embeds, m, max_tokens=4, kv_bits=8, kv_group_size=8
            )
        ]
        assert got == ref


class TestBatchQuantizedKV:
    """Server-path quantized KV (reference BatchQuantizedKVCache
    cache.py:1646 / BatchTurboQuantKVCache turboquant.py:6110): the
    continuous-batching generator with kv_bits must track the bf16 path."""

    def _batch_tokens(self, model, prompts, max_tokens, **kw):
        from mlx_vlm_tpu.generate.batch import BatchGenerator, BatchRequest

        gen = BatchGenerator(model, num_slots=4, capacity=256, block_size=2,
                             dtype=jnp.float32, **kw)
        for uid, p in enumerate(prompts):
            gen.insert(BatchRequest(uid=uid, inputs_embeds=_embeds(model, p),
                                    max_tokens=max_tokens))
        outs = {u: [] for u in range(len(prompts))}
        for _ in range(200):
            if not (gen.num_active or gen.queue):
                break
            for uid, toks in gen.next().items():
                outs[uid].extend(t for t, _ in toks)
        assert type(gen.cache).__name__ == {
            8: "Int8KVCache", 4: "Int4KVCache", None: "BatchKVCache",
        }[kw.get("kv_bits")]
        assert gen.cache.offset.ndim == 1  # per-row cursors
        return outs

    @pytest.mark.parametrize("bits", [8, 4])
    def test_batch_kv_bits_tracks_bf16(self, model, bits):
        prompts = [
            (np.arange(9, dtype=np.int32) * 5 % 200)[None],
            (np.arange(14, dtype=np.int32) * 3 % 200)[None],
            (np.arange(5, dtype=np.int32) * 11 % 200)[None],
        ]
        max_tokens = 6
        ref = self._batch_tokens(model, prompts, max_tokens, kv_bits=None)
        got = self._batch_tokens(model, prompts, max_tokens, kv_bits=bits)
        total = agree = 0
        for uid in ref:
            assert len(got[uid]) == max_tokens
            for a, b in zip(ref[uid], got[uid]):
                total += 1
                agree += a == b
        # 8-bit KV should rarely flip greedy tokens on a tiny random
        # model; 4-bit legitimately flips near-tied logits more often
        # (its logit-level tolerance is covered by test_int4_kv.py) —
        # require majority agreement there
        floor = total - 2 if bits == 8 else total // 2
        assert agree >= floor, f"{agree}/{total} tokens agree"

    @pytest.mark.parametrize("bits", [8, 4])
    def test_batch_kv_bits_matches_single_stream_same_bits(self, model,
                                                           bits):
        """Exact self-consistency: batched rows (per-row fused/XLA paths)
        must reproduce the single-stream quantized path token-for-token."""
        from mlx_vlm_tpu.generate.ar import generate_step

        p = (np.arange(11, dtype=np.int32) * 7 % 200)[None]
        e = _embeds(model, p)
        ref = [int(t[0]) for t, _ in generate_step(
            e, model, max_tokens=6, kv_bits=bits)]
        got = self._batch_tokens(model, [p], 6, kv_bits=bits)[0]
        # batched admission prefillls in blocks and the insert path
        # re-quantizes identically; greedy tokens must agree
        assert got == ref
