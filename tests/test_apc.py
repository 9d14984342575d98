import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.apc import (
    APCManager,
    adjust_prefix_to_media_boundary,
    media_token_spans,
    semantic_extra_hash,
)
from mlx_vlm_tpu.generate.ar import generate_step, make_cache
from mlx_vlm_tpu.utils.testing import make_tiny_qwen2_vl


@pytest.fixture(scope="module")
def model():
    return make_tiny_qwen2_vl(seed=9, dtype=jnp.float32)


def _embeds(model, ids):
    return jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))


class TestHashingAndRules:
    def test_media_spans(self):
        toks = [1, 5, 5, 2, 5, 3]
        assert media_token_spans(toks, [5]) == [(1, 3), (4, 5)]

    def test_boundary_adjustment(self):
        toks = [1, 5, 5, 5, 2]
        assert adjust_prefix_to_media_boundary(2, toks, [5]) == 1
        assert adjust_prefix_to_media_boundary(4, toks, [5]) == 4

    def test_semantic_hash_differs_by_image(self):
        a = semantic_extra_hash("m", [np.zeros((4, 4))])
        b = semantic_extra_hash("m", [np.ones((4, 4))])
        assert a != b
        assert semantic_extra_hash("m", [np.zeros((4, 4))]) == a


class TestBlockPool:
    def test_commit_and_lookup(self, model):
        apc = APCManager(num_blocks=64, block_size=4)
        tokens = list(range(20))
        cache = make_cache(model, 1, 32, jnp.float32)
        # fill cache with recognizable values
        import dataclasses

        k = cache.k.at[:, 0, :, :20, :].set(1.5)
        cache = dataclasses.replace(cache, k=k, offset=jnp.asarray(20, jnp.int32))
        stored = apc.commit(tokens, cache)
        assert stored == 5
        prefix, blocks = apc.lookup(tokens)
        # full match limited to < len(tokens): 16 tokens (leaves 4 to prefill)
        assert prefix == 16
        assert len(blocks) == 4
        # different extra hash -> no match
        p2, _ = apc.lookup(tokens, extra="other")
        assert p2 == 0
        # partial prefix
        p3, _ = apc.lookup(tokens[:9] + [99, 98, 97])
        assert p3 == 8

    def test_eviction(self, model):
        apc = APCManager(num_blocks=3, block_size=2)
        cache = make_cache(model, 1, 16, jnp.float32)
        import dataclasses

        cache = dataclasses.replace(cache, offset=jnp.asarray(8, jnp.int32))
        apc.commit([1, 2, 3, 4], cache)
        apc.commit([9, 10, 11, 12], cache)
        assert len(apc.blocks) == 3  # 4th insert evicted one
        assert apc.stats.evictions >= 1

    def test_stats_snapshot(self, model):
        apc = APCManager(num_blocks=8, block_size=2)
        apc.lookup([1, 2, 3])
        snap = apc.snapshot()
        assert snap["lookups"] == 1 and snap["enabled"]


class TestDiskTier:
    def test_restart_survival(self, model, tmp_path):
        """Blocks written by one manager must be found by a fresh one."""
        import dataclasses

        from mlx_vlm_tpu.apc import DiskBlockStore

        tokens = list(range(12))
        cache = make_cache(model, 1, 32, jnp.float32)
        cache = dataclasses.replace(
            cache,
            k=cache.k.at[:, 0, :, :12, :].set(2.25),
            offset=jnp.asarray(12, jnp.int32),
        )
        disk1 = DiskBlockStore(str(tmp_path / "apc"), max_bytes=10**9)
        apc1 = APCManager(num_blocks=64, block_size=4, disk_store=disk1)
        apc1.commit(tokens, cache)
        disk1.flush()
        assert disk1.stats()["disk_blocks"] == 3

        # "restart": new manager, empty RAM pool, same directory
        disk2 = DiskBlockStore(str(tmp_path / "apc"), max_bytes=10**9)
        apc2 = APCManager(num_blocks=64, block_size=4, disk_store=disk2)
        prefix, blocks = apc2.lookup(tokens)
        assert prefix == 8  # 2 blocks (3rd leaves <1 token margin rule)
        assert np.asarray(blocks[0].k).max() == 2.25
        assert disk2.loads >= 2

    def test_byte_budget_eviction(self, model, tmp_path):
        import dataclasses

        from mlx_vlm_tpu.apc import DiskBlockStore

        cache = make_cache(model, 1, 64, jnp.float32)
        cache = dataclasses.replace(cache, offset=jnp.asarray(64, jnp.int32))
        # each block file is ~L*H*bs*D floats; set budget to ~2 blocks
        one = 2 * 2 * 4 * 16 * 4 * 2  # L*H*bs*D * 4B * (k+v)
        disk = DiskBlockStore(str(tmp_path / "apc2"), max_bytes=int(one * 2.5))
        apc = APCManager(num_blocks=256, block_size=4, disk_store=disk)
        apc.commit(list(range(64)), cache)
        disk.flush()
        assert disk.stats()["disk_bytes"] <= one * 2.5 + 1024


class TestExactMode:
    def test_mla_snapshot_restore(self):
        """Exact snapshots restore MLA latent caches (block mode rejects
        them); warm generation matches cold."""
        from tests.test_deepseek_v2 import tiny_dsv2_config, tiny_dsv2_weights
        from mlx_vlm_tpu.utils.loader import load_model_from_weights

        cfg = tiny_dsv2_config()
        dsm = load_model_from_weights(cfg, tiny_dsv2_weights(cfg), jnp.float32)
        apc = APCManager(num_blocks=64, block_size=4)
        S = 12
        ids = (np.arange(S, dtype=np.int32) * 3 % 200)[None]
        tokens = ids[0].tolist()
        embeds = jax.jit(dsm.get_input_embeddings)(dsm.params, jnp.asarray(ids))

        # block-mode commit must cleanly reject the MLA cache type
        cache = dsm.language_model.init_cache(1, 64, jnp.float32)
        assert apc.commit(tokens, cache) == 0
        assert apc.stats.rejects.get("cache_type", 0) == 1

        prefix = 8
        cold = [
            int(t[0])
            for t, _ in generate_step(
                embeds, dsm, max_tokens=5,
                prompt_cache_callback=lambda c: apc.store_exact(
                    tokens[:prefix],
                    __import__("dataclasses").replace(
                        c, offset=jnp.asarray(prefix, jnp.int32)
                    ),
                ),
            )
        ]
        n, warm_cache = apc.lookup_exact(tokens)
        assert n == prefix and warm_cache is not None
        warm = [
            int(t[0])
            for t, _ in generate_step(
                embeds, dsm, max_tokens=5,
                prompt_cache=warm_cache, prefix_len=n,
            )
        ]
        assert warm == cold, f"{warm} != {cold}"


class TestAdapterRegistry:
    """Capability classification + exact-mode reuse for hybrid families
    (reference apc_adapters.py resolve_capability, apc.py
    model_apc_mode:4098)."""

    def test_cache_capability_classes(self, model):
        from mlx_vlm_tpu.apc_adapters import cache_capability
        from mlx_vlm_tpu.core import cache as cl

        kv = make_cache(model, 1, 32, jnp.float32)
        assert cache_capability(kv) == "block"
        i4 = cl.init_int4_cache(2, 1, 2, 16, 128)
        assert cache_capability(i4) == "exact"
        # composite: weakest child wins; unknown objects disable APC
        assert cache_capability((kv, i4)) == "exact"
        assert cache_capability((kv, object())) is None
        assert cache_capability(object()) is None

    def test_model_apc_mode(self, model):
        from mlx_vlm_tpu.apc_adapters import model_apc_mode

        assert model_apc_mode(model) == "block"
        # quantized-KV policy demotes the same model to exact snapshots
        assert model_apc_mode(model, kv_bits=8) == "exact"

    def test_hybrid_model_classifies_exact(self):
        from tests.test_qwen3_next import tiny_next_config, tiny_next_weights
        from mlx_vlm_tpu.apc_adapters import cache_capability, model_apc_mode
        from mlx_vlm_tpu.utils.loader import load_model_from_weights

        cfg = tiny_next_config()
        m = load_model_from_weights(cfg, tiny_next_weights(cfg), jnp.float32)
        cache = m.language_model.init_cache(1, 64, jnp.float32)
        assert cache_capability(cache) == "exact"  # conv/state slots
        assert model_apc_mode(m) == "exact"

    def test_hybrid_warm_matches_cold_with_guard(self):
        """qwen3_next exact-mode round trip: request A stores a guarded
        whole-prefix snapshot; request B sharing A's prompt as a prefix
        restores it and must decode token-identically to a cold run."""
        from tests.test_qwen3_next import tiny_next_config, tiny_next_weights
        from mlx_vlm_tpu.apc import APCManager
        from mlx_vlm_tpu.utils.loader import load_model_from_weights

        cfg = tiny_next_config()
        m = load_model_from_weights(cfg, tiny_next_weights(cfg), jnp.float32)
        apc = APCManager(num_blocks=64, block_size=4)

        SA = 12
        ids_a = (np.arange(SA, dtype=np.int32) * 7 % 200)[None]
        tokens_a = ids_a[0].tolist()
        embeds_a = _embeds(m, ids_a)
        list(generate_step(
            embeds_a, m, max_tokens=2,
            prompt_cache_callback=lambda c: apc.store_exact(
                tokens_a, c, capacity=int(c.k.shape[3])),
        ))

        SB = SA + 8
        ids_b = np.concatenate(
            [ids_a, (np.arange(8, dtype=np.int32) * 11 % 200 + 1)[None]],
            axis=1)
        tokens_b = ids_b[0].tolist()
        embeds_b = _embeds(m, ids_b)
        cold = [int(t[0]) for t, _ in generate_step(embeds_b, m, max_tokens=6)]

        guard = 4
        n, warm_cache = apc.lookup_exact(
            tokens_b, max_prefix_tokens=SB - guard, min_capacity=32)
        assert n == SA and warm_cache is not None
        assert int(warm_cache.offset) == SA
        warm = [
            int(t[0])
            for t, _ in generate_step(
                embeds_b, m, max_tokens=6,
                prompt_cache=warm_cache, prefix_len=n,
            )
        ]
        assert warm == cold, f"warm {warm} != cold {cold}"

        # prefix-guard: a lookup whose guard window swallows the stored
        # prefix must miss (at least `guard` suffix tokens re-prefill)
        n2, _ = apc.lookup_exact(tokens_b, max_prefix_tokens=SA - 1)
        assert n2 == 0
        # capacity guard: snapshots too small for the continuation lose
        n3, _ = apc.lookup_exact(
            tokens_b, max_prefix_tokens=SB - guard, min_capacity=1 << 20)
        assert n3 == 0
        assert apc.stats.rejects.get("exact_capacity", 0) >= 1


class TestWarmCacheCorrectness:
    def test_warm_prefill_matches_cold(self, model):
        """Generation from an APC-warmed cache must equal cold generation."""
        from mlx_vlm_tpu.apc import APCManager

        apc = APCManager(num_blocks=64, block_size=4)
        S = 14
        ids = (np.arange(S, dtype=np.int32) * 13 % 200)[None]
        tokens = ids[0].tolist()
        embeds = _embeds(model, ids)

        # harvest inside the callback — the cache buffers are donated to the
        # decode program right after prefill
        cold = [
            int(t[0])
            for t, _ in generate_step(
                embeds, model, max_tokens=6,
                prompt_cache_callback=lambda c: apc.commit(tokens, c, upto=S),
            )
        ]

        prefix, blocks = apc.lookup(tokens)
        assert prefix == 12  # 3 blocks of 4 (leaves >=1 token)
        warm_cache = apc.make_warm_cache(blocks, model, 256, jnp.float32)
        assert int(warm_cache.offset) == prefix
        warm = [
            int(t[0])
            for t, _ in generate_step(
                embeds, model, max_tokens=6,
                prompt_cache=warm_cache, prefix_len=prefix,
            )
        ]
        assert warm == cold, f"warm {warm} != cold {cold}"

    def test_batch_warm_admission_matches_cold(self, model):
        """BatchGenerator APC warm rows must decode identically to cold."""
        from mlx_vlm_tpu.generate.batch import BatchGenerator, BatchRequest

        apc = APCManager(num_blocks=64, block_size=4)
        S = 13
        ids = (np.arange(S, dtype=np.int32) * 3 % 200)[None]
        tokens = ids[0].tolist()
        embeds = _embeds(model, ids)

        def run(warm):
            gen = BatchGenerator(model, num_slots=2, capacity=256,
                                 block_size=2, dtype=jnp.float32)
            kwargs = {}
            if warm:
                prefix, blocks = apc.lookup(tokens)
                assert prefix == 12
                kwargs["prompt_cache"] = apc.make_warm_cache(
                    blocks, model, 256, jnp.float32
                )
                kwargs["prefix_len"] = prefix
            else:
                kwargs["prompt_cache_callback"] = (
                    lambda c: apc.commit(tokens, c, upto=S)
                )
            gen.insert(BatchRequest(uid=0, inputs_embeds=embeds, max_tokens=6,
                                    **kwargs))
            out = []
            for _ in range(50):
                if not (gen.num_active or gen.queue):
                    break
                for uid, toks in gen.next().items():
                    out.extend(t for t, _ in toks)
            return out

        cold = run(False)
        warm = run(True)
        assert warm == cold

    def test_stream_generate_with_apc(self, model):
        """Second identical call must hit the APC and produce the same text."""
        from mlx_vlm_tpu.apc import APCManager
        from mlx_vlm_tpu.generate.dispatch import stream_generate

        class _FakeTok:
            eos_token_id = 9999

            def decode(self, ids, **kw):
                return "".join(chr(97 + (i % 26)) for i in ids)

            def __call__(self, text, **kw):
                ids = [(ord(c) * 7) % 200 for c in str(text)][:24]
                return {"input_ids": np.asarray([ids]),
                        "attention_mask": np.ones((1, len(ids)), np.int64)}

        class _Proc:
            tokenizer = _FakeTok()

            def __call__(self, text=None, images=None, videos=None, **kw):
                return self.tokenizer(text[0] if isinstance(text, list) else text)

        apc = APCManager(num_blocks=64, block_size=4)
        proc = _Proc()
        prompt = "the quick brown fox jumps over it"
        out1 = "".join(
            r.text for r in stream_generate(model, proc, prompt, max_tokens=5, apc=apc)
        )
        assert apc.stats.stores > 0
        out2 = "".join(
            r.text for r in stream_generate(model, proc, prompt, max_tokens=5, apc=apc)
        )
        assert apc.stats.hits >= 1
        assert out1 == out2


class TestRefCounting:
    def test_pinned_blocks_survive_eviction(self):
        from mlx_vlm_tpu.apc import APCManager

        apc = APCManager(num_blocks=2, block_size=4)
        tokens_a = list(range(8))

        class FakeCache:
            k = np.zeros((1, 1, 2, 16, 4), np.float32)
            v = np.zeros((1, 1, 2, 16, 4), np.float32)

        FakeCache.__name__ = "KVCache"
        apc.commit(tokens_a, FakeCache(), upto=8)
        assert len(apc.blocks) == 2
        prefix, blocks = apc.lookup(tokens_a + [99])
        assert prefix == 8 and all(b.refs == 1 for b in blocks)
        # pool is full and everything is pinned: inserts over-fill rather
        # than evicting an in-flight block
        apc.commit(list(range(100, 108)), FakeCache(), upto=8)
        assert all(b.hash in apc.blocks for b in blocks)
        apc.release(blocks)
        assert all(b.refs == 0 for b in blocks)
        # now eviction can reclaim
        apc.commit(list(range(200, 208)), FakeCache(), upto=8)
        assert len(apc.blocks) <= 5


class TestExactLookupIndex:
    def test_longest_snapshot_wins(self):
        import jax.numpy as jnp

        from mlx_vlm_tpu.apc import APCManager

        apc = APCManager(num_blocks=16, block_size=4)
        snap_small = {"offset": jnp.asarray(4)}
        snap_big = {"offset": jnp.asarray(8)}
        apc.store_exact(list(range(4)), snap_small)
        apc.store_exact(list(range(8)), snap_big)
        n, cache = apc.lookup_exact(list(range(10)))
        assert n == 8
        assert int(cache["offset"]) == 8
        # no match on diverging tokens
        n, cache = apc.lookup_exact([5, 5, 5])
        assert n == 0 and cache is None


class TestShardedDiskStore:
    """Layer-major shard tier: byte-range reads, restart survival, segment
    fast path, free-RAM guard, text-only-suffix rule (VERDICT r02 item 9)."""

    def _cache(self, model, fill, n=32):
        import dataclasses

        cache = make_cache(model, 1, n, jnp.float32)
        return dataclasses.replace(
            cache,
            k=cache.k.at[:, 0, :, :n, :].set(fill),
            v=cache.v.at[:, 0, :, :n, :].set(-fill),
            offset=jnp.asarray(n, jnp.int32),
        )

    def test_restart_survival_sharded(self, model, tmp_path):
        from mlx_vlm_tpu.apc import ShardedDiskStore

        tokens = list(range(12))
        cache = self._cache(model, 2.25, 32)
        disk1 = ShardedDiskStore(str(tmp_path / "s1"), max_bytes=10**9)
        apc1 = APCManager(num_blocks=64, block_size=4, disk_store=disk1)
        apc1.commit(tokens, cache)
        disk1.flush()
        assert disk1.stats()["disk_blocks"] == 3
        assert disk1.stats()["disk_shards"] == 1  # all records in ONE file

        disk2 = ShardedDiskStore(str(tmp_path / "s1"), max_bytes=10**9)
        apc2 = APCManager(num_blocks=64, block_size=4, disk_store=disk2)
        prefix, blocks = apc2.lookup(tokens)
        assert prefix == 8
        assert np.asarray(blocks[0].k).max() == 2.25
        assert np.asarray(blocks[0].v).min() == -2.25
        apc2.release(blocks)

    def test_load_prefix_segments(self, model, tmp_path):
        """Chain-ordered blocks restore via contiguous range reads."""
        from mlx_vlm_tpu.apc import ShardedDiskStore, _hash

        tokens = list(range(16))
        cache = self._cache(model, 1.5, 32)
        disk = ShardedDiskStore(str(tmp_path / "s2"), max_bytes=10**9)
        apc = APCManager(num_blocks=64, block_size=4, disk_store=disk)
        apc.commit(tokens, cache)
        disk.flush()

        hashes, parent = [], None
        for b in range(4):
            h = _hash(parent, tuple(tokens[b * 4:(b + 1) * 4]), "")
            hashes.append(h)
            parent = h
        out = disk.load_prefix(hashes)
        assert out is not None
        k, v = out
        assert k.shape[2] == 16 and v.shape[2] == 16
        assert k.max() == 1.5 and v.min() == -1.5
        assert disk.load_prefix(hashes[:2] + ["nope"]) is None

    def test_shard_rollover_and_eviction(self, model, tmp_path):
        from mlx_vlm_tpu.apc import ShardedDiskStore

        cache = self._cache(model, 1.0, 64)
        one = 2 * 2 * 4 * 16 * 4 * 2  # bytes per record (k+v)
        disk = ShardedDiskStore(
            str(tmp_path / "s3"), max_bytes=int(one * 6),
            blocks_per_shard=4)
        apc = APCManager(num_blocks=256, block_size=4, disk_store=disk)
        apc.commit(list(range(64)), cache)
        disk.flush()
        st = disk.stats()
        assert st["disk_shards"] >= 1
        assert st["disk_bytes"] <= one * 6 + one * 4  # budget + active shard

    def test_free_ram_guard_rejects_promotion(self, model, tmp_path):
        from mlx_vlm_tpu.apc import ShardedDiskStore

        tokens = list(range(12))
        cache = self._cache(model, 1.0, 32)
        disk = ShardedDiskStore(str(tmp_path / "s4"), max_bytes=10**9)
        apc1 = APCManager(num_blocks=64, block_size=4, disk_store=disk)
        apc1.commit(tokens, cache)
        disk.flush()
        # fresh manager with an impossible free-RAM floor: promotion denied
        apc2 = APCManager(
            num_blocks=64, block_size=4, disk_store=disk,
            min_free_ram_bytes=1 << 60)
        prefix, blocks = apc2.lookup(tokens)
        assert prefix == 0 and blocks == []
        assert apc2.stats.rejects.get("low_ram", 0) == 1


    def test_torn_record_truncated_on_next_write(self, model, tmp_path):
        """ADVICE r3 (medium): a crash-torn partial record must not shift
        every subsequent record off its indexed slot — the writer truncates
        back to the last aligned boundary before appending."""
        from mlx_vlm_tpu.apc import ShardedDiskStore

        tokens = list(range(8))
        cache = self._cache(model, 3.5, 32)
        disk = ShardedDiskStore(str(tmp_path / "s4"), max_bytes=10**9)
        apc = APCManager(num_blocks=64, block_size=4, disk_store=disk)
        apc.commit(tokens, cache)
        disk.flush()
        import os

        rec = disk._meta["rec_bytes"]
        shard = disk._shard_file(0)
        # simulate a torn write: append half a record of garbage
        with open(shard, "ab") as fh:
            fh.write(b"\x7f" * (rec // 2))

        # next commit must land on an aligned slot and stay readable
        tokens2 = list(range(100, 112))
        cache2 = self._cache(model, 1.25, 32)
        apc.commit(tokens2, cache2)
        disk.flush()
        assert os.path.getsize(shard) % rec == 0
        apc2 = APCManager(
            num_blocks=64, block_size=4,
            disk_store=ShardedDiskStore(str(tmp_path / "s4"),
                                        max_bytes=10**9))
        prefix, blocks = apc2.lookup(tokens2)
        assert prefix == 8
        assert np.asarray(blocks[0].k).max() == 1.25
        apc2.release(blocks)

    def test_index_compacts_after_eviction(self, model, tmp_path):
        """ADVICE r3 (low): shard eviction rewrites index.jsonl so stale
        lines don't accumulate forever."""
        from mlx_vlm_tpu.apc import ShardedDiskStore

        cache = self._cache(model, 1.0, 64)
        one = 2 * 2 * 4 * 16 * 4 * 2
        disk = ShardedDiskStore(
            str(tmp_path / "s5"), max_bytes=int(one * 4),
            blocks_per_shard=2)
        apc = APCManager(num_blocks=256, block_size=4, disk_store=disk)
        apc.commit(list(range(64)), cache)
        disk.flush()
        with disk._ilock:
            live = len(disk._index)
        with open(disk._index_file()) as fh:
            lines = [ln for ln in fh if ln.strip()]
        # compacted: one meta line + exactly the live entries
        assert len(lines) == live + 1


class TestTextOnlySuffixRule:
    def test_suffix_media_rejected_when_enabled(self, model):
        import dataclasses

        from mlx_vlm_tpu.apc import (media_safe_prefix_min,
                                     prefix_leaves_text_only_suffix)

        # tokens: 8 text, then a media span at [10, 14)
        tokens = list(range(100, 110)) + [7, 7, 7, 7] + [110, 111]
        assert media_safe_prefix_min(tokens, [7]) == 14
        assert not prefix_leaves_text_only_suffix(tokens, 8, [7])
        assert prefix_leaves_text_only_suffix(tokens, 14, [7])

        cache = make_cache(model, 1, 32, jnp.float32)
        cache = dataclasses.replace(cache, offset=jnp.asarray(16, jnp.int32))
        apc = APCManager(num_blocks=64, block_size=4, media_token_ids=[7],
                         text_only_suffix=True)
        apc.commit(tokens, cache)
        prefix, blocks = apc.lookup(tokens)
        # 8-token cached prefix leaves media in the suffix -> hit dropped
        assert prefix == 0 and blocks == []
        assert apc.stats.rejects.get("media_suffix", 0) == 1

        # default managers (full-prompt embeds) keep the hit
        apc2 = APCManager(num_blocks=64, block_size=4, media_token_ids=[7])
        apc2.commit(tokens, cache)
        prefix2, blocks2 = apc2.lookup(tokens)
        assert prefix2 == 8
        apc2.release(blocks2)


class TestExactDiskTier:
    """SSD persistence for exact snapshots (reference save_exact_cache /
    find_exact_prefix / load_exact_cache)."""

    def _snap(self, model, n):
        import dataclasses

        cache = make_cache(model, 1, 32, jnp.float32)
        return dataclasses.replace(
            cache, k=cache.k.at[:, 0, :, :n, :].set(1.25),
            offset=jnp.asarray(n, jnp.int32))

    def test_restart_survival(self, model, tmp_path):
        from mlx_vlm_tpu.apc import APCManager, ExactDiskStore

        tokens = list(range(12))
        disk1 = ExactDiskStore(str(tmp_path / "exact"), max_bytes=10**9)
        apc1 = APCManager(num_blocks=8, block_size=4,
                          exact_disk_store=disk1)
        apc1.store_exact(tokens, self._snap(model, 12), capacity=32)

        # "restart": fresh manager, empty RAM store, same directory
        disk2 = ExactDiskStore(str(tmp_path / "exact"), max_bytes=10**9)
        apc2 = APCManager(num_blocks=8, block_size=4,
                          exact_disk_store=disk2)
        n, cache = apc2.lookup_exact(tokens + [99, 98])
        assert n == 12 and cache is not None
        assert int(cache.offset) == 12
        assert float(jnp.max(cache.k)) == 1.25
        # promoted to the RAM store: second lookup hits without disk
        apc2.exact_disk = None
        n2, c2 = apc2.lookup_exact(tokens + [99, 98])
        assert n2 == 12 and c2 is not None

    def test_capacity_filter_on_disk(self, model, tmp_path):
        from mlx_vlm_tpu.apc import APCManager, ExactDiskStore

        disk = ExactDiskStore(str(tmp_path / "exact"), max_bytes=10**9)
        apc = APCManager(num_blocks=8, block_size=4, exact_disk_store=disk)
        apc.store_exact(list(range(8)), self._snap(model, 8), capacity=32)
        apc._exact.clear()  # force the disk path
        n, _ = apc.lookup_exact(list(range(10)), min_capacity=64)
        assert n == 0  # too small for the continuation

    def test_byte_budget_eviction(self, model, tmp_path):
        import os

        from mlx_vlm_tpu.apc import ExactDiskStore

        snap = jax.device_get(self._snap(model, 4))
        one = sum(a.nbytes for a in jax.tree_util.tree_leaves(snap)
                  if hasattr(a, "nbytes"))
        disk = ExactDiskStore(str(tmp_path / "exact"),
                              max_bytes=int(one * 2.5))
        for i in range(4):
            disk.put(f"k{i}", 8, 32, snap)
        pkls = [f for f in os.listdir(str(tmp_path / "exact"))
                if f.endswith(".pkl")]
        assert len(pkls) <= 3  # oldest evicted under the byte budget
