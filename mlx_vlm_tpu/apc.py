"""Automatic Prefix Caching (APC).

Role parity: reference mlx_vlm/apc.py — APCManager:2840, APCBlock:496,
chained hashing H(parent, tokens, extra):95, semantic_extra_hash:193 (image
content + model identity), media-safety rules:412-472, warm-cache builders
:3588, harvest:4040, APCStats:582, from_env:4405.

TPU design: the pool lives in host RAM (numpy blocks).  Harvest is a
device->host copy of the prompt's KV slab; warm restore assembles the prefix
host-side and uploads it into a fresh fixed-capacity cache whose write
cursor starts at the reused length.  (The reference leans on Apple unified
memory; on TPU these are explicit transfers, done once per prompt.)
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import threading
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

DEFAULT_BLOCK_SIZE = 16
DEFAULT_NUM_BLOCKS = 2048


def _hash(parent: Optional[str], tokens: Tuple[int, ...], extra: str = "") -> str:
    h = hashlib.sha256()
    h.update((parent or "").encode())
    h.update(np.asarray(tokens, np.int64).tobytes())
    h.update(extra.encode())
    return h.hexdigest()


def semantic_extra_hash(
    model_key: str = "",
    images: Optional[Sequence[Any]] = None,
    tenant: str = "",
) -> str:
    """Multimodal-aware salt: same tokens + different image must not collide
    (reference apc.py:193)."""
    h = hashlib.sha256()
    h.update(model_key.encode())
    h.update(tenant.encode())
    for im in images or []:
        arr = np.asarray(im)
        h.update(arr.tobytes()[:65536])
        h.update(str(arr.shape).encode())
    return h.hexdigest()


def media_token_spans(tokens: Sequence[int], media_ids: Sequence[int]) -> List[Tuple[int, int]]:
    """Contiguous spans of media tokens (reference apc.py:412)."""
    spans = []
    start = None
    mset = set(media_ids)
    for i, t in enumerate(tokens):
        if t in mset:
            if start is None:
                start = i
        elif start is not None:
            spans.append((start, i))
            start = None
    if start is not None:
        spans.append((start, len(tokens)))
    return spans


def adjust_prefix_to_media_boundary(
    prefix_len: int, tokens: Sequence[int], media_ids: Sequence[int]
) -> int:
    """Shrink prefix so it never splits a media span (reference apc.py:472)."""
    for s, e in media_token_spans(tokens, media_ids):
        if s < prefix_len < e:
            return s
    return prefix_len


def media_safe_prefix_min(tokens: Sequence[int], media_ids: Sequence[int]) -> int:
    """Minimum prefix that leaves a text-only suffix (reference apc.py:435).

    Warm-restore paths embed the uncached suffix; model-agnostic media
    feature slicing isn't available, so a reusable prefix must cover every
    media span — the suffix then embeds as plain text."""
    spans = media_token_spans(tokens, media_ids)
    return max((e for _, e in spans), default=0)


def prefix_leaves_text_only_suffix(
    tokens: Sequence[int], prefix_len: int, media_ids: Sequence[int]
) -> bool:
    """Reference apc.py:451 — the text-only-suffix media-safety rule."""
    return int(prefix_len) >= media_safe_prefix_min(tokens, media_ids)


@dataclasses.dataclass
class APCBlock:
    hash: str
    parent: Optional[str]
    tokens: Tuple[int, ...]
    k: np.ndarray  # [L, H, bs, D]  (or packed arrays for quantized caches)
    v: np.ndarray
    last_used: float = 0.0
    refs: int = 0


@dataclasses.dataclass
class APCStats:
    lookups: int = 0
    hits: int = 0
    hit_tokens: int = 0
    stores: int = 0
    evictions: int = 0
    rejects: Dict[str, int] = dataclasses.field(default_factory=dict)

    def reject(self, reason: str):
        self.rejects[reason] = self.rejects.get(reason, 0) + 1

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


def _free_ram_bytes() -> int:
    """Available host RAM (reference free-RAM guard before disk restores)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 1 << 62  # unknown platform: never block


class DiskBlockStore:
    """SSD tier for KV blocks — survives restart (reference apc.py:837).

    One safetensors file per block (k/v tensors + token/parent metadata),
    byte-budgeted LRU eviction by mtime, background writer thread so harvest
    never blocks the decode loop (reference background writer apc.py:2450).
    """

    def __init__(self, path: str, max_bytes: int = 8 * 1024**3):
        import queue

        os.makedirs(path, exist_ok=True)
        self.path = path
        self.max_bytes = max_bytes
        self._q: "queue.Queue" = queue.Queue()
        self.writes = 0
        self.loads = 0
        self._writer = threading.Thread(target=self._write_loop, daemon=True)
        self._writer.start()

    def _file(self, h: str) -> str:
        return os.path.join(self.path, f"block_{h}.safetensors")

    def put(self, block: APCBlock):
        self._q.put(block)

    def _write_loop(self):
        while True:
            block = self._q.get()
            try:
                if block is None:
                    return
                self._write(block)
            except Exception:  # noqa: BLE001 - best-effort tier
                pass
            finally:
                self._q.task_done()

    def _write(self, block: APCBlock):
        import json as _json

        from safetensors.numpy import save_file

        meta = {
            "parent": block.parent or "",
            "tokens": _json.dumps(list(block.tokens)),
        }
        save_file({"k": block.k, "v": block.v}, self._file(block.hash),
                  metadata=meta)
        self.writes += 1
        self._evict()

    def _evict(self):
        files = [
            (os.path.getmtime(f), os.path.getsize(f), f)
            for f in (os.path.join(self.path, n) for n in os.listdir(self.path))
            if f.endswith(".safetensors")
        ]
        total = sum(sz for _, sz, _ in files)
        for _, sz, f in sorted(files):
            if total <= self.max_bytes:
                break
            try:
                os.remove(f)
                total -= sz
            except OSError:
                pass

    def get(self, h: str) -> Optional[APCBlock]:
        import json as _json

        from safetensors import safe_open

        f = self._file(h)
        if not os.path.exists(f):
            return None
        try:
            with safe_open(f, framework="numpy") as sf:
                meta = sf.metadata() or {}
                blk = APCBlock(
                    hash=h,
                    parent=meta.get("parent") or None,
                    tokens=tuple(_json.loads(meta.get("tokens", "[]"))),
                    k=sf.get_tensor("k"),
                    v=sf.get_tensor("v"),
                    last_used=time.time(),
                )
            os.utime(f)  # LRU touch
            self.loads += 1
            return blk
        except Exception:  # noqa: BLE001
            return None

    def flush(self, timeout: float = 10.0):
        """Wait for queued writes to COMPLETE (tests / shutdown).

        q.empty() turns true the moment the writer dequeues the last
        block — before _write finishes — so completion is tracked with
        task_done()/unfinished_tasks instead (ADVICE r3)."""
        deadline = time.time() + timeout
        with self._q.all_tasks_done:
            while self._q.unfinished_tasks and time.time() < deadline:
                self._q.all_tasks_done.wait(
                    max(0.0, min(0.1, deadline - time.time())))

    def stats(self) -> dict:
        files = os.listdir(self.path)
        return {
            "disk_blocks": len(files),
            "disk_bytes": sum(
                os.path.getsize(os.path.join(self.path, f)) for f in files
            ),
            "disk_writes": self.writes,
            "disk_loads": self.loads,
        }


class ShardedDiskStore:
    """Shard-file SSD tier: fixed-size block records appended to large
    shard files, with an append-only JSONL index — the layer-major layout
    of reference apc.py:2081-2413 (`load_layer_major_prefix`).

    vs the one-file-per-block DiskBlockStore:
    - a block read is ONE byte-range `np.memmap` slice (no file-per-block
      open/parse, no full-file reads);
    - blocks committed in chain order land at consecutive shard offsets,
      so restoring a prefix collapses into per-segment contiguous range
      reads (`load_prefix`) — the reference's warm-disk fast path;
    - each record is layer-major ([L, H, bs, D] C-order, K then V), so a
      per-layer restore could read layer strides without touching other
      layers.

    The index (hash -> (shard, slot, parent, tokens)) is rebuilt from
    `index.jsonl` on restart; shard files are LRU-evicted whole by mtime
    under the byte budget.  Same put/get/flush/stats interface as
    DiskBlockStore, so APCManager uses either unchanged.
    """

    MAGIC = "apc-shard-v1"

    def __init__(self, path: str, max_bytes: int = 8 * 1024**3,
                 blocks_per_shard: int = 256,
                 min_free_ram_bytes: int = 1 << 30):
        import json as _json
        import queue

        os.makedirs(path, exist_ok=True)
        self.path = path
        self.max_bytes = max_bytes
        self.blocks_per_shard = blocks_per_shard
        self.min_free_ram_bytes = min_free_ram_bytes
        self.writes = 0
        self.loads = 0
        self._meta: Optional[dict] = None  # {shape,dtype,rec_bytes}
        self._index: Dict[str, Tuple[int, int, Optional[str], Tuple[int, ...]]] = {}
        self._shard_fill: Dict[int, int] = {}
        self._ilock = threading.RLock()
        self._load_index()
        self._q: "queue.Queue" = queue.Queue()
        self._writer = threading.Thread(target=self._write_loop, daemon=True)
        self._writer.start()

    # ------------------------------------------------------------ layout
    def _shard_file(self, sid: int) -> str:
        return os.path.join(self.path, f"shard_{sid:06d}.bin")

    def _index_file(self) -> str:
        return os.path.join(self.path, "index.jsonl")

    def _rec_meta(self, block: APCBlock) -> dict:
        k = np.asarray(block.k)
        return {
            "magic": self.MAGIC,
            "shape": list(k.shape),  # [L, H, bs, D]
            "dtype": str(k.dtype),
            "rec_bytes": 2 * k.nbytes,  # K then V, layer-major C-order
        }

    def _np_dtype(self):
        name = self._meta["dtype"]
        try:
            return np.dtype(name)
        except TypeError:
            import ml_dtypes

            return np.dtype(getattr(ml_dtypes, name))

    def _load_index(self):
        import json as _json

        f = self._index_file()
        if not os.path.exists(f):
            return
        try:
            with open(f) as fh:
                for line in fh:
                    rec = _json.loads(line)
                    if "magic" in rec:
                        self._meta = rec
                        continue
                    sid, slot = rec["sid"], rec["slot"]
                    if not os.path.exists(self._shard_file(sid)):
                        continue  # shard evicted after the index line
                    self._index[rec["h"]] = (
                        sid, slot, rec.get("p") or None,
                        tuple(rec.get("t", ())),
                    )
                    self._shard_fill[sid] = max(
                        self._shard_fill.get(sid, 0), slot + 1)
        except Exception:  # noqa: BLE001 - corrupt index: start fresh
            self._index.clear()
            self._shard_fill.clear()

    # ------------------------------------------------------------- write
    def put(self, block: APCBlock):
        if _free_ram_bytes() < self.min_free_ram_bytes:
            return  # free-RAM guard: don't grow the write queue
        self._q.put(block)

    def _write_loop(self):
        while True:
            block = self._q.get()
            try:
                if block is None:
                    return
                self._write(block)
            except Exception:  # noqa: BLE001 - best-effort tier
                pass
            finally:
                self._q.task_done()

    def _write(self, block: APCBlock):
        import json as _json

        k = np.ascontiguousarray(np.asarray(block.k))
        v = np.ascontiguousarray(np.asarray(block.v))
        with self._ilock:
            if block.hash in self._index:
                return
            if self._meta is None:
                self._meta = self._rec_meta(block)
                with open(self._index_file(), "a") as fh:
                    fh.write(_json.dumps(self._meta) + "\n")
            if list(k.shape) != self._meta["shape"]:
                return  # different model/layout than this store
            sid = max(self._shard_fill, default=0)
            if self._shard_fill.get(sid, 0) >= self.blocks_per_shard:
                sid += 1
            slot = self._shard_fill.get(sid, 0)
            rec_bytes = self._meta["rec_bytes"]
            fpath = self._shard_file(sid)
            with open(fpath, "r+b" if os.path.exists(fpath) else "wb") as fh:
                fh.seek(0, 2)
                if fh.tell() != slot * rec_bytes:
                    # crash left a torn (partial) record: truncate back to
                    # the last aligned boundary so this and every later
                    # record land at slot*rec_bytes — appending at the torn
                    # offset would misalign ALL subsequent slots while the
                    # index records aligned ones, silently corrupting every
                    # read from this shard (ADVICE r3)
                    slot = fh.tell() // rec_bytes
                    fh.truncate(slot * rec_bytes)
                    fh.seek(slot * rec_bytes)
                fh.write(k.tobytes())
                fh.write(v.tobytes())
            self._shard_fill[sid] = slot + 1
            self._index[block.hash] = (
                sid, slot, block.parent, tuple(block.tokens))
            with open(self._index_file(), "a") as fh:
                fh.write(_json.dumps({
                    "h": block.hash, "sid": sid, "slot": slot,
                    "p": block.parent or "", "t": list(block.tokens),
                }) + "\n")
            self.writes += 1
        self._evict()

    def _evict(self):
        with self._ilock:
            shards = sorted(self._shard_fill)
            total = sum(
                os.path.getsize(self._shard_file(s))
                for s in shards if os.path.exists(self._shard_file(s))
            )
            active = max(shards, default=0)
            for s in sorted(
                (s for s in shards if s != active),
                key=lambda s: os.path.getmtime(self._shard_file(s))
                if os.path.exists(self._shard_file(s)) else 0,
            ):
                if total <= self.max_bytes:
                    break
                f = self._shard_file(s)
                try:
                    total -= os.path.getsize(f)
                    os.remove(f)
                except OSError:
                    pass
                self._shard_fill.pop(s, None)
                self._index = {
                    h: e for h, e in self._index.items() if e[0] != s
                }
                self._index_dirty = True
            if getattr(self, "_index_dirty", False):
                self._compact_index()

    def _compact_index(self):
        """Rewrite index.jsonl with only live entries.

        The index is append-only during writes; without compaction,
        eviction churn grows it without bound and every restart skips the
        stale lines one by one (ADVICE r3).  Called under _ilock."""
        import json as _json

        tmp = self._index_file() + ".tmp"
        try:
            with open(tmp, "w") as fh:
                if self._meta is not None:
                    fh.write(_json.dumps(self._meta) + "\n")
                for h, (sid, slot, parent, tokens) in self._index.items():
                    fh.write(_json.dumps({
                        "h": h, "sid": sid, "slot": slot,
                        "p": parent or "", "t": list(tokens),
                    }) + "\n")
            os.replace(tmp, self._index_file())
            self._index_dirty = False
        except OSError:
            pass

    # -------------------------------------------------------------- read
    def _read_slots(self, sid: int, lo: int, hi: int) -> Optional[np.ndarray]:
        """One byte-range memmap read of records [lo, hi) in shard sid."""
        rec = self._meta["rec_bytes"]
        f = self._shard_file(sid)
        if not os.path.exists(f):
            return None
        if os.path.getsize(f) < hi * rec:
            return None
        mm = np.memmap(f, dtype=np.uint8, mode="r",
                       offset=lo * rec, shape=((hi - lo) * rec,))
        out = np.array(mm)  # copy out of the map
        del mm
        os.utime(f)  # LRU touch
        return out

    def get(self, h: str) -> Optional[APCBlock]:
        with self._ilock:
            entry = self._index.get(h)
            meta = self._meta
        if entry is None or meta is None:
            return None
        sid, slot, parent, tokens = entry
        raw = self._read_slots(sid, slot, slot + 1)
        if raw is None:
            return None
        shape = tuple(meta["shape"])
        half = meta["rec_bytes"] // 2
        dt = self._np_dtype()
        k = np.frombuffer(raw[:half].tobytes(), dtype=dt).reshape(shape)
        v = np.frombuffer(raw[half:].tobytes(), dtype=dt).reshape(shape)
        self.loads += 1
        return APCBlock(hash=h, parent=parent, tokens=tokens,
                        k=k, v=v, last_used=time.time())

    def load_prefix(self, hashes: Sequence[str]):
        """Warm-disk fast path: one contiguous range read per segment of
        consecutive shard slots (reference load_layer_major_prefix).
        Returns (k [L,H,prefix,D], v) or None when any block is missing."""
        with self._ilock:
            entries = [self._index.get(h) for h in hashes]
            meta = self._meta
        if meta is None or any(e is None for e in entries):
            return None
        segments: List[Tuple[int, int, int]] = []  # (sid, lo, hi)
        for sid, slot, _, _ in entries:
            if segments and segments[-1][0] == sid and segments[-1][2] == slot:
                segments[-1] = (sid, segments[-1][1], slot + 1)
            else:
                segments.append((sid, slot, slot + 1))
        shape = tuple(meta["shape"])  # [L, H, bs, D]
        half = meta["rec_bytes"] // 2
        dt = self._np_dtype()
        ks, vs = [], []
        for sid, lo, hi in segments:
            raw = self._read_slots(sid, lo, hi)
            if raw is None:
                return None
            for i in range(hi - lo):
                rec = raw[i * 2 * half:(i + 1) * 2 * half]
                ks.append(np.frombuffer(
                    rec[:half].tobytes(), dtype=dt).reshape(shape))
                vs.append(np.frombuffer(
                    rec[half:].tobytes(), dtype=dt).reshape(shape))
        self.loads += len(hashes)
        return np.concatenate(ks, axis=2), np.concatenate(vs, axis=2)

    # ------------------------------------------------------------- misc
    def flush(self, timeout: float = 10.0):
        """Wait for queued writes to COMPLETE (tests / shutdown).

        q.empty() turns true the moment the writer dequeues the last
        block — before _write finishes — so completion is tracked with
        task_done()/unfinished_tasks instead (ADVICE r3)."""
        deadline = time.time() + timeout
        with self._q.all_tasks_done:
            while self._q.unfinished_tasks and time.time() < deadline:
                self._q.all_tasks_done.wait(
                    max(0.0, min(0.1, deadline - time.time())))

    def stats(self) -> dict:
        with self._ilock:
            files = [
                self._shard_file(s) for s in self._shard_fill
                if os.path.exists(self._shard_file(s))
            ]
            return {
                "disk_blocks": len(self._index),
                "disk_shards": len(files),
                "disk_bytes": sum(os.path.getsize(f) for f in files),
                "disk_writes": self.writes,
                "disk_loads": self.loads,
            }


class ExactDiskStore:
    """SSD tier for whole-prefix EXACT snapshots (reference apc.py
    save_exact_cache / find_exact_prefix / load_exact_cache — the disk leg
    of exact-mode APC for hybrid/recurrent caches).

    One pickle per snapshot (the host-side numpy pytree of a registered
    cache dataclass — importable classes, so restart-safe with the same
    code), atomic tmp+rename writes, byte-budgeted LRU eviction by mtime.
    A jsonl index carries (key, token_len, capacity) so lookups scan
    metadata without touching snapshot payloads."""

    def __init__(self, path: str, max_bytes: int = 4 * 1024**3):
        os.makedirs(path, exist_ok=True)
        self.path = path
        self.max_bytes = max_bytes
        self.lock = threading.Lock()
        # key -> (token_len, capacity)
        self.index: Dict[str, Tuple[int, Optional[int]]] = {}
        for fn in os.listdir(path):
            if fn.startswith("exact-") and fn.endswith(".meta"):
                try:
                    with open(os.path.join(path, fn)) as f:
                        m = json.load(f)
                    self.index[m["key"]] = (int(m["token_len"]),
                                            m.get("capacity"))
                except (OSError, ValueError, KeyError):
                    continue

    def _file(self, key: str) -> str:
        return os.path.join(self.path, f"exact-{key}.pkl")

    def put(self, key: str, token_len: int, capacity: Optional[int],
            snapshot) -> None:
        import pickle

        with self.lock:
            tmp = self._file(key) + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(snapshot, f, protocol=pickle.HIGHEST_PROTOCOL)
            os.replace(tmp, self._file(key))
            with open(os.path.join(self.path, f"exact-{key}.meta"),
                      "w") as f:
                json.dump({"key": key, "token_len": token_len,
                           "capacity": capacity}, f)
            self.index[key] = (token_len, capacity)
            self._evict()

    def get(self, key: str):
        import pickle

        try:
            with open(self._file(key), "rb") as f:
                snap = pickle.load(f)
            os.utime(self._file(key))  # LRU touch
            return snap
        except (OSError, pickle.UnpicklingError, EOFError):
            with self.lock:
                self.index.pop(key, None)
            return None

    def lengths(self):
        with self.lock:
            return dict(self.index)

    def _evict(self):
        files = []
        total = 0
        for fn in os.listdir(self.path):
            if fn.startswith("exact-") and fn.endswith(".pkl"):
                fp = os.path.join(self.path, fn)
                try:
                    st = os.stat(fp)
                except OSError:
                    continue
                files.append((st.st_mtime, st.st_size, fp, fn))
                total += st.st_size
        files.sort()
        for _, size, fp, fn in files:
            if total <= self.max_bytes:
                break
            key = fn[len("exact-"):-len(".pkl")]
            for suffix in (".pkl", ".meta"):
                try:
                    os.remove(os.path.join(self.path, f"exact-{key}{suffix}"))
                except OSError:
                    pass
            self.index.pop(key, None)
            total -= size


class APCManager:
    """Fixed-size block pool with chained hashes and LRU eviction."""

    def __init__(
        self,
        num_blocks: int = DEFAULT_NUM_BLOCKS,
        block_size: int = DEFAULT_BLOCK_SIZE,
        media_token_ids: Sequence[int] = (),
        disk_store: Optional["DiskBlockStore"] = None,
        text_only_suffix: bool = False,
        min_free_ram_bytes: int = 1 << 30,
        exact_disk_store: Optional["ExactDiskStore"] = None,
    ):
        # text_only_suffix: the reference's media rule (apc.py:451) — its
        # restore path re-embeds the suffix from token ids, so media must
        # not appear after the prefix.  This framework embeds the FULL
        # prompt (vision included) before slicing at prefix_len
        # (generate/dispatch.py), so the rule is correctness-neutral here
        # and off by default; enable for reference-parity behavior or for
        # integrations that re-tokenize the suffix.
        self.num_blocks = num_blocks
        self.block_size = block_size
        self.media_token_ids = tuple(media_token_ids)
        self.blocks: Dict[str, APCBlock] = {}
        self.disk = disk_store
        self.exact_disk = exact_disk_store
        self.text_only_suffix = text_only_suffix
        self.min_free_ram_bytes = min_free_ram_bytes
        self.lock = threading.RLock()
        self.stats = APCStats()

    # ----------------------------------------------------------------- query
    def lookup(self, tokens: Sequence[int], extra: str = "") -> Tuple[int, List[APCBlock]]:
        """Longest cached prefix (multiple of block_size, media-safe,
        strictly shorter than the prompt)."""
        bs = self.block_size
        tokens = list(tokens)
        with self.lock:
            self.stats.lookups += 1
            matched: List[APCBlock] = []
            parent = None
            limit = (len(tokens) - 1) // bs  # leave >=1 token to prefill
            for b in range(limit):
                chunk = tuple(tokens[b * bs : (b + 1) * bs])
                h = _hash(parent, chunk, extra)
                blk = self.blocks.get(h)
                if blk is None and self.disk is not None:
                    # promote from the SSD tier — guarded by free host RAM
                    # (reference free-RAM guard, apc.py:2081-2413 region)
                    if _free_ram_bytes() < self.min_free_ram_bytes:
                        self.stats.reject("low_ram")
                        break
                    blk = self.disk.get(h)
                    if blk is not None:
                        self._evict_if_full()
                        self.blocks[h] = blk
                if blk is None:
                    break
                matched.append(blk)
                parent = h
            prefix = len(matched) * bs
            safe = adjust_prefix_to_media_boundary(
                prefix, tokens, self.media_token_ids
            )
            if safe != prefix:
                self.stats.reject("media_boundary")
                safe = (safe // bs) * bs
                matched = matched[: safe // bs]
                prefix = safe
            if (self.text_only_suffix and prefix
                    and not prefix_leaves_text_only_suffix(
                        tokens, prefix, self.media_token_ids)):
                # text-only-suffix rule (reference apc.py:451): a prefix
                # that leaves media tokens in the suffix can't be restored
                # model-agnostically — drop the hit entirely
                self.stats.reject("media_suffix")
                matched = []
                prefix = 0
            now = time.time()
            for blk in matched:
                blk.last_used = now
                blk.refs += 1  # pinned until release() — eviction skips it
            if prefix:
                self.stats.hits += 1
                self.stats.hit_tokens += prefix
            return prefix, matched

    def release(self, blocks: List[APCBlock]):
        """Unpin blocks returned by lookup() once the warm cache is built
        (reference ref-counted block locking, apc.py:496 ref_cnt)."""
        with self.lock:
            for blk in blocks:
                blk.refs = max(0, blk.refs - 1)

    # ----------------------------------------------------------------- store
    def commit(
        self,
        tokens: Sequence[int],
        cache,
        extra: str = "",
        row: int = 0,
        upto: Optional[int] = None,
    ):
        """Split the prompt KV into blocks and insert (skips already-cached
        prefix).  `cache` is a framework KVCache; device->host copy happens
        here, once."""
        bs = self.block_size
        tokens = list(tokens)
        n = upto if upto is not None else len(tokens)
        n = (n // bs) * bs
        if n == 0:
            self.stats.reject("too_short")
            return 0
        if type(cache).__name__ not in ("KVCache", "BatchKVCache"):
            self.stats.reject("cache_type")
            return 0
        # pre-compute the hash chain; device->host copy only for the missing
        # suffix region (a warm hit re-commit is then free)
        hashes = []
        parent = None
        for b in range(n // bs):
            chunk = tuple(tokens[b * bs : (b + 1) * bs])
            h = _hash(parent, chunk, extra)
            hashes.append((h, parent, chunk))
            parent = h
        with self.lock:
            first_missing = next(
                (i for i, (h, _, _) in enumerate(hashes) if h not in self.blocks),
                None,
            )
        if first_missing is None:
            return 0
        lo = first_missing * bs
        k_host = np.asarray(cache.k[:, row, :, lo:n, :])  # [L, H, n-lo, D]
        v_host = np.asarray(cache.v[:, row, :, lo:n, :])
        stored = 0
        with self.lock:
            for b in range(first_missing, n // bs):
                h, parent, chunk = hashes[b]
                if h not in self.blocks:
                    self._evict_if_full()
                    s = (b * bs) - lo
                    blk = APCBlock(
                        hash=h,
                        parent=parent,
                        tokens=chunk,
                        k=k_host[:, :, s : s + bs, :].copy(),
                        v=v_host[:, :, s : s + bs, :].copy(),
                        last_used=time.time(),
                    )
                    self.blocks[h] = blk
                    if self.disk is not None:
                        self.disk.put(blk)
                    stored += 1
            self.stats.stores += stored
        return stored

    def _evict_if_full(self):
        if len(self.blocks) < self.num_blocks:
            return
        # LRU eviction, but never evict a pinned (in-flight) block, and
        # never a block that is some other block's parent unless its
        # children are gone too (evict leaves first)
        parents = {b.parent for b in self.blocks.values() if b.parent}
        free = [b for b in self.blocks.values() if b.refs == 0]
        candidates = [b for b in free if b.hash not in parents] or free
        if not candidates:  # everything pinned: allow over-fill
            return
        victim = min(candidates, key=lambda b: b.last_used)
        del self.blocks[victim.hash]
        self.stats.evictions += 1

    # ------------------------------------------------------------- warm cache
    def make_warm_cache(
        self,
        matched: List[APCBlock],
        model,
        capacity: int,
        dtype=jnp.bfloat16,
    ):
        """Assemble matched blocks into a fresh cache with offset=prefix."""
        from .generate.ar import make_cache

        lm = model.language_model
        prefix = len(matched) * self.block_size
        cache = make_cache(model, 1, capacity, dtype)
        if not matched:
            return cache
        k_np = np.concatenate([b.k for b in matched], axis=2)  # [L,H,prefix,D]
        v_np = np.concatenate([b.v for b in matched], axis=2)
        k = cache.k.at[:, 0, :, :prefix, :].set(jnp.asarray(k_np, cache.k.dtype))
        v = cache.v.at[:, 0, :, :prefix, :].set(jnp.asarray(v_np, cache.v.dtype))
        return dataclasses.replace(
            cache, k=k, v=v, offset=jnp.asarray(prefix, jnp.int32)
        )

    # ------------------------------------------------------------ exact mode
    # Whole prompt-cache snapshots for cache types that can't be split into
    # per-token blocks (SSM / recurrent / MLA latents) — reference apc.py
    # `model_apc_mode`:4098, lookup_exact_cache:2976 / store_exact_cache.

    def store_exact(self, tokens: Sequence[int], cache, extra: str = "",
                    capacity: Optional[int] = None) -> bool:
        """`capacity` records the snapshot's KV time-axis size so lookups
        can reject snapshots too small to hold a longer continuation
        (reference disk load_exact_cache min_capacity_tokens)."""
        key = _hash(None, tuple(tokens), "exact:" + extra)
        snap = jax.device_get(cache)
        if self.exact_disk is not None:
            try:
                self.exact_disk.put(key, len(tokens), capacity, snap)
            except OSError:
                pass  # best-effort tier
        with self.lock:
            store = getattr(self, "_exact", None)
            if store is None:
                store = self._exact = {}
            store[key] = (len(tokens), snap, capacity)
            self.stats.stores += 1
            # bound the snapshot count with simple FIFO eviction
            while len(store) > max(8, self.num_blocks // 256):
                store.pop(next(iter(store)))
                self.stats.evictions += 1
        return True

    def lookup_exact(self, tokens: Sequence[int], extra: str = "",
                     min_prefix_tokens: int = 0,
                     max_prefix_tokens: Optional[int] = None,
                     min_capacity: int = 0):
        """Longest stored snapshot matching a strict prefix of `tokens`.
        Returns (prefix_len, device cache) or (0, None).

        `max_prefix_tokens` is the prefix-guard boundary (reference
        exact_cache_guard_tokens:2864): callers pass len(tokens) - guard so
        at least `guard` suffix tokens are re-prefilled, keeping recurrent
        boundaries conservative.  `min_prefix_tokens` enforces the media-
        safety floor; `min_capacity` rejects snapshots whose fixed KV
        capacity can't hold the new continuation (legacy entries stored
        without a capacity are trusted).

        One hash per DISTINCT stored length, longest first with early exit
        (not one per snapshot — the round-1 linear scan)."""
        tokens = list(tokens)
        hi = len(tokens) - 1
        if max_prefix_tokens is not None:
            hi = min(hi, int(max_prefix_tokens))
        with self.lock:
            self.stats.lookups += 1
            store = getattr(self, "_exact", None) or {}
            best = (0, None)
            lengths = sorted({n for n, _, _ in store.values()
                              if min_prefix_tokens <= n <= hi}, reverse=True)
            for n in lengths:
                key = _hash(None, tuple(tokens[:n]), "exact:" + extra)
                hit = store.get(key)
                if hit is not None:
                    if (min_capacity and hit[2] is not None
                            and hit[2] < min_capacity):
                        self.stats.reject("exact_capacity")
                        continue
                    best = (n, hit[1])
                    break
        if best[1] is None and self.exact_disk is not None:
            # SSD fallback (reference lookup_exact_cache disk leg :3026):
            # scan distinct lengths against the jsonl-backed index, load
            # the snapshot payload only on a key match, RAM-guarded
            if _free_ram_bytes() >= self.min_free_ram_bytes:
                idx = self.exact_disk.lengths()
                by_len = sorted(
                    {n for n, cap in idx.values()
                     if min_prefix_tokens <= n <= hi
                     and not (min_capacity and cap is not None
                              and cap < min_capacity)},
                    reverse=True)
                for n in by_len:
                    key = _hash(None, tuple(tokens[:n]), "exact:" + extra)
                    if key not in idx:
                        continue
                    snap = self.exact_disk.get(key)
                    if snap is not None:
                        with self.lock:
                            store = getattr(self, "_exact", None)
                            if store is None:
                                store = self._exact = {}
                            # promote for the fast path next time
                            store[key] = (n, snap, idx[key][1])
                        best = (n, snap)
                        break
        if best[1] is None:
            return 0, None
        with self.lock:
            self.stats.hits += 1
            self.stats.hit_tokens += best[0]
        cache = jax.tree_util.tree_map(jnp.asarray, best[1])
        return best[0], cache

    def reset(self):
        with self.lock:
            self.blocks.clear()
            if getattr(self, "_exact", None):
                self._exact.clear()

    def snapshot(self) -> dict:
        with self.lock:
            out = {
                "enabled": True,
                "num_blocks": self.num_blocks,
                "block_size": self.block_size,
                "used_blocks": len(self.blocks),
                **self.stats.as_dict(),
            }
            if self.disk is not None:
                out.update(self.disk.stats())
            return out


def from_env(media_token_ids: Sequence[int] = ()) -> Optional[APCManager]:
    """APC_ENABLED / APC_NUM_BLOCKS / APC_BLOCK_SIZE (reference apc.py:4405)."""
    if os.environ.get("APC_ENABLED", "0") not in ("1", "true", "True"):
        return None
    disk = None
    exact_disk = None
    if os.environ.get("APC_DISK_PATH"):
        max_bytes = int(os.environ.get("APC_DISK_MAX_BYTES", 8 * 1024**3))
        if os.environ.get("APC_DISK_LAYOUT", "sharded") == "blocks":
            disk = DiskBlockStore(os.environ["APC_DISK_PATH"], max_bytes)
        else:
            disk = ShardedDiskStore(
                os.environ["APC_DISK_PATH"], max_bytes,
                blocks_per_shard=int(
                    os.environ.get("APC_BLOCKS_PER_SHARD", 256)),
            )
        exact_disk = ExactDiskStore(
            os.path.join(os.environ["APC_DISK_PATH"], "exact"),
            max_bytes=int(os.environ.get("APC_EXACT_DISK_MAX_BYTES",
                                         4 * 1024**3)),
        )
    return APCManager(
        num_blocks=int(os.environ.get("APC_NUM_BLOCKS", DEFAULT_NUM_BLOCKS)),
        block_size=int(os.environ.get("APC_BLOCK_SIZE", DEFAULT_BLOCK_SIZE)),
        media_token_ids=media_token_ids,
        disk_store=disk,
        text_only_suffix=os.environ.get(
            "APC_TEXT_ONLY_SUFFIX", "0") in ("1", "true", "True"),
        min_free_ram_bytes=int(
            os.environ.get("APC_MIN_FREE_RAM_BYTES", 1 << 30)),
        exact_disk_store=exact_disk,
    )
