"""Exact vectorized membership over uint64 keys (signature table).

The seen shard's probe structure. The bloom/cuckoo prefilters
(:mod:`crawler_ray.state.bloom`, :mod:`~.cuckoo`) answer
"definitely new" cheaply but every positive still pays a binary
search over the shard's sorted exact array — and in the drain
regime (resume from a deep checkpoint, where ~every offered link is
already seen) the prefilter is pure overhead: measured per 500k
probes on a 435k-key shard, bloom 296 ms + searchsorted 197 ms vs
26 ms for one open-addressed gather here (miss-heavy: 89 ms, still
3x under the bloom alone). The table IS exact, so it replaces both
probe stages, not just the prefilter.

Layout: ``2**m`` uint64 slots, key stored at ``splitmix64(key) &
(2**m - 1)``; insert collisions (and the reserved key 0) spill to a
small sorted overflow array (~10% of keys at the default 4
slots/key). A probe is one gather + compare, plus a searchsorted
over the overflow for the rows that missed.

Memory at the 10^10-URL design point (2.4M keys per shard over 4096
shards): 4 slots/key → 77 MB/shard vs the bloom's 3.6 MB. That is
the documented trade — a node hosting 16 shards spends ~1.2 GB on
membership tables to make every probe exact and 6-11x faster;
deployments tighter on memory keep ``filter_kind="bloom"``.

Concurrent-reader contract (relied on by the seen shard's
offer-lane prefilter): mutators run only on the actor's default
lane; readers may run on the offer lane concurrently. Every slot
write is a single aligned 8-byte store of a REAL key, the overflow
and (on growth) the table are swapped by whole-array assignment,
and ``contains`` captures both refs into locals first — so a racing
reader can transiently miss a key (reported fresh; harmless, the
commit re-probes authoritatively) but can never report an absent
key as present.
"""

from __future__ import annotations

import numpy as np

from crawler_ray.state.bloom import _splitmix64

__all__ = ["SigTable"]


class SigTable:
    """Exact membership set for uint64 keys. See module docstring.

    Parameters
    ----------
    capacity : expected number of keys (grows past it by rebuild)
    slots_per_key : table slots provisioned per expected key; higher
        → fewer overflow spills, more memory (default 4 → ~10% spill)
    """

    def __init__(self, capacity: int, slots_per_key: int = 4):
        self.capacity = int(capacity)
        self.slots_per_key = int(slots_per_key)
        m = max(64, int(capacity) * self.slots_per_key)
        self.nslots = 1 << int(m - 1).bit_length()     # next power of two
        self.table = np.zeros(self.nslots, dtype=np.uint64)
        self.overflow = np.zeros(0, dtype=np.uint64)   # sorted
        self.count = 0

    def _slots(self, keys: np.ndarray, nslots: int) -> np.ndarray:
        return (_splitmix64(keys) & np.uint64(nslots - 1)).astype(np.int64)

    def add(self, keys: np.ndarray) -> None:
        """Insert keys (duplicates and already-present keys are no-ops
        beyond the overflow union). Mutator — default lane only."""
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return
        if (self.count + len(keys)) * self.slots_per_key > self.nslots * 2:
            self._grow(keys)
            return
        slot = self._slots(keys, self.nslots)
        # one writer per slot within the batch (first in batch order),
        # then a single gather decides who actually landed
        order = np.argsort(slot, kind="stable")
        ss = slot[order]
        first = np.ones(len(ss), dtype=bool)
        first[1:] = ss[1:] != ss[:-1]
        w_slot = ss[first]
        w_key = keys[order][first]
        cur = self.table[w_slot]
        place = (cur == 0) & (w_key != 0)
        self.table[w_slot[place]] = w_key[place]
        # whatever is not now readable from the table goes to overflow
        # (key 0 can never land: an empty slot compares equal to it,
        # but contains() masks key==0 table hits, so force it here)
        landed = (self.table[slot] == keys) & (keys != 0)
        rest = keys[~landed]
        if len(rest):
            self.overflow = np.union1d(self.overflow, rest)
        self.count += len(keys)

    def _grow(self, extra: np.ndarray) -> None:
        """Rebuild at double size, then atomically swap table and
        overflow (in that order — see the reader contract above)."""
        live = self.table[self.table != 0]
        all_keys = np.concatenate([live, self.overflow, extra])
        new = SigTable(max(self.capacity * 2,
                           (len(all_keys) * 2) // self.slots_per_key + 1),
                       self.slots_per_key)
        new.add(all_keys)
        self.nslots = new.nslots
        self.capacity = new.capacity
        self.table = new.table
        self.overflow = new.overflow
        self.count = new.count

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Boolean mask, exact. Safe to call from a concurrent reader
        thread (may under-report during a racing add, never over-)."""
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        table = self.table              # capture refs once (swap safety)
        overflow = self.overflow
        slot = self._slots(keys, len(table))
        hit = (table[slot] == keys) & (keys != 0)
        rest = np.flatnonzero(~hit)
        if len(rest) and len(overflow):
            q = keys[rest]
            idx = np.minimum(np.searchsorted(overflow, q),
                             len(overflow) - 1)
            hit[rest[overflow[idx] == q]] = True
        return hit
