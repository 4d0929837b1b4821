"""Sharded priority-frontier actors with per-host politeness budgets.

Replaces the reference's ``Pagination`` FIFO-with-cursor frontier
(``pygdpr/models/common/pagination/__init__.py:1-33``) and its ad-hoc
``time.sleep(5)`` politeness (``france/__init__.py:96``,
``denmark/__init__.py:58``) with the north_rule design: hosts are
hash-partitioned across shards (``hash(host) % n_shards``), each shard
holds a per-host min-heap ordered by ``(depth, parent_order,
dom_idx)`` plus a per-host token budget that refills every politeness
window (``budget = round_ms // crawl_delay_ms``, ``politeness_cap``
for delay-0 hosts — the token-bucket analogue of the reference's
translate-quota window, ``services/translate_quota_service.py:8-31``).

Skew note (SURVEY §4): partitioning is by host so politeness stays
correct for mega-hosts; a mega-host's *work* (fetch+parse) is still
spread across the cluster because the popped batch is re-partitioned
by ``url_hash`` for the fetch stage — only the heap bookkeeping is
single-shard, and that is O(log n) appends/pops of tuples.

``pop_wave`` is deterministic: ascending heap order per host, at most
the host's remaining window budget. The driver advances windows when
every shard reports it popped nothing while still holding entries.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

__all__ = ["FrontierShard", "make_frontier_shards", "frontier_shard_of"]

ENTRY_COLS = ("url", "url_hash", "host", "depth", "parent_order", "dom_idx")


def frontier_shard_of(hosts, n_shards: int) -> np.ndarray:
    """Stable host→shard assignment (blake2b-derived, python-hash-free)."""
    import hashlib
    return np.array(
        [int.from_bytes(hashlib.blake2b(h.encode(), digest_size=4).digest(),
                        "big") % n_shards
         for h in hosts], dtype=np.int32)


@ray.remote
class FrontierShard:
    def __init__(self, shard_id: int, robots_delay: dict, round_ms: int,
                 politeness_cap: int):
        self.shard_id = shard_id
        self.robots_delay = robots_delay          # host -> crawl_delay_ms
        self.round_ms = round_ms
        self.cap = politeness_cap
        self.heaps: dict[str, list] = {}          # host -> heap of tuples
        self.remaining: dict[str, int] = {}       # host -> budget left in window
        self.pushed = 0
        self.popped = 0

    def _budget(self, host: str) -> int:
        delay = int(self.robots_delay.get(host, 0))
        if delay <= 0:
            return self.cap
        return max(1, min(self.cap, self.round_ms // delay))

    # -- API --------------------------------------------------------------
    def push(self, table) -> int:
        import pickle
        if isinstance(table, (bytes, bytearray)):
            table = pickle.loads(table)
        urls = table["url"].to_pylist()
        hashes = table["url_hash"].to_pylist()
        hosts = table["host"].to_pylist()
        depths = table["depth"].to_pylist()
        parents = table["parent_order"].to_pylist()
        doms = table["dom_idx"].to_pylist()
        for u, uh, h, d, p, m in zip(urls, hashes, hosts, depths, parents, doms):
            heapq.heappush(self.heaps.setdefault(h, []), (d, p, m, u, uh))
        self.pushed += len(urls)
        return len(urls)

    def pop_wave(self) -> pa.Table | None:
        """Pop up to each host's remaining window budget, priority order."""
        rows = {c: [] for c in ENTRY_COLS}
        for host in sorted(self.heaps):
            heap = self.heaps[host]
            if not heap:
                continue
            rem = self.remaining.setdefault(host, self._budget(host))
            take = min(rem, len(heap))
            self.remaining[host] = rem - take
            for _ in range(take):
                d, p, m, u, uh = heapq.heappop(heap)
                rows["url"].append(u); rows["url_hash"].append(uh)
                rows["host"].append(host); rows["depth"].append(d)
                rows["parent_order"].append(p); rows["dom_idx"].append(m)
        if not rows["url"]:
            return None
        self.popped += len(rows["url"])
        return pa.table({
            "url": pa.array(rows["url"], pa.string()),
            "url_hash": pa.array(rows["url_hash"], pa.uint64()),
            "host": pa.array(rows["host"], pa.string()),
            "depth": pa.array(rows["depth"], pa.int32()),
            "parent_order": pa.array(rows["parent_order"], pa.int64()),
            "dom_idx": pa.array(rows["dom_idx"], pa.int32()),
        })

    def reset_window(self) -> None:
        self.remaining = {}

    def size(self) -> int:
        return sum(len(h) for h in self.heaps.values())

    # -- checkpoint -------------------------------------------------------
    def snapshot(self, path: str) -> int:
        rows = {c: [] for c in ENTRY_COLS}
        rows["budget_remaining"] = []
        for host, heap in self.heaps.items():
            for d, p, m, u, uh in heap:
                rows["url"].append(u); rows["url_hash"].append(uh)
                rows["host"].append(host); rows["depth"].append(d)
                rows["parent_order"].append(p); rows["dom_idx"].append(m)
                rows["budget_remaining"].append(-1)
        # budgets ride along as sentinel rows (url="") so one parquet
        # holds the full shard state
        for host, rem in self.remaining.items():
            rows["url"].append(""); rows["url_hash"].append(0)
            rows["host"].append(host); rows["depth"].append(-1)
            rows["parent_order"].append(-1); rows["dom_idx"].append(-1)
            rows["budget_remaining"].append(rem)
        t = pa.table({
            "url": pa.array(rows["url"], pa.string()),
            "url_hash": pa.array(rows["url_hash"], pa.uint64()),
            "host": pa.array(rows["host"], pa.string()),
            "depth": pa.array(rows["depth"], pa.int32()),
            "parent_order": pa.array(rows["parent_order"], pa.int64()),
            "dom_idx": pa.array(rows["dom_idx"], pa.int32()),
            "budget_remaining": pa.array(rows["budget_remaining"], pa.int64()),
        })
        pq.write_table(t, path)
        return t.num_rows

    def restore(self, path: str) -> int:
        t = pq.read_table(path)
        self.heaps, self.remaining = {}, {}
        n = 0
        for u, uh, h, d, p, m, rem in zip(
                t["url"].to_pylist(), t["url_hash"].to_pylist(),
                t["host"].to_pylist(), t["depth"].to_pylist(),
                t["parent_order"].to_pylist(), t["dom_idx"].to_pylist(),
                t["budget_remaining"].to_pylist()):
            if d < 0:
                self.remaining[h] = int(rem)
            else:
                heapq.heappush(self.heaps.setdefault(h, []), (d, p, m, u, uh))
                n += 1
        return n

    def stats(self) -> dict:
        return {"shard": self.shard_id, "size": self.size(),
                "pushed": self.pushed, "popped": self.popped,
                "hosts": len(self.heaps)}


def make_frontier_shards(n_shards: int, robots_delay: dict, round_ms: int,
                         politeness_cap: int) -> list:
    return [FrontierShard.options(max_concurrency=1)
            .remote(i, robots_delay, round_ms, politeness_cap)
            for i in range(n_shards)]
