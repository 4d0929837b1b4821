"""Sharded priority-frontier actors with per-host politeness budgets.

Replaces the reference's ``Pagination`` FIFO-with-cursor frontier
(``pygdpr/models/common/pagination/__init__.py:1-33``) and its ad-hoc
``time.sleep(5)`` politeness (``france/__init__.py:96``,
``denmark/__init__.py:58``) with the north_rule design: hosts are
hash-partitioned across shards (``hash(host) % n_shards``), each shard
holds a per-host priority queue ordered by ``(depth, parent_order,
dom_idx)`` plus a per-host token budget that refills every politeness
window (``budget = round_ms // crawl_delay_ms``, ``politeness_cap``
for delay-0 hosts — the token-bucket analogue of the reference's
translate-quota window, ``services/translate_quota_service.py:8-31``).

**Columnar queues, not Python heaps**: each host's queue is a set of
numpy column arrays — a sorted prefix plus unsorted pending chunks
appended by ``push``. ``pop_wave`` merges pending chunks with one
vectorized ``np.lexsort`` and slices off the host's budget; per-URL
Python work is zero. This is what keeps a mega-host (40 % of the
corpus on one shard — the EDPB/Czech skew model, SURVEY §4) off the
critical path: popping 36k URLs is one lexsort (~ms), not 36k heap
operations.

**Pipelined visibility (wave lag)**: every pushed entry carries a
``visible_from`` wave (= discovery wave + the crawl's
``pipeline_depth``); ``pop_wave(wave)`` first activates staged chunks
with ``visible_from <= wave``, then pops. Visibility is a property of
the data, not of actor timing — the driver may keep several
fetch+parse waves in flight and wave composition stays
bit-deterministic (the sequential oracle implements the same rule).
``visible_from`` absent or 0 = immediately visible.

``pop_wave`` is deterministic: ascending priority per host, at most
the host's remaining window budget. The driver advances windows when
every shard reports it popped nothing while still holding entries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

__all__ = ["FrontierShard", "make_frontier_shards", "frontier_shard_of"]

ENTRY_COLS = ("url", "url_hash", "host", "depth", "parent_order", "dom_idx")
_QCOLS = ("depth", "parent_order", "dom_idx", "url", "url_hash")


def frontier_shard_of(hosts, n_shards: int) -> np.ndarray:
    """Stable host→shard assignment (blake2b-derived, python-hash-free)."""
    import hashlib
    return np.array(
        [int.from_bytes(hashlib.blake2b(h.encode(), digest_size=4).digest(),
                        "big") % n_shards
         for h in hosts], dtype=np.int32)


def _chunk_from_arrays(depth, parent, dom, url, uh) -> dict:
    return {"depth": np.asarray(depth, dtype=np.int32),
            "parent_order": np.asarray(parent, dtype=np.int64),
            "dom_idx": np.asarray(dom, dtype=np.int32),
            "url": np.asarray(url, dtype=object),
            "url_hash": np.asarray(uh, dtype=np.uint64)}


def _concat_chunks(chunks: list[dict]) -> dict:
    if len(chunks) == 1:
        return chunks[0]
    return {c: np.concatenate([ch[c] for ch in chunks]) for c in _QCOLS}


def _sort_chunk(ch: dict) -> dict:
    # priority (depth, parent_order, dom_idx) — no further tie-break
    # needed: (parent_order, dom_idx) = (discovering page's unique
    # pop_rank, link index within it) is globally unique per entry
    order = np.lexsort((ch["dom_idx"], ch["parent_order"], ch["depth"]))
    return {c: ch[c][order] for c in _QCOLS}


class _HostQueue:
    """Sorted prefix + pending unsorted chunks; lazily re-merged."""

    __slots__ = ("sorted", "pending")

    def __init__(self) -> None:
        self.sorted: dict | None = None
        self.pending: list[dict] = []

    def add(self, chunk: dict) -> None:
        self.pending.append(chunk)

    def __len__(self) -> int:
        n = 0 if self.sorted is None else len(self.sorted["depth"])
        return n + sum(len(c["depth"]) for c in self.pending)

    def pop(self, k: int) -> dict | None:
        if self.pending:
            chunks = ([self.sorted] if self.sorted is not None else []) \
                + self.pending
            self.sorted = _sort_chunk(_concat_chunks(chunks))
            self.pending = []
        if self.sorted is None or len(self.sorted["depth"]) == 0:
            return None
        k = min(k, len(self.sorted["depth"]))
        if k <= 0:
            return None
        out = {c: self.sorted[c][:k] for c in _QCOLS}
        self.sorted = {c: self.sorted[c][k:] for c in _QCOLS}
        return out


@ray.remote
class FrontierShard:
    def __init__(self, shard_id: int, robots_delay: dict, round_ms: int,
                 politeness_cap: int):
        self.shard_id = shard_id
        self.robots_delay = robots_delay          # host -> crawl_delay_ms
        self.round_ms = round_ms
        self.cap = politeness_cap
        self.queues: dict[str, _HostQueue] = {}
        self.staged: dict[int, list] = {}         # visible_from -> [(host, chunk)]
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
        n = table.num_rows
        hosts = np.asarray(table["host"].to_pylist(), dtype=object)
        depth = table["depth"].to_numpy(zero_copy_only=False)
        parent = table["parent_order"].to_numpy(zero_copy_only=False)
        dom = table["dom_idx"].to_numpy(zero_copy_only=False)
        url = np.asarray(table["url"].to_pylist(), dtype=object)
        uh = table["url_hash"].to_numpy(zero_copy_only=False)
        vis = (table["visible_from"].to_numpy(zero_copy_only=False)
               if "visible_from" in table.column_names
               else np.zeros(n, dtype=np.int32))
        for v in np.unique(vis):
            vm = vis == v
            hv = hosts[vm]
            for h in np.unique(hv):
                m = hv == h
                chunk = _chunk_from_arrays(depth[vm][m], parent[vm][m],
                                           dom[vm][m], url[vm][m], uh[vm][m])
                self.staged.setdefault(int(v), []).append((str(h), chunk))
        self.pushed += n
        return n

    def _activate(self, wave: int | None) -> None:
        for v in [v for v in self.staged
                  if wave is None or v <= wave]:
            for host, chunk in self.staged.pop(v):
                self.queues.setdefault(host, _HostQueue()).add(chunk)

    def pop_wave(self, wave: int | None = None) -> pa.Table | None:
        """Activate entries visible at ``wave``, then pop up to each
        host's remaining window budget, priority order."""
        self._activate(wave)
        parts: list[tuple[str, dict]] = []
        for host in sorted(self.queues):
            q = self.queues[host]
            if not len(q):
                continue
            rem = self.remaining.setdefault(host, self._budget(host))
            if rem <= 0:
                continue
            out = q.pop(rem)
            if out is None:
                continue
            self.remaining[host] = rem - len(out["depth"])
            parts.append((host, out))
        if not parts:
            return None
        total = sum(len(c["depth"]) for _, c in parts)
        self.popped += total
        host_col = np.concatenate(
            [np.full(len(c["depth"]), h, dtype=object) for h, c in parts])
        merged = _concat_chunks([c for _, c in parts])
        return pa.table({
            "url": pa.array(merged["url"], pa.string()),
            "url_hash": pa.array(merged["url_hash"], pa.uint64()),
            "host": pa.array(host_col, pa.string()),
            "depth": pa.array(merged["depth"], pa.int32()),
            "parent_order": pa.array(merged["parent_order"], pa.int64()),
            "dom_idx": pa.array(merged["dom_idx"], pa.int32()),
        })

    def reset_window(self) -> None:
        self.remaining = {}

    def size(self) -> int:
        return sum(len(q) for q in self.queues.values()) \
            + sum(len(c["depth"]) for chunks in self.staged.values()
                  for _, c in chunks)

    def sizes(self) -> dict:
        """(active, staged) split — drives the driver's deterministic
        bubble-wave / window-advance / terminate decision."""
        return {"active": sum(len(q) for q in self.queues.values()),
                "staged": sum(len(c["depth"]) for chunks in self.staged.values()
                              for _, c in chunks)}

    # -- checkpoint -------------------------------------------------------
    def snapshot(self, path: str) -> int:
        cols: dict[str, list] = {c: [] for c in ENTRY_COLS}
        cols["budget_remaining"] = []
        cols["visible_from"] = []

        def emit(host: str, chunk: dict, vis: int) -> None:
            k = len(chunk["depth"])
            cols["url"].extend(chunk["url"])
            cols["url_hash"].extend(chunk["url_hash"])
            cols["host"].extend([host] * k)
            cols["depth"].extend(chunk["depth"])
            cols["parent_order"].extend(chunk["parent_order"])
            cols["dom_idx"].extend(chunk["dom_idx"])
            cols["budget_remaining"].extend([-1] * k)
            cols["visible_from"].extend([vis] * k)

        for host, q in self.queues.items():
            if q.sorted is not None:
                emit(host, q.sorted, 0)
            for c in q.pending:
                emit(host, c, 0)
        for v, chunks in self.staged.items():
            for host, c in chunks:
                emit(host, c, v)
        # budgets ride along as sentinel rows (url="") so one parquet
        # holds the full shard state
        for host, rem in self.remaining.items():
            cols["url"].append(""); cols["url_hash"].append(0)
            cols["host"].append(host); cols["depth"].append(-1)
            cols["parent_order"].append(-1); cols["dom_idx"].append(-1)
            cols["budget_remaining"].append(rem)
            cols["visible_from"].append(-1)
        t = pa.table({
            "url": pa.array(cols["url"], pa.string()),
            "url_hash": pa.array(np.asarray(cols["url_hash"], dtype=np.uint64),
                                 pa.uint64()),
            "host": pa.array(cols["host"], pa.string()),
            "depth": pa.array(np.asarray(cols["depth"], dtype=np.int32),
                              pa.int32()),
            "parent_order": pa.array(
                np.asarray(cols["parent_order"], dtype=np.int64), pa.int64()),
            "dom_idx": pa.array(np.asarray(cols["dom_idx"], dtype=np.int32),
                                pa.int32()),
            "budget_remaining": pa.array(
                np.asarray(cols["budget_remaining"], dtype=np.int64),
                pa.int64()),
            "visible_from": pa.array(
                np.asarray(cols["visible_from"], dtype=np.int32), pa.int32()),
        })
        pq.write_table(t, path)
        return t.num_rows

    def restore(self, path: str) -> int:
        t = pq.read_table(path)
        self.queues, self.staged, self.remaining = {}, {}, {}
        depth = t["depth"].to_numpy(zero_copy_only=False)
        vis = (t["visible_from"].to_numpy(zero_copy_only=False)
               if "visible_from" in t.column_names
               else np.zeros(t.num_rows, dtype=np.int32))
        hosts = np.asarray(t["host"].to_pylist(), dtype=object)
        url = np.asarray(t["url"].to_pylist(), dtype=object)
        uh = t["url_hash"].to_numpy(zero_copy_only=False)
        parent = t["parent_order"].to_numpy(zero_copy_only=False)
        dom = t["dom_idx"].to_numpy(zero_copy_only=False)
        rem = t["budget_remaining"].to_numpy(zero_copy_only=False)
        sent = depth < 0
        for h, r in zip(hosts[sent], rem[sent]):
            self.remaining[str(h)] = int(r)
        live = ~sent
        n = int(live.sum())
        lv, lh = vis[live], hosts[live]
        ld, lp, lm = depth[live], parent[live], dom[live]
        lu, luh = url[live], uh[live]
        for v in np.unique(lv):
            vm = lv == v
            for h in np.unique(lh[vm]):
                m = vm & (lh == h)
                chunk = _chunk_from_arrays(ld[m], lp[m], lm[m], lu[m], luh[m])
                if v > 0:
                    self.staged.setdefault(int(v), []).append((str(h), chunk))
                else:
                    self.queues.setdefault(str(h), _HostQueue()).add(chunk)
        return n

    def stats(self) -> dict:
        return {"shard": self.shard_id, "size": self.size(),
                "pushed": self.pushed, "popped": self.popped,
                "hosts": len(self.queues)}


def make_frontier_shards(n_shards: int, robots_delay: dict, round_ms: int,
                         politeness_cap: int) -> list:
    return [FrontierShard.options(max_concurrency=1)
            .remote(i, robots_delay, round_ms, politeness_cap)
            for i in range(n_shards)]
