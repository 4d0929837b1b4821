"""Sharded URL-seen membership actors (bloom + exact confirm).

Replaces the reference's O(n)-scan Python list seen-set
(``gdprCrawler.py:111-118``) and per-run ``dict_hashcode``
(``denmark/__init__.py:87,135-140``). Candidates are routed to shard
``url_hash % n_shards``; each shard answers membership through a
:class:`~crawler_ray.state.sigtable.SigTable` (exact, one vectorized
gather per probe — the default) or, for memory-tight deployments, a
:class:`~crawler_ray.state.bloom.BloomFilter`/cuckoo prefilter over
the sorted exact array (``filter_kind="bloom"``/``"cuckoo"``).

Protocol per wave (matches oracle contract rules 1/2/6):

1. parse tasks ``offer()`` candidate sub-tables (url, url_hash, host,
   depth, parent_order, dom_idx) as they finish — no ordering
   assumptions;
2. the driver barriers on the wave, then calls ``commit_wave()`` on
   every shard: the shard dedups same-wave duplicates keeping the
   smallest ``(depth, parent_order, dom_idx)`` key, drops
   robots-disallowed urls, probes membership, admits the rest, and
   returns the newly-seen entries (for the frontier push). (Rows
   whose hash was already seen when their offer landed were dropped
   on the offer lane — an equivalent but earlier application of the
   same rule; see :meth:`SeenShard.offer`.)

Scale: at the 10^10-URL design point, shard count is a parameter
(4096 shards → ~2.4M keys ≈ 40 MB exact + 3.6 MB bloom per shard);
the snapshot is one uint64 Parquet per shard per epoch, restored on
resume. Within this sandbox the same code runs with 4-8 shards.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from crawler_ray.state.bloom import BloomFilter

__all__ = ["SeenShard", "make_seen_shards", "robots_allowed_mask"]

CANDIDATE_COLS = ("url", "url_hash", "host", "depth", "parent_order", "dom_idx")


def robots_allowed_mask(urls: list, hosts: list, robots: dict) -> np.ndarray:
    """Vector mask of robots-allowed urls. ``robots`` maps host →
    list of disallowed path prefixes (empty → fully open). Only rows
    whose host actually has rules are touched (most hosts have none,
    so the per-row python work is a small fraction of the batch)."""
    from crawler_ray.urlnorm import path_of
    out = np.ones(len(urls), dtype=bool)
    ruled = {h for h in set(hosts) if robots.get(h)}
    if not ruled:
        return out
    for i, (u, h) in enumerate(zip(urls, hosts)):
        if h not in ruled:
            continue
        path = path_of(u)
        if any(path.startswith(p) for p in robots[h]):
            out[i] = False
    return out


@ray.remote(concurrency_groups={"offer": 2})
class SeenShard:
    """One shard of the URL-seen set. See module docstring.

    ``offer`` runs in its own concurrency group so a burst of offers
    never queues behind an in-flight ``commit_wave`` (with one lane,
    commit time turned directly into idle parse cores — measured as
    23-26 s of task offer-wait per 4M-URL drain at 16 CPUs). The
    offer body unpacks the blob and DROPS definitely-seen candidates
    immediately (see :meth:`offer`): membership only ever grows, so a
    seen-now verdict is still true at commit time, and the probe cost
    moves off the window-boundary mega-commit (where it serialized
    against idle parse cores — measured 38 s of summed member-probe
    per scale4 drain, 3.9 s on the max shard = the driver's 4.7 s
    boundary commit_wait) into the parse window where cores are busy
    anyway. Thread safety: mutators (commit/restore) run only on the
    default lane; the offer lane reads membership through refs
    captured per call and may transiently under-report (fresh rows it
    keeps are re-probed authoritatively at commit), never over-report
    (every structure stores only real keys). Shared counters take
    ``_mlock`` — two offer threads race each other on read-modify-
    write increments otherwise."""

    def __init__(self, shard_id: int, capacity: int, robots: dict,
                 filter_kind: str = "sig"):
        import threading
        self.shard_id = shard_id
        self.filter_kind = filter_kind
        self.member = self._make_filter(capacity)
        # exact membership as a SORTED uint64 array: the snapshot
        # format and (for bloom/cuckoo prefilters) the authoritative
        # probe target, maintained by vectorized np.union1d merges.
        # With filter_kind="sig" the table is itself exact, so this
        # array only serves snapshots/restore.
        self.exact = np.zeros(0, dtype=np.uint64)
        self.robots = robots                     # host -> [disallow prefixes]
        self._pending: dict[int, list[pa.Table]] = {}   # wave -> offered tables
        self._offer_counts: dict[int, int] = {}          # wave -> offers landed
        self._mlock = threading.Lock()
        self.frontier_shards: list | None = None
        self.metrics = {"robots_excluded": 0, "dup_discovery": 0, "admitted": 0,
                        "bloom_false_positives": 0}
        # cumulative wall-seconds per commit stage (diagnostic: the
        # mega-wave commit sits on the pop critical path at window
        # boundaries — these localize WHERE that time goes; reported
        # via stats() and printed under CRAWLER_RAY_PHASE_TIMING)
        self.commit_s = {"unpack": 0.0, "dedup": 0.0, "member": 0.0,
                         "robots": 0.0, "push": 0.0, "offer_probe": 0.0}

    def _make_filter(self, capacity: int):
        if self.filter_kind == "cuckoo":
            from crawler_ray.state.cuckoo import CuckooFilter
            return CuckooFilter(capacity)
        if self.filter_kind == "bloom":
            return BloomFilter(capacity)
        from crawler_ray.state.sigtable import SigTable
        return SigTable(capacity)

    def _known_mask(self, hashes: np.ndarray, count_fp: bool = False
                    ) -> np.ndarray:
        """Exact already-seen mask. Reader-safe on the offer lane:
        captures structure refs once per call; a racing commit can
        make it under-report (harmless — fresh rows re-probe at
        commit) but never over-report."""
        if self.filter_kind == "sig":
            return self.member.contains(hashes)
        exact = self.exact                      # capture (atomic swap)
        maybe = self.member.might_contain(hashes)
        known = np.zeros(len(hashes), dtype=bool)
        if maybe.any() and len(exact):
            h = hashes[maybe]
            idx = np.minimum(np.searchsorted(exact, h), len(exact) - 1)
            known[maybe] = exact[idx] == h
        if count_fp:
            self.metrics["bloom_false_positives"] += int(
                maybe.sum() - known.sum())
        return known

    def set_frontier(self, frontier_shards: list) -> None:
        """Wire the frontier pool so admitted entries are pushed
        actor→actor (no driver round trip per wave)."""
        self.frontier_shards = frontier_shards

    @ray.method(concurrency_group="offer")
    def offer(self, table, wave: int = 0) -> int:
        """Buffer candidates under their discovery wave, dropping
        rows whose url_hash is ALREADY seen. Offers for a wave are
        complete before its ``commit_wave`` is dispatched (the driver
        barriers on the wave's fetch+parse first), so commits are
        deterministic under pipelining.

        Correctness of the early drop: the seen set grows
        monotonically (commits only add; restore precedes every
        commit by driver order), so seen-at-offer ⇒ seen-at-commit,
        and a seen hash drops ALL its wave entries regardless of
        rule-6 winner selection — filtering any subset of them early
        leaves the commit's fresh set unchanged. A racing commit can
        only make the probe miss (row kept, re-probed at commit).
        dup_discovery accounting is row-equivalent to the all-at-
        commit path: each dropped row counts here; the survivors'
        same-wave-dup + known counts at commit cover the rest.

        Cost placement: ~1-3 ms per blob on the offer lane. Parse
        tasks do NOT block on the ack (they return the ack ref; the
        driver resolves it at retire, P−1 waves later), so this sits
        on no task's critical path — it converts window-boundary
        serial commit time into work that overlaps parse."""
        import time
        t0 = time.perf_counter()
        import pickle
        t = (pickle.loads(table)
             if isinstance(table, (bytes, bytearray)) else table)
        h = t["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        known = self._known_mask(h)
        nk = int(known.sum())
        if nk:
            with self._mlock:
                self.metrics["dup_discovery"] += nk
            t = t.filter(pa.array(~known)) if nk < len(known) else None
        if t is not None and t.num_rows:
            self._pending.setdefault(wave, []).append(t)
        with self._mlock:
            self._offer_counts[wave] = self._offer_counts.get(wave, 0) + 1
            self.commit_s["offer_probe"] += time.perf_counter() - t0
        return 0

    @ray.method(concurrency_group="offer")
    def wave_offer_count(self, wave: int) -> int:
        """How many offer() calls have landed for ``wave`` — the
        shard-side barrier the driver falls back to when a task-owned
        offer-ack ref can't be resolved (the ack's owner is the
        transient worker that ran the parse task; if Ray reaps that
        worker between task completion and retire, ``ray.get(acks)``
        raises OwnerDiedError even though the offers themselves were
        delivered). Runs in the offer lane so it never queues behind
        an in-flight commit."""
        return self._offer_counts.get(wave, 0)

    def commit_wave(self, wave: int = 0, visible_from: int = 0) -> int:
        """Dedup → robots → membership probe → admit → push admitted
        entries (tagged ``visible_from``) to the frontier shards.
        Returns the admitted count."""
        import time
        t = self._commit(wave)
        if t is None:
            return 0
        t0 = time.perf_counter()
        t = t.append_column("visible_from", pa.array(
            np.full(t.num_rows, visible_from, dtype=np.int32)))
        if not self.frontier_shards:
            return t.num_rows
        from crawler_ray.sources.pages import pack
        from crawler_ray.state.frontier import frontier_shard_of
        shard = frontier_shard_of(t["host"].to_pylist(),
                                  len(self.frontier_shards))
        # one stable sort + per-shard takes (not a boolean scan per
        # shard — shard count scales with CPUs; see _parse_and_emit)
        order = np.argsort(shard, kind="stable")
        bounds = np.searchsorted(shard[order],
                                 np.arange(len(self.frontier_shards) + 1))
        refs = []
        for i in range(len(self.frontier_shards)):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            if lo != hi:
                refs.append(self.frontier_shards[i].push.remote(
                    pack(t.take(pa.array(order[lo:hi])))))
        ray.get(refs)
        self.commit_s["push"] += time.perf_counter() - t0
        return t.num_rows

    def _commit(self, wave: int) -> pa.Table | None:
        import pickle
        import time
        t0 = time.perf_counter()
        self._offer_counts.pop(wave, None)   # barrier state is per-wave
        pending = self._pending.pop(wave, None)
        if not pending:
            return None
        tables = [pickle.loads(b) if isinstance(b, (bytes, bytearray)) else b
                  for b in pending]
        t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
        t1 = time.perf_counter()
        self.commit_s["unpack"] += t1 - t0
        # rule 6: keep the smallest (depth, parent_order, dom_idx) per
        # url_hash — lexsort on the integer keys only; the url strings
        # never move until the (usually tiny) new-row take at the end
        hashes = t["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        depth = t["depth"].to_numpy(zero_copy_only=False)
        parent = t["parent_order"].to_numpy(zero_copy_only=False)
        dom = t["dom_idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dom, parent, depth, hashes))
        hs = hashes[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = hs[1:] != hs[:-1]
        self.metrics["dup_discovery"] += int((~first).sum())
        keep = order[first]            # row ids of winners, hash-ascending
        hashes_u = hs[first]
        t2 = time.perf_counter()
        self.commit_s["dedup"] += t2 - t1
        # membership next (sig table exact probe, or bloom prefilter +
        # exact confirm — all vectorized; most seen rows were already
        # dropped on the offer lane, so this re-probe covers only the
        # offer-time-fresh remainder). Robots runs ONLY on the
        # not-yet-seen rows: a disallowed url is never admitted, so
        # known ⊆ allowed and the metric accounting below is identical
        # to checking robots on every row (oracle rule order: seen,
        # then robots — ``oracle.py:150-155``).
        known = self._known_mask(hashes_u, count_fp=True)
        self.metrics["dup_discovery"] += int(known.sum())
        fresh = ~known
        t3 = time.perf_counter()
        self.commit_s["member"] += t3 - t2
        if not fresh.any():
            return None
        sub = t.take(pa.array(keep[fresh]))
        allowed = robots_allowed_mask(sub["url"].to_pylist(),
                                      sub["host"].to_pylist(), self.robots)
        self.metrics["robots_excluded"] += int((~allowed).sum())
        if not allowed.any():
            self.commit_s["robots"] += time.perf_counter() - t3
            return None
        admit = hashes_u[fresh][allowed]
        self.member.add(admit)
        self.exact = np.union1d(self.exact, admit)
        self.metrics["admitted"] += int(allowed.sum())
        out = sub.filter(pa.array(allowed))
        self.commit_s["robots"] += time.perf_counter() - t3
        return out

    # -- checkpoint -------------------------------------------------------
    def snapshot(self, path: str) -> int:
        pq.write_table(
            pa.table({"url_hash": pa.array(self.exact, pa.uint64())}), path)
        return len(self.exact)

    def restore(self, path: str) -> int:
        """Rebuild membership state (exact array + filter) from an
        epoch snapshot. MUST NOT touch ``_pending``/``_offer_counts``:
        ``offer`` runs in its own concurrency lane, so on resume a
        parse-task offer can legitimately land while this default-lane
        call is still queued behind a cold actor start — wiping the
        buffers here silently dropped those offers (lost discovered
        links, resumed run ≠ uninterrupted run; reproduced ~1/10 runs
        on a contended 4-CPU box). Offers never read membership state
        and every commit_wave is driver-ordered AFTER this restore, so
        preserving the buffers is safe under any interleaving."""
        hashes = pq.read_table(path)["url_hash"].to_numpy(
            zero_copy_only=False).astype(np.uint64)
        self.exact = np.sort(hashes)
        self.member = self._make_filter(max(self.member.capacity, len(hashes)))
        self.member.add(hashes)
        return len(self.exact)

    def stats(self) -> dict:
        from crawler_ray.state import current_rss_mb
        return {"shard": self.shard_id, "size": len(self.exact),
                "rss_mb": current_rss_mb(),
                "commit_s": {k: round(v, 3)
                             for k, v in self.commit_s.items()},
                **self.metrics}


def make_seen_shards(n_shards: int, capacity_per_shard: int, robots: dict,
                     name_prefix: str = "", filter_kind: str = "sig") -> list:
    return [SeenShard.options(
                name=f"{name_prefix}seen:{i}" if name_prefix else None,
                max_concurrency=1)
            .remote(i, capacity_per_shard, robots, filter_kind)
            for i in range(n_shards)]
