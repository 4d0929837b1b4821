"""Fetch-as-join: the sharded page store / fetch+parse actor pool.

The sandbox has no network, so the reference's live HTTP / Selenium
fetches (``austria/__init__.py:55-65``, ``denmark/__init__.py:44-75``)
become a distributed hash-join of the frontier's popped URLs against
the ``pages`` Parquet corpus (SURVEY §2.4 J5). ``PageStore`` shard
``i`` owns the rows with ``url_hash % n_shards == i`` and probes an
in-memory url_hash→row index — a semi-join where frontier rows
without a page row are the 404 path (``austria:60-65`` skip
semantics).

``fetch`` returns the joined rows as an Arrow table in the object
store; the crawl's parse work runs as stateless ``_parse_task`` Ray
tasks over zero-copy slices of that table (``pipelines/crawl.py``) so
parse CPU load-balances across the whole cluster instead of being
pinned to the shard that owns the pages.

In a real deployment this pool is an aiohttp fetcher (same
``fetch(batch)`` interface); the store is the sandbox stand-in for
"the web". At 100 TB the eager in-memory html would be replaced by
lazy row-group reads (index: url_hash → (file, row_group)) with an
LRU — the API and the crawl loop are unchanged.
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from crawler_ray.urlnorm import canonicalize, hash64_many

__all__ = ["PageStore", "build_page_stores", "fetch_popped", "pack", "unpack"]

FETCH_COLS = ["url", "html", "lang", "warc_ts"]


def pack(table: pa.Table) -> bytes:
    """Pickle a small Arrow table for inline actor-arg transfer.

    Ray always routes ``pa.Table`` arguments through the object store
    (zero-copy buffers → plasma put+get, ~10-20 ms round trip on this
    box); for the wave protocol's small control tables an inline
    pickled payload is ~100x cheaper. Large tables should NOT use
    this (loses zero-copy)."""
    return pickle.dumps(table, protocol=5)


def unpack(blob) -> pa.Table:
    return pickle.loads(blob) if isinstance(blob, (bytes, bytearray)) else blob


@ray.remote
class PageStore:
    def __init__(self, shard_id: int, n_shards: int):
        self.shard_id = shard_id
        self.n_shards = n_shards
        self.table: pa.Table | None = None
        self.index: dict[int, int] = {}
        self._corpus_ref = None

    def load(self, pages_path: str) -> int:
        """Load this shard's slice (``url_hash % n_shards ==
        shard_id``). Two layouts:

        - a **sharded dir** from :func:`prepare_sharded_pages` (url
          already canonical, url_hash precomputed): read only my
          ``shard-xxxxx.parquet`` — O(corpus/n_shards) per actor;
        - a single parquet file: read + canonicalize + filter (t1/t2
          test path; O(corpus) per actor — fine at fixture scale).

        At 100 TB the sharded layout is the only path, with lazy
        row-group reads behind the same index."""
        import json
        import os
        if os.path.isdir(pages_path):
            meta = json.load(open(os.path.join(pages_path, "meta.json")))
            ipc = os.path.join(pages_path,
                               f"shard-{self.shard_id:05d}.arrow")
            if meta["n_shards"] == self.n_shards and os.path.exists(ipc):
                # memory-mapped Arrow IPC sidecar: "load" is an mmap +
                # one argsort of the url_hash column — page-in of the
                # html bytes happens lazily during the loop's fetches
                # (served from page cache / local disk), so the corpus
                # restore barrier disappears from the critical path.
                # This is the per-node lazy-read behavior the 100-TB
                # deployment needs anyway; parquet remains the
                # portable at-rest format and the fallback below.
                t = pa.ipc.open_file(pa.memory_map(ipc)).read_all()
            elif meta["n_shards"] == self.n_shards:
                t = pq.read_table(os.path.join(
                    pages_path, f"shard-{self.shard_id:05d}.parquet"))
            else:                       # layout mismatch: read-all fallback
                t = pq.read_table(pages_path)
                hashes = t["url_hash"].to_numpy(zero_copy_only=False)
                mine = (hashes % np.uint64(self.n_shards)) == self.shard_id
                t = t.filter(pa.array(mine))
        else:
            t = pq.read_table(pages_path, columns=FETCH_COLS)
            urls = [canonicalize(u) for u in t["url"].to_pylist()]
            hashes = np.array(hash64_many(urls), dtype=np.uint64)
            mine = (hashes % np.uint64(self.n_shards)) == self.shard_id
            t = (t.set_column(t.schema.get_field_index("url"), "url",
                              pa.array(urls, pa.string()))
                  .append_column("url_hash", pa.array(hashes, pa.uint64()))
                  .filter(pa.array(mine)))
        self.table = t
        self._corpus_ref = None          # re-publish after (re)load
        hashes = t["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        self.perm = np.argsort(hashes, kind="stable")
        self.sorted_hashes = hashes[self.perm]
        return t.num_rows

    def export(self):
        """Publish this shard's (table, sorted url_hash index,
        permutation) as ONE object-store entry, letting tasks run
        :func:`join_pages` themselves against the zero-copy shared
        corpus. NOT used by the crawl loop: measured slower than the
        chunked ``fetch`` path on this corpus (a second full html
        copy parks in the object store — spill pressure — and the
        fetch/parse overlap is lost; see ``pipelines/crawl.py``
        ``_parse_task`` notes). Kept for corpora whose shards exceed
        actor heap, where plasma-resident is the only option."""
        return (self.table, self.sorted_hashes, self.perm)

    def publish(self):
        """Move this shard's corpus to ONE plasma-resident copy and
        return its ObjectRef (idempotent). The actor's heap copy is
        rebound to the zero-copy plasma view, so exactly one copy of
        the html exists machine-wide; ``fetch_indices`` + the parse
        tasks then read rows from it in place. (Round-3 tried a plasma
        ``export`` ALONGSIDE the heap table and reverted it — two full
        html copies; ``publish`` replaces the heap copy instead.)"""
        if self._corpus_ref is None:
            self._corpus_ref = ray.put(self.table)
            self.table = ray.get(self._corpus_ref)   # plasma-backed view
        return self._corpus_ref

    def fetch_indices(self, popped, start: int = 0,
                      stop: int | None = None,
                      order: np.ndarray | None = None) -> pa.Table:
        """Index-only fetch join: probe the sorted url_hash index for
        the popped slice and return ONE int64 column ``row`` (-1 =
        miss/404) aligned to the slice rows — ~8 B/url through the
        object store instead of the joined html (~1 KB/url). The
        parse tasks read the actual page rows zero-copy from the
        shard's published plasma corpus (see ``publish``). With
        ``order`` the slice rows are ``popped[order[start:stop]]``
        (the crawl's page-shard routing indices; see ``fetch``)."""
        popped = unpack(popped)
        if order is not None:
            popped = popped.take(pa.array(order[start:stop], pa.int64()))
        elif stop is not None:
            popped = popped.slice(start, stop - start)
        hashes = popped["url_hash"].to_numpy(
            zero_copy_only=False).astype(np.uint64)
        n = popped.num_rows
        if self.table is None or len(self.sorted_hashes) == 0:
            rows = np.full(n, -1, dtype=np.int64)
        else:
            idx = np.searchsorted(self.sorted_hashes, hashes)
            idx_c = np.minimum(idx, len(self.sorted_hashes) - 1)
            found = self.sorted_hashes[idx_c] == hashes
            rows = np.where(found, self.perm[idx_c], -1).astype(np.int64)
        return pa.table({"row": pa.array(rows)})

    # -- fetch-only (join) ------------------------------------------------
    def fetch(self, popped, start: int = 0, stop: int | None = None,
              order: np.ndarray | None = None) -> pa.Table:
        """Join popped frontier rows against this shard's pages.
        Returns popped columns + ``status`` (200/404) + page columns
        (html/lang/warc_ts; nulls on 404). ``popped`` may be a packed
        blob (small control tables) or a shared object-store Arrow
        table with ``[start, stop)`` bounds — the big-wave path where
        the driver puts the ranked table once and every fetch slices
        it zero-copy. With ``order`` (one shared int64 array per
        wave) the selection is ``popped[order[start:stop]]`` — the
        crawl keeps the wave in RANK order and ships page-shard
        routing as indices, so the gather runs here, shard-parallel,
        instead of as a driver-blocked take."""
        popped = unpack(popped)
        if order is not None:
            popped = popped.take(pa.array(order[start:stop], pa.int64()))
        elif stop is not None:
            popped = popped.slice(start, stop - start)
        return join_pages(popped, self.table, self.sorted_hashes, self.perm)


def join_pages(popped: pa.Table, corpus: pa.Table | None,
               sorted_hashes: np.ndarray, perm: np.ndarray) -> pa.Table:
    """Vectorized fetch-as-join (J5): probe the sorted url_hash index
    with ``searchsorted`` (no per-row Python), take the matching page
    rows; misses are the 404 path."""
    hashes = popped["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    n = popped.num_rows
    if corpus is None or len(sorted_hashes) == 0:
        found = np.zeros(n, dtype=bool)
        rows = np.zeros(n, dtype=np.int64)
    else:
        idx = np.searchsorted(sorted_hashes, hashes)
        idx_c = np.minimum(idx, len(sorted_hashes) - 1)
        found = sorted_hashes[idx_c] == hashes
        rows = perm[idx_c]
    status = pa.array(np.where(found, 200, 404).astype(np.int16))
    out = popped.append_column("status", status)
    if not found.any():
        return (out.append_column("html", pa.nulls(n, pa.binary()))
                   .append_column("lang", pa.nulls(n, pa.string()))
                   .append_column("warc_ts", pa.nulls(n, pa.timestamp("us"))))
    take = pa.array(np.where(found, rows, None))
    page_rows = corpus.take(take)
    return (out.append_column("html", page_rows["html"])
               .append_column("lang", page_rows["lang"])
               .append_column("warc_ts", page_rows["warc_ts"]))

def prepare_sharded_pages(pages_path: str | list, out_dir: str,
                          n_shards: int) -> str:
    """One-time corpus indexing: canonicalize + hash every url, split
    rows into ``shard-xxxxx.parquet`` by ``url_hash % n_shards``
    (idempotent via meta.json). Accepts one parquet file or a list of
    part files (multi-part fixtures — scale16 — stream part after
    part into the same shard writers). One streaming driver pass over
    the row groups; at 100 TB this is a Ray Data ``map_batches`` +
    partitioned ``write_parquet`` job with the same layout."""
    import json
    import os
    paths = [pages_path] if isinstance(pages_path, str) else list(pages_path)
    meta_path = os.path.join(out_dir, "meta.json")
    if os.path.exists(meta_path):
        if json.load(open(meta_path))["n_shards"] == n_shards:
            _ensure_ipc_sidecars(out_dir, n_shards)
            return out_dir
    os.makedirs(out_dir, exist_ok=True)
    writers: list[pq.ParquetWriter | None] = [None] * n_shards
    try:
        for path in paths:
            pf = pq.ParquetFile(path)
            for rg in range(pf.num_row_groups):
                t = pf.read_row_group(rg, columns=FETCH_COLS)
                urls = [canonicalize(u) for u in t["url"].to_pylist()]
                hashes = np.array(hash64_many(urls), dtype=np.uint64)
                t = (t.set_column(t.schema.get_field_index("url"), "url",
                                  pa.array(urls, pa.string()))
                      .append_column("url_hash",
                                     pa.array(hashes, pa.uint64())))
                shard = (hashes % np.uint64(n_shards)).astype(np.int64)
                for s in range(n_shards):
                    mask = shard == s
                    if not mask.any():
                        continue
                    part = t.filter(pa.array(mask))
                    if writers[s] is None:
                        writers[s] = pq.ParquetWriter(
                            os.path.join(out_dir, f"shard-{s:05d}.parquet"),
                            part.schema)
                    writers[s].write_table(part)
    finally:
        for w in writers:
            if w is not None:
                w.close()
    for s in range(n_shards):            # empty shards still need a file
        p = os.path.join(out_dir, f"shard-{s:05d}.parquet")
        if not os.path.exists(p):
            empty = pq.ParquetFile(paths[0]).schema_arrow
            sch = pa.schema(
                [empty.field(c) for c in FETCH_COLS]
                + [pa.field("url_hash", pa.uint64())])
            pq.write_table(sch.empty_table(), p)
    with open(meta_path, "w") as f:
        json.dump({"n_shards": n_shards}, f)
    _ensure_ipc_sidecars(out_dir, n_shards)
    return out_dir


def _ensure_ipc_sidecars(out_dir: str, n_shards: int) -> None:
    """Write a ``shard-xxxxx.arrow`` (uncompressed Arrow IPC file)
    next to each shard parquet if missing — the memory-mappable form
    :meth:`PageStore.load` prefers. Idempotent; written atomically
    (tmp + rename) so a killed prep never leaves a truncated file
    that a later load would map."""
    import os
    for s in range(n_shards):
        pq_path = os.path.join(out_dir, f"shard-{s:05d}.parquet")
        ipc_path = os.path.join(out_dir, f"shard-{s:05d}.arrow")
        if os.path.exists(ipc_path) or not os.path.exists(pq_path):
            continue
        t = pq.read_table(pq_path)
        tmp = ipc_path + ".tmp"
        with pa.OSFile(tmp, "wb") as sink, \
                pa.ipc.new_file(sink, t.schema) as w:
            w.write_table(t)
        os.rename(tmp, ipc_path)


def build_page_stores(pages_path: str, n_shards: int) -> list:
    """Spin up the shard pool; each shard loads its slice in parallel."""
    stores = [PageStore.options(max_concurrency=1).remote(i, n_shards)
              for i in range(n_shards)]
    ray.get([s.load.remote(pages_path) for s in stores])
    return stores


def fetch_popped(stores: list, popped: pa.Table) -> pa.Table:
    """Route a popped batch to page-store shards and concat the joins
    (fetch-only path, used by tests)."""
    n = len(stores)
    hashes = popped["url_hash"].to_numpy(zero_copy_only=False)
    shard = (hashes % np.uint64(n)).astype(np.int64)
    refs = []
    for s in range(n):
        mask = shard == s
        if mask.any():
            refs.append(stores[s].fetch.remote(pack(popped.filter(pa.array(mask)))))
    parts = ray.get(refs)
    return pa.concat_tables(parts) if parts else popped.slice(0, 0)
