"""Fetch-as-join: the sharded page store / fetch+parse actor pool.

The sandbox has no network, so the reference's live HTTP / Selenium
fetches (``austria/__init__.py:55-65``, ``denmark/__init__.py:44-75``)
become a distributed hash-join of the frontier's popped URLs against
the ``pages`` Parquet corpus (SURVEY §2.4 J5). ``PageStore`` shard
``i`` owns the rows with ``url_hash % n_shards == i`` and probes an
in-memory url_hash→row index — a semi-join where frontier rows
without a page row are the 404 path (``austria:60-65`` skip
semantics).

This actor pool is also the crawl's **fetch+parse stage**: the parse
(:class:`~crawler_ray.stages.parse.ParseStage`) runs inside the actor,
data-local to the fetched rows, and the stage fans its link
candidates directly out to the seen shards and writes its parsed
Parquet part — the actor-pool equivalent of
``map_batches(FetchParse, concurrency=n_shards)``, chosen over a
per-wave ``Dataset`` because the wave loop runs dozens of small
iterations where per-pipeline setup (~1s) would dominate (the
streaming-corpus variant of the same stage IS a Dataset pipeline, see
``pipelines/extract.py``). Wave protocol cost: one actor RPC per
shard per wave.

In a real deployment this pool is an aiohttp fetcher (same
``fetch_parse(batch)`` interface); the store is the sandbox stand-in
for "the web". At 100 TB the eager in-memory html would be replaced
by lazy row-group reads (index: url_hash → (file, row_group)) with an
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
        self.seen_shards: list | None = None

    def load(self, pages_path: str) -> int:
        """Read the corpus and keep this shard's rows
        (``url_hash % n_shards == shard_id``). Each shard reads the
        file independently (parallel, page-cache friendly); at 100 TB
        this becomes per-shard file listings + lazy row groups."""
        t = pq.read_table(pages_path, columns=FETCH_COLS)
        urls = [canonicalize(u) for u in t["url"].to_pylist()]
        hashes = np.array(hash64_many(urls), dtype=np.uint64)
        mine = (hashes % np.uint64(self.n_shards)) == self.shard_id
        t = (t.set_column(t.schema.get_field_index("url"), "url",
                          pa.array(urls, pa.string()))
              .append_column("url_hash", pa.array(hashes, pa.uint64()))
              .filter(pa.array(mine)))
        self.table = t
        self.index = {int(h): i for i, h in enumerate(
            t["url_hash"].to_numpy(zero_copy_only=False))}
        return t.num_rows

    def set_sinks(self, seen_shards: list) -> None:
        self.seen_shards = seen_shards

    # -- fetch-only (join) ------------------------------------------------
    def fetch(self, popped) -> pa.Table:
        """Join popped frontier rows against this shard's pages.
        Returns popped columns + ``status`` (200/404) + page columns
        (html/lang/warc_ts; nulls on 404)."""
        popped = unpack(popped)
        hashes = popped["url_hash"].to_numpy(zero_copy_only=False)
        rows = np.array([self.index.get(int(h), -1) for h in hashes],
                        dtype=np.int64)
        found = rows >= 0
        status = pa.array(np.where(found, 200, 404).astype(np.int16))
        out = popped.append_column("status", status)
        if self.table is None or not found.any():
            n = popped.num_rows
            return (out.append_column("html", pa.nulls(n, pa.binary()))
                       .append_column("lang", pa.nulls(n, pa.string()))
                       .append_column("warc_ts", pa.nulls(n, pa.timestamp("us"))))
        take = pa.array(np.where(found, rows, None))
        page_rows = self.table.take(take)
        return (out.append_column("html", page_rows["html"])
                   .append_column("lang", page_rows["lang"])
                   .append_column("warc_ts", page_rows["warc_ts"]))

    # -- fused fetch+parse (the crawl's hot stage) ------------------------
    def fetch_parse(self, popped, part_path: str, now, max_depth) -> int:
        """Fetch, parse, persist the parsed part, fan links out to the
        seen shards. Returns row count."""
        from crawler_ray.pipelines.crawl import _explode_links
        from crawler_ray.stages.parse import ParseStage

        fetched = self.fetch(popped)
        parsed = ParseStage(now)(fetched)
        pq.write_table(parsed, part_path)
        cands = _explode_links(parsed)
        if max_depth is not None:
            import pyarrow.compute as pc
            cands = cands.filter(pc.less_equal(cands["depth"], max_depth))
        if cands.num_rows and self.seen_shards:
            hashes = cands["url_hash"].to_numpy(zero_copy_only=False)
            shard = (hashes % np.uint64(len(self.seen_shards))).astype(np.int64)
            acks = []
            for s in range(len(self.seen_shards)):
                mask = shard == s
                if mask.any():
                    acks.append(self.seen_shards[s].offer.remote(
                        pack(cands.filter(pa.array(mask)))))
            ray.get(acks)
        return parsed.num_rows


def build_page_stores(pages_path: str, n_shards: int) -> list:
    """Spin up the shard pool; each shard loads its slice in parallel."""
    stores = [PageStore.options(max_concurrency=2).remote(i, n_shards)
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
