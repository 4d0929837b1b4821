"""Live HTTP fetcher seam (S2's deployment path).

The sandbox crawl fetches by joining the frontier against the pages
Parquet corpus (``sources/pages.py`` — fetch-as-join). A real
deployment replaces that join with THIS stage: an actor-pool
``map_batches`` callable holding a warm HTTP session, mirroring the
repo's other environment seams (``render.browser_factory``,
``tokens.mint_fn``, ``convert.ocr_fn``) — the backend is an injected
``fetch_fn(url, timeout_s) -> (status, body | None)`` so tests drive
the stage with a deterministic fake and deployments pass an
aiohttp/requests-backed callable.

Reference behavior reproduced (docstring cites, no code copied):

- ``pygdpr/models/dpa/austria/__init__.py:55-65`` — GET with headers,
  non-200 → skip the document (here: ``status`` column + ``html``
  NULL, the same 404 path the join-based fetch emits);
- ``france/__init__.py:51-59`` — per-request timeout variant
  (``timeout_s`` ctor arg);
- the reference's ``time.sleep(...)`` between requests becomes a
  per-host minimum-interval gate INSIDE the actor.

Partitioning assumption (documented per the custom-operator rule):
politeness state is per-actor, so a host's requests must all land on
the same fetcher for the spacing to be global. Route batches with an
explicit hash-partition on ``host`` (the same key the frontier
shards by) — e.g. group the popped wave by ``crc32(host) %
n_fetchers`` before ``map_batches(FetcherStage, concurrency=
n_fetchers)``. The engine's frontier ALSO meters pops per host
(``state/frontier.py`` token buckets), so this gate is
defense-in-depth, exactly like the reference sleeping after its own
scheduler already spaced requests.
"""

from __future__ import annotations

import time
from urllib.parse import urlsplit

import pyarrow as pa

__all__ = ["FetcherStage", "FakeHttpBackend", "urllib_fetch_fn",
           "fetch_pages_live"]


def urllib_fetch_fn(url: str, timeout_s: float):
    """Default live backend: stdlib urllib (no extra deps). Returns
    ``(status, body_bytes | None)``; any transport error → (0, None)
    so the crawl's 404/skip path handles it (austria:60-65 skip
    semantics — a failed fetch never kills the wave)."""
    import urllib.error
    import urllib.request
    try:
        with urllib.request.urlopen(url, timeout=timeout_s) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:          # non-2xx with a code
        return e.code, None
    except Exception:                            # DNS/timeout/conn reset
        return 0, None


class FakeHttpBackend:
    """Deterministic test backend: serves ``url → (status, body)``
    from a dict and records ``(monotonic_ts, host, url)`` for every
    request, so tests can assert the per-host politeness spacing held
    under actor-pool concurrency. Unknown urls are 404."""

    def __init__(self, corpus: dict[str, bytes],
                 latency_s: float = 0.0) -> None:
        self.corpus = dict(corpus)
        self.latency_s = latency_s
        self.calls: list[tuple[float, str, str]] = []

    def __call__(self, url: str, timeout_s: float):
        self.calls.append((time.monotonic(), urlsplit(url).netloc, url))
        if self.latency_s:
            time.sleep(self.latency_s)
        body = self.corpus.get(url)
        return (200, body) if body is not None else (404, None)


class FetcherStage:
    """``map_batches`` callable class: ``(url, ...) → + (status,
    html)``. One warm session / politeness table per actor
    (``__init__`` once per actor, ST7); a per-host minimum interval
    is enforced between consecutive requests to the same host, and
    distinct hosts within a batch may fetch concurrently (see
    ``max_concurrency``).

    ``fetch_fn``: the injected backend (defaults to
    :func:`urllib_fetch_fn`); ``min_interval_s``: per-host spacing
    (the reference's inter-request sleep — spacing is END-to-start:
    the host timestamp is stamped when the response RETURNS, because
    the reference sleeps between requests, after each response, not
    on a start-to-start schedule); ``timeout_s``: per-request budget
    (france:51-59). ``clock``/``sleep`` are injectable for
    deterministic politeness tests.

    ``max_concurrency``: with the default 1 the batch fetches
    sequentially in row order (reference parity —
    austria:55-65 fetches documents one at a time). With >1 the batch
    is split into per-host chains and DIFFERENT hosts fetch
    concurrently on a per-actor thread pool while each host's chain
    stays sequential behind its interval gate — so wall time per
    batch ≈ the longest single-host chain, not the sum, and no host
    ever sees two in-flight requests. Threads (not asyncio) because
    the injected ``fetch_fn`` contract is a plain synchronous
    callable; an async backend can still be wrapped. Politeness state
    stays valid because a host never spans actors (module docstring)
    and never spans threads within a call (one chain per host)."""

    def __init__(self, fetch_fn=None, timeout_s: float = 30.0,
                 min_interval_s: float = 0.0,
                 url_col: str = "url",
                 max_concurrency: int = 1,
                 clock=time.monotonic, sleep=time.sleep) -> None:
        self._fetch = fetch_fn or urllib_fetch_fn
        self.timeout_s = timeout_s
        self.min_interval_s = min_interval_s
        self.url_col = url_col
        self.max_concurrency = max(1, int(max_concurrency))
        self._clock, self._sleep = clock, sleep
        self._last: dict[str, float] = {}        # host → last response ts
        self._pool = None                        # lazy, once per actor
        self.requests_made = 0                   # lifetime, for tests

    def _fetch_one(self, url: str, host: str):
        if self.min_interval_s > 0:
            last = self._last.get(host)
            if last is not None:
                wait = last + self.min_interval_s - self._clock()
                if wait > 0:
                    self._sleep(wait)
        status, body = self._fetch(url, self.timeout_s)
        # stamp AFTER the response: end-to-start spacing, matching the
        # reference's sleep-between-requests (a slow response still
        # earns the host its full idle gap before the next request)
        self._last[host] = self._clock()
        return status, body

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch[self.url_col].to_pylist()
        n = len(urls)
        statuses, bodies = [0] * n, [None] * n

        def run_chain(host, idxs):
            for i in idxs:
                status, body = self._fetch_one(urls[i], host)
                statuses[i] = status
                bodies[i] = body if status == 200 else None

        by_host: dict[str, list[int]] = {}
        for i, u in enumerate(urls):
            by_host.setdefault(urlsplit(u).netloc, []).append(i)

        if self.max_concurrency > 1 and len(by_host) > 1:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor
                self._pool = ThreadPoolExecutor(
                    max_workers=self.max_concurrency)
            for f in [self._pool.submit(run_chain, h, idxs)
                      for h, idxs in by_host.items()]:
                f.result()
        else:
            # sequential parity path: strict batch row order
            for i, u in enumerate(urls):
                run_chain(urlsplit(u).netloc, [i])
        self.requests_made += n
        return (batch
                .append_column("status", pa.array(statuses, pa.int16()))
                .append_column("html", pa.array(bodies, pa.binary())))


def fetch_pages_live(ds, fetch_fn=None, n_fetchers: int = 4,
                     timeout_s: float = 30.0,
                     min_interval_s: float = 0.0,
                     url_col: str = "url",
                     max_concurrency: int = 1):
    """Dataset-level live fetch: hash-partition on host (so each
    host's politeness state lives in exactly one actor — see module
    docstring) then actor-pool ``map_batches``. The host routing uses
    the coarse-group pattern: a ``groupby`` on ``crc32(host) %
    n_fetchers`` shuffles only (url, carry-cols) rows, and each group
    block lands in one ``FetcherStage`` call."""
    from zlib import crc32

    import numpy as np

    def route(batch: pa.Table) -> pa.Table:
        hosts = [urlsplit(u).netloc for u in batch[url_col].to_pylist()]
        uniq = sorted(set(hosts))
        shard = {h: crc32(h.encode()) % n_fetchers for h in uniq}
        return batch.append_column("_fetch_shard", pa.array(
            np.array([shard[h] for h in hosts], np.int64)))

    stage = FetcherStage(fetch_fn, timeout_s=timeout_s,
                         min_interval_s=min_interval_s, url_col=url_col,
                         max_concurrency=max_concurrency)

    def fetch_group(g: pa.Table) -> pa.Table:
        # one shard == one group == one task == one stage copy, and a
        # host never spans shards — so the per-host spacing inside
        # this copy is globally valid for the pass
        return stage(g.drop_columns(["_fetch_shard"]))

    # schema-pinned grouped apply (dedup._grouped_apply), NOT raw
    # map_groups: empty sort partitions would otherwise emit
    # zero-column blocks with divergent schemas — the documented
    # hazard the repo's grouped stages all route around
    from crawler_ray.dedup import _grouped_apply
    s = ds.schema()
    in_fields = [(n, t) for n, t in zip(s.names, s.types)]
    empty = pa.table({
        **{n: pa.array([], t) for n, t in in_fields},
        "status": pa.array([], pa.int16()),
        "html": pa.array([], pa.binary()),
    })
    return _grouped_apply(ds.map_batches(route, batch_format="pyarrow"),
                          "_fetch_shard", fetch_group, empty=empty,
                          group_format="pyarrow")
