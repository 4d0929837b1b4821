"""Parse + extract batch transform (the crawl's hot stage).

One vectorized-over-the-batch function replaces the reference's ~100
per-DPA ``get_docs_*`` BeautifulSoup loops (census in SURVEY §2.9):
for each fetched page it produces

- the byte-stable extracted ``text`` (M7 contract in
  :mod:`crawler_ray.extract`),
- document fields (title = h1 line, release_date from the
  ``Released`` meta line, ``doc_hash = md5(title)`` — ``austria:99``,
  composite key ``doc_hash-date`` — ``denmark:135-140``),
- discovery candidates as list columns (listing rows date-filtered
  per M5 *before* scheduling — the reference skips the fetch of
  out-of-window docs; next-page link; detail out-links), already
  canonicalized and hashed for the seen-shard routing.

The per-page work (HTML parse) is irreducibly per-row; everything
around it (date parsing, hashing, filtering, arrow assembly) is
column-at-a-time. Used identically by
``pipelines/crawl.py`` (wave loop) and ``pipelines/extract.py``
(streaming corpus extraction) — a callable class so regex/dispatch
setup happens once per actor/worker, not per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from crawler_ray.extract import parse_page
from crawler_ray.functions.dates import (GDPR_DATE, PINNED_NOW,
                                         parse_date_multi)
from crawler_ray.functions.hashing import md5_hex
from crawler_ray.urlnorm import (canonicalize, hash64, hosts_of_array,
                                 join_url)

__all__ = ["ParseStage", "PARSED_SCHEMA", "binary_row_views",
           "binary_views_at"]


def binary_views_at(col, rows: "np.ndarray") -> list:
    """Zero-copy ``memoryview`` of a binary column's value at each of
    ``rows`` (int64 indices into the column; -1 → ``None``). The
    fetch-indices crawl path uses this to read page html straight out
    of the single plasma-resident corpus shard — no ``take``, no
    joined-table materialization, no bytes objects. Chunked columns
    are handled WITHOUT ``combine_chunks`` (which would copy the
    whole corpus)."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    starts = np.zeros(len(chunks) + 1, dtype=np.int64)
    metas = []
    for k, ch in enumerate(chunks):
        starts[k + 1] = starts[k] + len(ch)
        bufs = ch.buffers()
        wide = pa.types.is_large_binary(ch.type) \
            or pa.types.is_large_string(ch.type)
        off = np.frombuffer(bufs[1], np.int64 if wide else np.int32)[
            ch.offset: ch.offset + len(ch) + 1] if bufs[1] is not None \
            else np.zeros(1, np.int64)
        data = memoryview(bufs[2]) if bufs[2] is not None \
            else memoryview(b"")
        # null rows must surface as None (the 404/"missing" path),
        # not as b"" views — a null-html corpus row would otherwise
        # parse as kind="empty" in indices mode but "missing" in rows
        # mode, breaking the fetch-mode equivalence contract
        valid = ch.is_valid().to_numpy(zero_copy_only=False) \
            if ch.null_count else None
        metas.append((off, data, valid))
    rows = np.asarray(rows, dtype=np.int64)
    ci = np.searchsorted(starts, rows, side="right") - 1
    out: list = []
    for r, c in zip(rows.tolist(), ci.tolist()):
        if r < 0:
            out.append(None)
            continue
        off, data, valid = metas[c]
        local = r - starts[c]
        if valid is not None and not valid[local]:
            out.append(None)
            continue
        out.append(data[off[local]:off[local + 1]])
    return out


def binary_row_views(col) -> list:
    """Per-row ZERO-COPY ``memoryview`` slices of a binary column's
    Arrow data buffers (``None`` for null rows).

    ``to_pylist()`` on a binary column materializes a Python ``bytes``
    copy of every payload — for the crawl's html column that is one
    extra full pass of the corpus through the memory bus per wave,
    and the bus is the measured scaling ceiling (BASELINE.md hw
    control). The views decode straight into ``str`` inside
    :func:`crawler_ray.extract.parse_page` instead."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    out: list = []
    for ch in chunks:
        n = len(ch)
        if n == 0:
            continue
        bufs = ch.buffers()
        wide = pa.types.is_large_binary(ch.type) \
            or pa.types.is_large_string(ch.type)
        off = np.frombuffer(bufs[1], np.int64 if wide else np.int32)[
            ch.offset: ch.offset + n + 1]
        data = memoryview(bufs[2]) if bufs[2] is not None \
            else memoryview(b"")
        if ch.null_count:
            valid = ch.is_valid().to_numpy(zero_copy_only=False)
            out.extend(
                data[off[i]:off[i + 1]] if valid[i] else None
                for i in range(n))
        else:
            out.extend(data[off[i]:off[i + 1]] for i in range(n))
    return out

PARSED_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("url_hash", pa.uint64()),
    ("host", pa.string()),
    ("depth", pa.int32()),
    ("parent_order", pa.int64()),
    ("dom_idx", pa.int32()),
    ("pop_rank", pa.int64()),
    ("wave", pa.int32()),
    ("window", pa.int32()),
    ("status", pa.int16()),
    ("kind", pa.string()),
    ("lang", pa.string()),
    ("title", pa.string()),
    ("release_date", pa.date32()),
    ("doc_hash", pa.string()),
    ("doc_key", pa.string()),
    ("doc_ok", pa.bool_()),
    ("text", pa.large_string()),
    ("n_date_filtered", pa.int32()),
    ("link_url", pa.list_(pa.string())),
    ("link_hash", pa.list_(pa.uint64())),
    ("link_dom", pa.list_(pa.int32())),
])


class ParseStage:
    """Callable-class batch transform (actor-pool friendly).

    Per-source dispatch: each page's host selects a
    :class:`~crawler_ray.sources.registry.SourceSpec`; its
    ``page_parser`` / ``text_extractor`` replace the default contract
    (the engine's version of the reference's 28-way scraper dispatch,
    ``gdprCrawler.py:124-207``). Dispatch state is resolved once per
    actor here in ``__init__``."""

    def __init__(self, now=PINNED_NOW, registry=None):
        from crawler_ray.sources.registry import _REGISTRY, spec_for_host
        self.now = now
        self.margin = now - GDPR_DATE
        self.hi = now + self.margin
        # snapshot the driver-side registry at construction: the
        # module-level _REGISTRY is NOT replayed in Ray worker
        # processes, so reading it lazily in __call__ would silently
        # fall back to the default spec for every custom source
        self.registry = dict(_REGISTRY) if registry is None else registry
        self._spec_for_host = spec_for_host

    def _in_window(self, d) -> bool:
        return GDPR_DATE <= d <= self.hi

    def __call__(self, batch: pa.Table,
                 html_views: list | None = None) -> pa.Table:
        n = batch.num_rows
        urls = batch["url"].to_pylist()
        statuses = batch["status"].to_pylist() if "status" in batch.column_names \
            else [200] * n
        # zero-copy row views; rows routed to a CUSTOM spec parser are
        # materialized to bytes below (the injected parsers hold the
        # bytes contract), the default contract decodes the view.
        # ``html_views`` lets the fetch-indices crawl path pass views
        # straight into the plasma corpus instead of an html column.
        htmls = binary_row_views(batch["html"]) if html_views is None \
            else html_views
        if "host" in batch.column_names:
            hosts = batch["host"].to_pylist()
        else:
            hosts = hosts_of_array(batch["url"])
        kinds, titles, dates, doc_hashes, doc_keys, doc_oks = [], [], [], [], [], []
        texts, n_filtered = [], []
        l_urls, l_hashes, l_doms = [], [], []
        for url, status, html, host in zip(urls, statuses, htmls, hosts):
            if status != 200 or html is None:
                kinds.append("missing"); titles.append(None); dates.append(None)
                doc_hashes.append(None); doc_keys.append(None); doc_oks.append(False)
                texts.append(""); n_filtered.append(0)
                l_urls.append([]); l_hashes.append([]); l_doms.append([])
                continue
            spec = self._spec_for_host(host, self.registry)
            if spec.page_parser is None and spec.text_extractor is None:
                page = parse_page(html)       # decodes the view directly
            else:
                # injected spec parsers keep the bytes contract
                raw = bytes(html) if isinstance(html, memoryview) else html
                page = (spec.page_parser or parse_page)(raw)
                if spec.text_extractor is not None:
                    page.text = spec.text_extractor(raw)
            kinds.append(page.kind)
            texts.append(page.text)
            # --- discovery candidates (oracle rules 4/7) ---
            cand_urls, cand_doms = [], []
            filtered = 0
            di = 0
            for _t, date_str, href in page.results:
                d = parse_date_multi(date_str)
                if d is not None and not self._in_window(d):
                    filtered += 1
                    di += 1
                    continue
                cand_urls.append(canonicalize(join_url(url, href)))
                cand_doms.append(di)
                di += 1
            if page.next_href:
                cand_urls.append(canonicalize(join_url(url, page.next_href)))
                cand_doms.append(di)
                di += 1
            for link in page.out_links:
                cand_urls.append(canonicalize(join_url(url, link)))
                cand_doms.append(di)
                di += 1
            l_urls.append(cand_urls)
            l_hashes.append([hash64(u) for u in cand_urls])
            l_doms.append(cand_doms)
            # --- document emission (oracle rule 8) ---
            title = rel = None
            ok = False
            if page.kind == "detail":
                lines = page.text.split("\n")
                title = lines[0] if lines else ""
                date_str = ""
                if len(lines) > 1 and lines[1].startswith("Released "):
                    date_str = lines[1][len("Released "):]
                rel = parse_date_multi(date_str)
                ok = rel is not None and self._in_window(rel)
                if rel is not None and not ok:
                    filtered += 1
                if rel is None:
                    filtered += 1          # NoDate detail → no doc (metric)
            titles.append(title)
            dates.append(rel if ok else None)
            dh = md5_hex(title) if ok else None
            doc_hashes.append(dh)
            # composite key: hash-date (denmark:135-140), with an
            # optional source-specific middle component
            # (united_kingdom:386-390 — hash-noticeType-date)
            if ok:
                mid = f"{page.key_extra}-" if page.key_extra else ""
                doc_keys.append(f"{dh}-{mid}{rel.isoformat()}")
            else:
                doc_keys.append(None)
            doc_oks.append(ok)
            n_filtered.append(filtered)

        def col(name):
            if name in batch.column_names:
                return batch[name]
            default = {"pop_rank": pa.int64(), "wave": pa.int32(),
                       "window": pa.int32(), "depth": pa.int32(),
                       "parent_order": pa.int64(), "dom_idx": pa.int32(),
                       "url_hash": pa.uint64(), "host": pa.string(),
                       "lang": pa.string(), "status": pa.int16()}[name]
            return pa.nulls(n, default)

        return pa.table({
            "url": batch["url"],
            "url_hash": col("url_hash"),
            "host": col("host"),
            "depth": col("depth"),
            "parent_order": col("parent_order"),
            "dom_idx": col("dom_idx"),
            "pop_rank": col("pop_rank"),
            "wave": col("wave"),
            "window": col("window"),
            "status": pa.array(statuses, pa.int16())
            if "status" not in batch.column_names else batch["status"],
            "kind": pa.array(kinds, pa.string()),
            "lang": col("lang"),
            "title": pa.array(titles, pa.string()),
            "release_date": pa.array(dates, pa.date32()),
            "doc_hash": pa.array(doc_hashes, pa.string()),
            "doc_key": pa.array(doc_keys, pa.string()),
            "doc_ok": pa.array(doc_oks, pa.bool_()),
            "text": pa.array(texts, pa.large_string()),
            "n_date_filtered": pa.array(n_filtered, pa.int32()),
            "link_url": pa.array(l_urls, pa.list_(pa.string())),
            "link_hash": pa.array(l_hashes, pa.list_(pa.uint64())),
            "link_dom": pa.array(l_doms, pa.list_(pa.int32())),
        })
