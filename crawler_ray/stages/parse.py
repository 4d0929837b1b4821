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
from crawler_ray.urlnorm import canonicalize, hash64, join_url

__all__ = ["ParseStage", "PARSED_SCHEMA"]

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

    def __call__(self, batch: pa.Table) -> pa.Table:
        from crawler_ray.urlnorm import host_of
        n = batch.num_rows
        urls = batch["url"].to_pylist()
        statuses = batch["status"].to_pylist() if "status" in batch.column_names \
            else [200] * n
        htmls = batch["html"].to_pylist()
        hosts = (batch["host"].to_pylist() if "host" in batch.column_names
                 else [host_of(u) for u in urls])
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
            page = (spec.page_parser or parse_page)(html)
            if spec.text_extractor is not None:
                page.text = spec.text_extractor(html)
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
