"""Authenticated API-document fetch pipeline (France shape, J5+ST5).

The reference's France scraper (``pygdpr/models/dpa/france/
__init__.py:61-134``) walks the CNIL Drupal listing with plain GETs
but pulls every DOCUMENT through the authenticated Legifrance consult
API — one OAuth mint per run, ``Bearer`` header per call, 5-second
sleep per document. The engine expresses that as two composable
pieces:

- listing discovery runs through the ordinary crawl (the France
  ``SourceSpec`` page_parser rewrites each result row to a consult-API
  URL carrying the extracted ``textId``);
- this pipeline then fetches those API URLs with a
  :class:`~crawler_ray.sources.tokens.BearerFetchStage` ACTOR POOL —
  the broker mints once, workers cache the token locally, fetches run
  ``concurrency``-wide instead of the reference's serial
  sleep-per-document loop — and parses each JSON payload with the
  spec's ``page_parser`` into the engine's document contract
  (title / release_date / doc_hash / composite doc_key / text).
"""

from __future__ import annotations

import pyarrow as pa

from crawler_ray.functions.dates import parse_date_multi
from crawler_ray.functions.hashing import composite_doc_key, md5_hex


def fetch_api_documents(urls: "ray.data.Dataset", spec, broker,
                        fetch_fn=None, concurrency: int = 4,
                        batch_size: int = 64) -> "ray.data.Dataset":
    """``urls`` (one ``url`` string column of consult-API URLs, e.g.
    the crawl log filtered to the spec's API host) → document rows.

    ``fetch_fn(url, headers) -> str`` performs the authenticated call
    (deployments pass a requests-backed callable; tests pass a fake
    that ASSERTS the bearer header). The spec's ``page_parser`` turns
    each payload into a detail page; rows whose payload has no
    ``text`` key are dropped (france:114-115)."""
    from crawler_ray.sources.tokens import BearerFetchStage

    fetched = urls.map_batches(
        BearerFetchStage, batch_format="pyarrow",
        fn_constructor_kwargs={"broker": broker, "fetch_fn": fetch_fn},
        batch_size=batch_size, concurrency=concurrency, num_cpus=1)

    parser = spec.page_parser

    def to_docs(batch: pa.Table) -> pa.Table:
        urls_, titles, dates, hashes, keys, texts = [], [], [], [], [], []
        for url, body in zip(batch["url"].to_pylist(),
                             batch["body"].to_pylist()):
            page = parser(body.encode("utf-8"))
            if page.kind != "detail":
                continue                              # france:114-115
            lines = page.text.split("\n")
            title = lines[0] if lines else ""
            date_str = lines[1][len("Released "):] \
                if len(lines) > 1 and lines[1].startswith("Released ") else ""
            rel = parse_date_multi(date_str)
            dh = md5_hex(title)                       # france:121
            urls_.append(url)
            titles.append(title)
            dates.append(rel)
            hashes.append(dh)
            keys.append(composite_doc_key(
                dh, rel.isoformat() if rel else None))
            texts.append("\n".join(lines[2:]))
        return pa.table({
            "url": pa.array(urls_, pa.string()),
            "title": pa.array(titles, pa.string()),
            "release_date": pa.array(dates, pa.date32()),
            "doc_hash": pa.array(hashes, pa.string()),
            "doc_key": pa.array(keys, pa.string()),
            "text": pa.array(texts, pa.large_string()),
        })

    return fetched.map_batches(to_docs, batch_format="pyarrow")
