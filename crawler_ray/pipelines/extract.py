"""Streaming corpus extraction — the pure Ray-Data-Dataset face of the
engine (SURVEY §7 step 2: read → map_batches → write).

Where ``pipelines/crawl.py`` runs the *iterative* frontier protocol
(shared mutable state the Dataset API cannot express), this module is
the batch counterpart for an already-materialized page corpus: parse
every page, extract text + document fields + links with the exact same
``ParseStage`` transform, and stream the result to partitioned Parquet
— lazy, pipelined, backpressured by Ray Data's streaming executor.

Used for: re-parsing a crawl's raw corpus after extractor upgrades,
bulk document derivation from WARC-style page dumps, and as the
engine's throughput yardstick for the parse stage in isolation.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from crawler_ray.functions.dates import PINNED_NOW
from crawler_ray.stages.parse import ParseStage

__all__ = ["extract_corpus", "extracted_docs"]


def extract_corpus(pages_path: str, now=PINNED_NOW, *,
                   concurrency=(2, 8), batch_size: int = 256,
                   columns: list[str] | None = None) -> "ray.data.Dataset":
    """``pages`` Parquet → parsed Dataset (url, kind, text, doc fields,
    link lists). ParseStage is a callable class → actor pool: regex /
    dispatch setup once per actor, not per batch."""
    ds = ray.data.read_parquet(
        pages_path, columns=columns or ["url", "html", "lang", "warc_ts"])
    from crawler_ray.sources.registry import _REGISTRY
    return ds.map_batches(ParseStage, batch_format="pyarrow",
                          # driver-side registry snapshot (worker
                          # processes never saw register() calls)
                          fn_constructor_kwargs={"now": now,
                                                 "registry":
                                                 dict(_REGISTRY)},
                          batch_size=batch_size, concurrency=concurrency)


def extracted_docs(pages_path: str, out_path: str | None = None,
                   now=PINNED_NOW) -> "ray.data.Dataset":
    """End-to-end slice: corpus → in-window detail documents →
    (optionally) partitioned Parquet. Consumed streaming — no
    mid-pipeline materialization."""
    docs = (extract_corpus(pages_path, now)
            .filter(expr="doc_ok == True")
            .select_columns(["url", "host", "lang", "title", "release_date",
                             "doc_hash", "doc_key", "text"]))
    if out_path:
        docs.write_parquet(out_path)
        return ray.data.read_parquet(out_path)
    return docs
