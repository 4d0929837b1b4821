"""crawler_ray — a Ray-Data-native URL-frontier + fetch-scheduler engine.

A from-scratch reimplementation of the query / data-processing
capabilities of GDPRxiv/crawler (reference at /root/reference), built
Ray-Data-first:

- ``ray.data.Dataset`` pipelines over zero-copy Arrow batches for every
  per-record transform (parse, extract, enrich, dedup, score);
- actor pools / sharded actors only for genuinely stateful stages
  (URL-seen bloom shards, frontier priority heaps + politeness token
  buckets + robots cache, page-store fetch shards);
- explicit hash-partitioning by ``url_hash`` / ``host`` for every
  shuffle, with skew handling documented per stage;
- per-epoch Parquet checkpoints (frontier, seen shards, metrics,
  lineage) with an atomic commit marker so a killed crawl resumes
  exactly.

Nothing here calls ``ray.init``/``ray.shutdown`` — sessions are owned
by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"


def suppress_empty_schema_divergence_warning() -> None:
    """Drop Ray Data's "RefBundle with a different schema … new
    schema: ." warning — ONLY the empty-new-schema case.

    Ray's all-to-all operators (sort/groupby) emit schema-LESS empty
    blocks for empty reduce partitions (their own workaround comment:
    ``plan_udf_map_op.py`` — "some all-to-all operators output empty
    blocks with no schema"); those blocks bypass every downstream
    ``map_batches`` UDF (empty blocks are forwarded without calling
    the UDF), so no user code can normalize them. Every such
    divergence in this repo was verified to be typed-schema vs EMPTY
    schema — never two differing typed schemas, which this filter
    deliberately keeps loud. Callers that own a session (bench.py,
    the test fixture) install it; the library never touches global
    logging on import."""
    import logging

    class _Filter(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            return not ("different schema" in msg
                        and "new schema: ." in msg)

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_Filter())
