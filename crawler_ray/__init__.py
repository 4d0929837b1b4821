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
