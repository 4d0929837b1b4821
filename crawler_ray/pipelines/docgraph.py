"""Crawl-engine correctness query over the driver's ``documents`` table.

Builds a deterministic synthetic site from the sf documents — one
detail page per document, link edges defined by pure arithmetic on
``doc_id`` — runs the REAL crawl engine (sharded frontier / seen /
politeness actors, ``pipelines/crawl.py``) over it, and returns the
set of reached pages with their extracted text. Because the edge rule
and the extraction contract are both expressible in SQL, the DuckDB
oracle checks, through the driver's hash gate:

- the crawl's final URL-seen set == the BFS closure of the link graph
  (recursive CTE), i.e. frontier + dedup + scheduling correctness;
- **byte-identical extracted text per url** (input_hint invariant):
  the page HTML wraps ``documents.text`` and the engine's extractor
  must return it exactly.

Site shape (all derived from doc_id arithmetic; N = row count):

- url(i)  = ``https://h<i mod 16>.docs.example/doc/<i>``  (16 hosts)
- edges   = i → (7·i + 3) mod N  and  i → (13·i + 5) mod N,
            kept only if the target document has ``n_chars > 200``
            (a data-dependent pruning rule the oracle reproduces)
- seeds   = doc_id 0..4
- out-links are rendered OUTSIDE the content container so link anchor
  text never contaminates the extracted text.
"""

from __future__ import annotations

import hashlib
import html as _html
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from crawler_ray.pipelines.crawl import CrawlConfig, run_crawl

__all__ = ["build_site", "crawl_reachable", "CRAWL_REACHABLE_SQL"]

N_HOSTS = 16
N_SEEDS = 5
MIN_TARGET_CHARS = 200

#: the edges/reach recursive CTE pair — ONE definition of "reachable"
#: shared (spliced) by every oracle over the doc-graph site, so the
#: link formulas can never drift between the reachability oracle and
#: composed oracles like curation's (same convention as the shared
#: components CTE in __ray_entry__'s dedup_canonical oracle)
REACH_CTES = f"""edges AS (
  SELECT d.doc_id AS src, e.doc_id AS dst
  FROM documents d JOIN documents e
    ON e.doc_id = (d.doc_id * 7 + 3) % (SELECT count(*) FROM documents)
  WHERE e.n_chars > {MIN_TARGET_CHARS}
  UNION ALL
  SELECT d.doc_id, e.doc_id
  FROM documents d JOIN documents e
    ON e.doc_id = (d.doc_id * 13 + 5) % (SELECT count(*) FROM documents)
  WHERE e.n_chars > {MIN_TARGET_CHARS}
), reach AS (
  SELECT doc_id FROM documents WHERE doc_id < {N_SEEDS}
  UNION
  SELECT edges.dst FROM reach JOIN edges ON edges.src = reach.doc_id
)"""

CRAWL_REACHABLE_SQL = f"""
WITH RECURSIVE {REACH_CTES}
SELECT 'https://h' || (doc_id % {N_HOSTS}) || '.docs.example/doc/' || doc_id
         AS url,
       text
FROM reach JOIN documents USING (doc_id)
"""


def _url(i: int) -> str:
    return f"https://h{i % N_HOSTS}.docs.example/doc/{i}"


def build_site(sf_dir: str, out_dir: str) -> str:
    """Render pages/seeds/robots Parquet for the doc-graph site
    (idempotent via _DONE marker)."""
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "n_chars"])
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    n_chars = docs["n_chars"].to_pylist()
    n = len(ids)
    big = {i for i, c in zip(ids, n_chars) if c > MIN_TARGET_CHARS}

    urls, htmls, out_texts = [], [], []
    for i, text in zip(ids, texts):
        targets = [t for t in ((7 * i + 3) % n, (13 * i + 5) % n) if t in big]
        links = "".join(
            f'<p class="related"><a class="outlink" href="{_url(t)}">'
            f"Related {k}</a></p>" for k, t in enumerate(targets))
        # links sit OUTSIDE the content div: collected as out_links by
        # the parser, invisible to the extracted text
        page = ("<html><body>"
                f'<div class="content"><p>{_html.escape(text)}</p></div>'
                f'<div class="nav">{links}</div>'
                "</body></html>")
        urls.append(_url(i))
        htmls.append(page.encode("utf-8"))
        out_texts.append(text)

    ts = pa.array([1_600_000_000_000_000 + i for i in range(n)],
                  pa.timestamp("us"))
    pq.write_table(pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": ts,
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(out_texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
    }), os.path.join(out_dir, "pages.parquet"))
    pq.write_table(pa.table({
        "url": pa.array([_url(i) for i in range(min(N_SEEDS, n))]),
        "source": pa.array(["docgraph"] * min(N_SEEDS, n)),
        "doc_type": pa.array(["Decisions"] * min(N_SEEDS, n)),
        "seed_rank": pa.array(list(range(min(N_SEEDS, n))), pa.int32()),
    }), os.path.join(out_dir, "seeds.parquet"))
    hosts = [f"h{k}.docs.example" for k in range(N_HOSTS)]
    pq.write_table(pa.table({
        "host": pa.array(hosts),
        "disallow_prefixes": pa.array([[] for _ in hosts],
                                      pa.list_(pa.string())),
        "crawl_delay_ms": pa.array([0] * len(hosts), pa.int32()),
    }), os.path.join(out_dir, "robots.parquet"))
    with open(marker, "w") as f:
        f.write("ok\n")
    return out_dir


def crawl_reachable(sf_dir: str, scratch_root: str = "/tmp/crawler_ray_docgraph"
                    ) -> "ray.data.Dataset":
    """Run the crawl engine over the doc-graph site; return
    ``(url, text)`` for every fetched page. Fresh crawl per call into
    a per-sf scratch dir (site build is cached)."""
    import shutil

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    site = build_site(sf_dir, os.path.join(scratch_root, f"site_{tag}"))
    out = os.path.join(scratch_root, f"crawl_{tag}")
    if os.path.exists(out):
        shutil.rmtree(out)
    run_crawl(os.path.join(site, "pages.parquet"),
              os.path.join(site, "seeds.parquet"),
              os.path.join(site, "robots.parquet"),
              out, CrawlConfig())
    return (ray.data.read_parquet(os.path.join(out, "parsed"))
            .select_columns(["url", "text"]))


def crawl_reachable_dataset(sf_dir: str,
                            scratch_root: str = "/tmp/crawler_ray_docgraph"
                            ) -> "ray.data.Dataset":
    """The same reachability crawl expressed PURELY in the Dataset API
    — no custom actors: per BFS level, the frontier inner-joins the
    parsed page table (fetch-as-join J5 via ``Dataset.join``), link
    candidates explode and dedup, and a ``left_anti`` join against the
    accumulated seen set admits only new URLs (J6). Politeness/priority
    need the stateful engine; plain reachability does not — this is
    the "composition of map_batches + joins" tier of the custom-
    operator ladder, checked by the same recursive-CTE oracle as
    :func:`crawl_reachable`.

    Each level materializes (iterative lineage would otherwise be
    re-executed); the whole loop moves only (url) keys + per-level
    fetched rows. Cost shape: wall time is dominated by per-level
    FIXED costs (two Dataset.join operator launches per BFS level),
    so deep chain graphs pay ~0.5 s x depth regardless of size — at
    sf0.01 (100+ levels) that is ~45 s where the actor engine takes
    ~5 s. This tier exists to prove the pure-Dataset composition is
    semantically sufficient; depth-bound production crawls belong on
    :func:`crawl_reachable`'s actor engine."""
    import pyarrow.compute as pc_

    from crawler_ray.sources.registry import _REGISTRY
    from crawler_ray.stages.parse import ParseStage

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    site = build_site(sf_dir, os.path.join(scratch_root, f"site_{tag}"))

    # parse the whole corpus ONCE (streaming map_batches), split into
    # two flat tables: (url, text) and the exploded edge list
    # (url, link) — joins cannot carry list columns
    parsed = (ray.data.read_parquet(os.path.join(site, "pages.parquet"),
                                    columns=["url", "html"])
              .map_batches(ParseStage, batch_format="pyarrow",
                           # snapshot the driver's source registry —
                           # actor __init__ runs on workers where
                           # module-level register() never happened
                           fn_constructor_kwargs={
                               "registry": dict(_REGISTRY)},
                           concurrency=(1, 4)))
    page_text = parsed.map_batches(
        lambda b: b.select(["url", "text"]),
        batch_format="pyarrow").materialize()

    def explode(batch: pa.Table) -> pa.Table:
        lengths = pc_.list_value_length(batch["link_url"]).to_numpy(
            zero_copy_only=False)
        import numpy as np
        src = batch["url"].take(pa.array(
            np.repeat(np.arange(batch.num_rows), lengths)))
        return pa.table({"url": src,
                         "link": pc_.list_flatten(batch["link_url"])})

    edges = parsed.map_batches(explode, batch_format="pyarrow")                   .materialize()

    seeds = ray.data.read_parquet(os.path.join(site, "seeds.parquet"),
                                  columns=["url"]).materialize()
    seen = seeds
    frontier = seeds
    while True:
        # ONE materialize per level: hop → project → dedup → anti-join
        # in a single lineage. num_partitions=1 because per-level key
        # sets are small and the hash-join finalizer rejects empty
        # per-partition blocks (empty frontier surfaces as 0 new rows).
        new = (frontier.join(edges, "inner", num_partitions=1, on=("url",))
               .map_batches(lambda b: pa.table({"url": b["link"]}),
                            batch_format="pyarrow")
               .repartition(1)
               .map_batches(lambda df: df.drop_duplicates("url"),
                            batch_format="pandas")
               .join(seen, "left_anti", num_partitions=1, on=("url",))
               .materialize())
        if new.count() == 0:
            break
        seen = seen.union(new).materialize()
        frontier = new

    return (seen.join(page_text, "inner", num_partitions=1, on=("url",))
            .select_columns(["url", "text"]))
