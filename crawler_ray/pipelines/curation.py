"""Corpus-curation operators: the decisions a training-data pipeline
makes AFTER dedup/scoring — which duplicate to keep, which documents
leak benchmark text, which are degenerate repetition.

All three are SQL-expressible on the synthetic ``documents`` table, so
the driver hash-checks them end-to-end (no rows-only trust):

- :func:`dedup_canonical` — duplicate clusters → ONE kept document per
  cluster, chosen by quality (the reference's seen-set keeps the FIRST
  crawl of a title, ``gdprCrawler.py:111-118``; a training pipeline
  instead keeps the best-quality member and drops the rest).
- :func:`contamination_flags` — benchmark-substring decontamination:
  the standard train/test-leak sweep, expressed as a broadcast of the
  (small) benchmark strings into a single-pass RE2 alternation per
  batch — never a join or shuffle.
- :func:`repetition_stats` — degenerate-repetition metrics in the
  Gopher-filter family (duplicate-word fraction, top-bigram fraction);
  used as a quality gate on machine-generated / template spam.

Scale notes (100 TB): canonical selection shuffles ONLY (doc_id,
component, quality) triples — 24 B/doc — never text; its reduce is a
per-block vectorized partial argmax followed by a 64-way coarse-hash
group walk, so no single task ever holds more than one coarse bucket
of component ids. Contamination broadcasts the benchmark once via
``ray.put`` (typical benchmark suites are ≤ a few MB of strings) and
streams the corpus through one compiled RE2 scan per batch.
Repetition is embarrassingly per-document (no shuffle at all).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["dedup_canonical", "contamination_flags", "repetition_stats",
           "stratified_sample", "normalize_text",
           "default_bench_strings",
           "DOC_DECONTAMINATE_SQL", "DOC_REPETITION_SQL",
           "DOC_SAMPLE_STRATIFIED_SQL", "DOC_NORMALIZE_SQL"]


# --------------------------------------------------------------------------
# Canonical representative per duplicate cluster
# --------------------------------------------------------------------------

def dedup_canonical(docs: "ray.data.Dataset",
                    components: "ray.data.Dataset",
                    id_col: str = "doc_id") -> "ray.data.Dataset":
    """(component → keep_id): the highest-quality member of every
    duplicate cluster (ties broken by the smaller id, so the choice is
    deterministic and matches the SQL oracle's
    ``ORDER BY quality DESC, doc_id`` window).

    ``docs``: (doc_id, text) — only used to score quality;
    ``components``: (doc_id, component) from
    :func:`crawler_ray.dedup.dup_components`.

    Shuffle budget: one distributed hash join of two id-sized tables
    (component labels ⋈ quality scores), then a 64-way coarse shuffle
    of (component, doc_id, quality) triples with a vectorized run-walk
    argmax per bucket. Document text never moves.
    """
    import ray  # noqa: F401  (Dataset type only)

    from crawler_ray.functions.textops import quality_scores

    quality = (docs
               .map_batches(quality_scores, batch_format="pyarrow")
               .select_columns([id_col, "quality"]))
    joined = components.join(quality, "inner", num_partitions=8,
                             on=(id_col,))

    def partial(batch: pa.Table) -> pa.Table:
        """Per-block partial argmax: one row per component seen in the
        block — bounds the shuffle at min(block_rows, n_components)."""
        if batch.num_rows == 0:
            return pa.table({"component": pa.array([], pa.int64()),
                             "keep_id": pa.array([], pa.int64()),
                             "quality": pa.array([], pa.float64()),
                             "coarse": pa.array([], pa.int64())})
        comp = batch["component"].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        q = batch["quality"].to_numpy(zero_copy_only=False)
        # sort by (component, -quality, doc_id): the FIRST row of each
        # component run is its argmax with the deterministic tie-break
        order = np.lexsort((ids, -q, comp))
        comp_s, ids_s, q_s = comp[order], ids[order], q[order]
        first = np.ones(len(comp_s), dtype=bool)
        first[1:] = comp_s[1:] != comp_s[:-1]
        return pa.table({
            "component": pa.array(comp_s[first], pa.int64()),
            "keep_id": pa.array(ids_s[first], pa.int64()),
            "quality": pa.array(q_s[first], pa.float64()),
            "coarse": pa.array((comp_s[first] % 64).astype(np.int64),
                               pa.int64()),
        })

    from crawler_ray.dedup import _grouped_apply

    def reduce_bucket(g: pa.Table) -> pa.Table:
        comp = g["component"].to_numpy(zero_copy_only=False)
        ids = g["keep_id"].to_numpy(zero_copy_only=False)
        q = g["quality"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -q, comp))
        comp_s, ids_s = comp[order], ids[order]
        first = np.ones(len(comp_s), dtype=bool)
        first[1:] = comp_s[1:] != comp_s[:-1]
        return pa.table({
            "component": pa.array(comp_s[first], pa.int64()),
            "keep_id": pa.array(ids_s[first], pa.int64()),
        })

    empty = pa.table({"component": pa.array([], pa.int64()),
                      "keep_id": pa.array([], pa.int64())})
    partials = joined.map_batches(partial, batch_format="pyarrow")
    return _grouped_apply(partials, "coarse", reduce_bucket, empty=empty,
                          group_format="pyarrow")


# The dedup_canonical SQL oracle is assembled in __ray_entry__ — it
# splices the SHARED components CTE (the same one that hash-checks
# dedup_components) ahead of the quality-argmax window.


# --------------------------------------------------------------------------
# Benchmark decontamination
# --------------------------------------------------------------------------

#: deterministic synthetic "benchmark": a 32-char probe from every
#: 97th document (1-based substr(text, 11, 32) like the SQL oracle) —
#: stands in for a real eval set's contamination strings.
BENCH_STRIDE = 97
BENCH_OFF = 10      # 0-based start (== SQL substr(text, 11, ...))
BENCH_LEN = 32

DOC_DECONTAMINATE_SQL = f"""
WITH bench AS (
  SELECT substr(text, {BENCH_OFF + 1}, {BENCH_LEN}) AS s
  FROM documents
  WHERE doc_id % {BENCH_STRIDE} = 0
    AND length(text) >= {BENCH_OFF + BENCH_LEN}
)
SELECT d.doc_id,
       CAST(coalesce(max(CASE WHEN position(b.s IN d.text) > 0
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS contaminated
FROM documents d LEFT JOIN bench b ON TRUE
GROUP BY d.doc_id
"""
# LEFT JOIN ON TRUE (not CROSS JOIN): an EMPTY probe set must still
# yield one all-zeros row per document, matching contamination_flags
# with bench_strings=[] — a CROSS JOIN against an empty bench returns
# zero rows and would hash-mismatch the engine.


def contamination_flags(docs: "ray.data.Dataset",
                        bench_strings: list[str]
                        ) -> "ray.data.Dataset":
    """(doc_id, contaminated): 1 iff the text contains ANY benchmark
    string. The benchmark list is closed over (callers broadcast it
    once — it is eval-set-sized, not corpus-sized) and compiled into a
    single RE2 alternation, so each batch is ONE vectorized
    ``match_substring_regex`` scan — no per-string pass, no join."""
    import re as _re

    pattern = "|".join(_re.escape(s) for s in bench_strings) \
        if bench_strings else None

    def flag(batch: pa.Table) -> pa.Table:
        if pattern is None:
            hit = pa.array(np.zeros(batch.num_rows, dtype=np.int64))
        else:
            m = pc.match_substring_regex(
                pc.coalesce(batch["text"], pa.scalar("")), pattern)
            hit = pc.cast(m, pa.int64())
        return pa.table({"doc_id": batch["doc_id"], "contaminated": hit})

    return docs.map_batches(flag, batch_format="pyarrow")


def default_bench_strings(sf_dir: str) -> list[str]:
    """The deterministic probe set (matches ``DOC_DECONTAMINATE_SQL``'s
    bench CTE). The stride predicate is not parquet-pushdownable, so
    the read STREAMS record batches and keeps only the 1-in-97 strided
    rows' slices — driver memory stays at one batch + the probe list,
    never the corpus text column."""
    import os

    import pyarrow.parquet as pq
    out: list[str] = []
    pf = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet"))
    for batch in pf.iter_batches(batch_size=8192,
                                 columns=["doc_id", "text"]):
        ids = batch.column(0).to_numpy(zero_copy_only=False)
        keep = np.flatnonzero(ids % BENCH_STRIDE == 0)
        if len(keep) == 0:
            continue
        for s in batch.column(1).take(pa.array(keep)).to_pylist():
            s = s or ""
            if len(s) >= BENCH_OFF + BENCH_LEN:
                out.append(s[BENCH_OFF:BENCH_OFF + BENCH_LEN])
    return out


# --------------------------------------------------------------------------
# Repetition metrics (Gopher-filter family)
# --------------------------------------------------------------------------

DOC_REPETITION_SQL = """
WITH w AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS arr
  FROM documents
), words AS (
  SELECT doc_id, unnest(arr) AS word FROM w
), wf AS (
  SELECT doc_id,
         1.0 - CAST(count(DISTINCT word) AS DOUBLE) / count(*)
           AS dup_word_frac
  FROM words GROUP BY doc_id
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(arr)),
                               i -> arr[i] || ' ' || arr[i + 1])) AS bigram
  FROM w WHERE len(arr) >= 2
), bgc AS (
  SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
), bf AS (
  SELECT doc_id,
         CAST(max(c) AS DOUBLE) / sum(c) AS top_bigram_frac
  FROM bgc GROUP BY doc_id
)
SELECT wf.doc_id, wf.dup_word_frac,
       coalesce(bf.top_bigram_frac, 0.0) AS top_bigram_frac
FROM wf LEFT JOIN bf USING (doc_id)
"""


# --------------------------------------------------------------------------
# Text normalization (the pre-dedup canonical form)
# --------------------------------------------------------------------------

DOC_NORMALIZE_SQL = r"""
SELECT doc_id,
       trim(regexp_replace(nfc_normalize(lower(coalesce(text, ''))),
                           '\s+', ' ', 'g')) AS norm_text
FROM documents
"""


def normalize_text(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, norm_text): lowercase → Unicode NFC → whitespace
    collapse → trim. The canonical form fed to exact/near dedup so
    that case, combining-character encoding and spacing differences
    stop defeating hash equality.

    NFC caveat measured on this pyarrow: ``pc.utf8_normalize(form=
    "NFC")`` does NOT compose combining sequences (e + U+0301 stays
    two codepoints) while DuckDB's ``nfc_normalize`` (and stdlib
    ``unicodedata``) compose to U+00E9 — a silent dedup-divergence on
    any non-ASCII corpus. So: ASCII rows (the overwhelming bulk of a
    webtext corpus after extraction) take the all-Arrow path, and only
    rows that actually contain non-ASCII bytes detour through stdlib
    NFC — vectorized mask, per-row Python only on the minority that
    needs it."""
    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["doc_id"],
                         "norm_text": normalize_array(batch["text"])})

    return docs.map_batches(norm, batch_format="pyarrow")


def normalize_array(col) -> "pa.Array | pa.ChunkedArray":
    """The array-level normalizer behind :func:`normalize_text`
    (lower → NFC → whitespace collapse → trim), shared with the
    end-to-end composition pipeline."""
    import unicodedata as _ud

    t = pc.coalesce(col, pa.scalar(""))
    t = pc.utf8_lower(t)
    non_ascii = pc.match_substring_regex(t, r"[^\x00-\x7F]")
    if pc.any(non_ascii).as_py():
        # only the non-ASCII rows detour through stdlib NFC; the
        # ASCII majority stays in the Arrow array and the fixed
        # rows scatter back via replace_with_mask
        t = t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t
        mask = non_ascii.combine_chunks() \
            if isinstance(non_ascii, pa.ChunkedArray) else non_ascii
        idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
        # type the replacement like the input: the crawl parquet text
        # column is large_string and replace_with_mask has no
        # (large_string, bool, string) kernel — a string()-typed
        # `fixed` crashes on any non-ASCII large_string row
        fixed = pa.array([
            _ud.normalize("NFC", v)
            for v in t.take(pa.array(idx)).to_pylist()], t.type)
        t = pc.replace_with_mask(t, mask, fixed)
    return pc.utf8_trim_whitespace(
        pc.replace_substring_regex(t, r"\s+", " "))


STRAT_K = 10

DOC_SAMPLE_STRATIFIED_SQL = f"""
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
SELECT doc_id, source FROM r WHERE rk <= {STRAT_K}
"""


def stratified_sample(docs: "ray.data.Dataset", k: int = STRAT_K
                      ) -> "ray.data.Dataset":
    """Per-source quota sampling: the k hash-first documents of every
    source (md5 of the id — deterministic across runs, partitionings
    and engines, like :func:`analytics.doc_sample_query`'s Bernoulli
    variant, but with an EXACT per-stratum count — the shape a
    data-mixing recipe needs: "n docs per domain", not "p % of each").

    Scale shape: a per-block partial top-k bounds what shuffles at
    ``k × sources`` rows per block (ids + 16-char hash prefixes, no
    text); the final per-source reduce walks a 64-way coarse-hash
    group. The rejected mass never leaves its block.
    """
    from zlib import crc32 as _crc32

    from crawler_ray.dedup import _grouped_apply
    from crawler_ray.functions.hashing import md5_hex_of_ids

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        src = batch["source"].to_numpy(zero_copy_only=False)
        h = md5_hex_of_ids(ids)
        order = np.lexsort((ids, h, src))
        src_s, ids_s, h_s = src[order], ids[order], h[order]
        # rank within each source run; keep rank < k
        starts = np.ones(len(src_s), dtype=bool)
        starts[1:] = src_s[1:] != src_s[:-1]
        run_id = np.cumsum(starts) - 1
        run_start = np.flatnonzero(starts)
        rank = np.arange(len(src_s)) - run_start[run_id]
        keep = rank < k
        src_k = src_s[keep]
        # deterministic coarse key: Python's hash() is salted per
        # process, which would split one source across buckets and
        # turn the per-bucket top-k into a union of partial top-ks.
        # crc32 runs once per UNIQUE source (sources ≪ rows), then
        # fans out through the inverse index — no per-row hashing.
        uniq, inv = np.unique(src_k, return_inverse=True)
        ucoarse = np.array([_crc32(s.encode()) % 64 for s in uniq],
                           dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(ids_s[keep], pa.int64()),
            "source": pa.array(src_k, pa.string()),
            "h": pa.array(h_s[keep], pa.string()),
            "coarse": pa.array(ucoarse[inv] if len(uniq)
                               else np.array([], np.int64), pa.int64()),
        })

    def reduce_bucket(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        src = g["source"].to_numpy(zero_copy_only=False)
        h = g["h"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h, src))
        src_s, ids_s = src[order], ids[order]
        starts = np.ones(len(src_s), dtype=bool)
        starts[1:] = src_s[1:] != src_s[:-1]
        run_id = np.cumsum(starts) - 1
        run_start = np.flatnonzero(starts)
        rank = np.arange(len(src_s)) - run_start[run_id]
        keep = rank < k
        return pa.table({
            "doc_id": pa.array(ids_s[keep], pa.int64()),
            "source": pa.array(src_s[keep], pa.string()),
        })

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "source": pa.array([], pa.string())})
    partials = docs.map_batches(partial, batch_format="pyarrow")
    return _grouped_apply(partials, "coarse", reduce_bucket, empty=empty,
                          group_format="pyarrow")


def repetition_stats(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, dup_word_frac, top_bigram_frac): the two cheap
    repetition signals of the Gopher quality filter — the fraction of
    word occurrences that are repeats, and the share of the most
    common bigram among all bigrams. Per-document string work is
    irreducibly per-row (like chunking/packing); everything around it
    is numpy. No shuffle: the op is a pure batch map."""

    def stats(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        dup = np.zeros(n, dtype=np.float64)
        top_bg = np.zeros(n, dtype=np.float64)
        for i, t in enumerate(batch["text"].to_pylist()):
            words = (t or "").split(" ")
            total = len(words)
            if total:
                dup[i] = 1.0 - len(set(words)) / total
            if total >= 2:
                arr = np.array(words, dtype=object)
                bigrams = np.char.add(
                    np.char.add(arr[:-1].astype(str), " "),
                    arr[1:].astype(str))
                _, counts = np.unique(bigrams, return_counts=True)
                top_bg[i] = counts.max() / counts.sum()
        return pa.table({
            "doc_id": batch["doc_id"],
            "dup_word_frac": pa.array(dup, pa.float64()),
            "top_bigram_frac": pa.array(top_bg, pa.float64()),
        })

    return docs.map_batches(stats, batch_format="pyarrow")


# --------------------------------------------------------------------------
# End-to-end curation composition: crawl → normalize → canonical dedup
# → decontaminate → stratified sample (the pipeline a 100-TB user runs)
# --------------------------------------------------------------------------

def _curation_pipeline_sql() -> str:
    """Oracle for :func:`curation_pipeline`: the crawl-reachability
    recursive CTE (docgraph) composed with normalization, min-id
    dedup on the normalized text, benchmark decontamination and the
    per-source quota sample — one SQL statement, so the whole chained
    pipeline hash-checks end to end."""
    from crawler_ray.pipelines.docgraph import N_HOSTS, REACH_CTES
    return rf"""
WITH RECURSIVE {REACH_CTES}, docs AS (
  SELECT doc_id,
         'h' || (doc_id % {N_HOSTS}) || '.docs.example' AS source,
         text
  FROM reach JOIN documents USING (doc_id)
), bench AS (
  SELECT substr(text, {BENCH_OFF + 1}, {BENCH_LEN}) AS s
  FROM documents
  WHERE doc_id % {BENCH_STRIDE} = 0
    AND length(text) >= {BENCH_OFF + BENCH_LEN}
), norm AS (
  SELECT doc_id, source, text,
         trim(regexp_replace(nfc_normalize(lower(coalesce(text, ''))),
                             '\s+', ' ', 'g')) AS norm_text
  FROM docs
), kept AS (
  SELECT min(doc_id) AS doc_id FROM norm GROUP BY norm_text
), clean AS (
  SELECT n.doc_id, n.source
  FROM norm n JOIN kept USING (doc_id)
  WHERE NOT EXISTS (SELECT 1 FROM bench b
                    WHERE position(b.s IN n.text) > 0)
), r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM clean
)
SELECT doc_id, source FROM r WHERE rk <= {STRAT_K}
"""


def curation_pipeline(sf_dir: str, k: int = STRAT_K
                      ) -> "ray.data.Dataset":
    """The full curation chain over the crawled doc-graph site, as ONE
    composed lineage: crawl (real engine, byte-identical text) →
    normalize → exact dedup keeping the min-id member per normalized
    content → benchmark decontamination → per-source stratified
    sample. Returns ``(doc_id, source)``.

    Scale shape — the property that matters at 100 TB: the page text
    is read ONCE, in the fused prep stage, which derives everything
    downstream needs — (doc_id, source, content_md5, contaminated,
    coarse) — so only those id-sized rows enter the dedup shuffle;
    text never moves again. The contamination flag is computed
    upstream of the shuffle (one RE2 alternation scan per batch,
    probe set broadcast in the closure) and rides along; filtering
    kept docs by their flag afterwards is equivalent to
    decontaminating the canonical set, because the flag is per-doc.
    The stratified sampler then sees only (doc_id, source) — its
    block-local top-k partials bound what shuffles at k × sources
    rows per block."""
    import re as _re

    from crawler_ray.dedup import _coarse_from_md5, _grouped_apply
    from crawler_ray.functions.hashing import md5_hex_of_strings
    from crawler_ray.pipelines.docgraph import N_HOSTS, crawl_reachable

    probes = default_bench_strings(sf_dir)
    pattern = "|".join(_re.escape(s) for s in probes) if probes else None
    hosts = pa.array([f"h{j}.docs.example" for j in range(N_HOSTS)])

    def prep(batch: pa.Table) -> pa.Table:
        # url tail is the doc_id (docgraph site contract)
        doc_id = pc.cast(pc.replace_substring_regex(
            batch["url"], r"^.*/doc/", ""), pa.int64())
        ids = doc_id.to_numpy(zero_copy_only=False)
        src = hosts.take(pa.array(ids % N_HOSTS))
        text = pc.coalesce(batch["text"], pa.scalar(""))
        if pattern is None:
            contam = pa.array(np.zeros(len(ids), np.int8))
        else:
            contam = pc.cast(
                pc.match_substring_regex(text, pattern), pa.int8())
        md5s = md5_hex_of_strings(normalize_array(text))
        return pa.table({
            "doc_id": doc_id,
            "source": src,
            "content_md5": pa.array(md5s, pa.string()),
            "contaminated": contam,
            "coarse": pa.array(_coarse_from_md5(md5s), pa.int64()),
        })

    def keep_min(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values("doc_id", kind="mergesort")
        out = g.groupby("content_md5", as_index=False).first()
        return out[["doc_id", "source", "contaminated"]]

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "source": pa.array([], pa.string()),
                      "contaminated": pa.array([], pa.int8())})
    kept = _grouped_apply(
        crawl_reachable(sf_dir).map_batches(prep, batch_format="pyarrow"),
        "coarse", keep_min, empty=empty)
    clean = (kept.filter(expr="contaminated == 0")
                 .select_columns(["doc_id", "source"]))
    return stratified_sample(clean, k=k)


CURATION_PIPELINE_SQL = _curation_pipeline_sql()
