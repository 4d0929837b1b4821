"""Curation operators: canonical-per-cluster selection, benchmark
decontamination, repetition metrics. The sf0.01 hash-check against
DuckDB runs in the driver gate; these tests pin the micro-semantics
(tie-breaks, empty inputs, edge shapes) on tiny in-memory data."""

import numpy as np
import pyarrow as pa
import ray


def _docs_ds(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def test_dedup_canonical_quality_argmax_and_tiebreak(ray_session):
    from crawler_ray.pipelines.curation import dedup_canonical
    # cluster {1,2}: doc 2 has much longer alpha text -> higher quality
    # cluster {3,4}: identical texts -> exact quality tie -> smaller id
    docs = _docs_ds([
        (1, "ab"),
        (2, "a long clean document with many alphabetic words in it"),
        (3, "same text here"), (4, "same text here"),
        (5, "a singleton document"),
    ])
    comps = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "component": pa.array([1, 1, 3, 3, 5], pa.int64()),
    }))
    out = dedup_canonical(docs, comps).to_pandas() \
        .set_index("component")["keep_id"].to_dict()
    assert out == {1: 2, 3: 3, 5: 5}


def test_contamination_flags(ray_session):
    from crawler_ray.pipelines.curation import contamination_flags
    docs = _docs_ds([
        (1, "clean document"),
        (2, "contains the SECRET BENCHMARK PROBE somewhere"),
        (3, "regex specials . * + are literal in probes"),
    ])
    out = contamination_flags(
        docs, ["SECRET BENCHMARK PROBE", ". * +"]).to_pandas() \
        .set_index("doc_id")["contaminated"].to_dict()
    assert out == {1: 0, 2: 1, 3: 1}   # escaped: '. * +' is literal
    # empty probe set -> nothing contaminated (not an error)
    out0 = contamination_flags(docs, []).to_pandas()
    assert out0["contaminated"].sum() == 0


def test_repetition_stats(ray_session):
    from crawler_ray.pipelines.curation import repetition_stats
    docs = _docs_ds([
        (1, "a a a a"),            # dup_word 3/4; bigram 'a a' x3 of 3
        (2, "w x y z"),            # all unique; 3 distinct bigrams
        (3, "solo"),               # no bigram -> 0.0
    ])
    df = repetition_stats(docs).to_pandas().set_index("doc_id")
    assert np.isclose(df.loc[1, "dup_word_frac"], 0.75)
    assert np.isclose(df.loc[1, "top_bigram_frac"], 1.0)
    assert np.isclose(df.loc[2, "dup_word_frac"], 0.0)
    assert np.isclose(df.loc[2, "top_bigram_frac"], 1.0 / 3.0)
    assert df.loc[3, "top_bigram_frac"] == 0.0


def test_default_bench_strings_match_sql_slice(ray_session, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.curation import (BENCH_LEN, BENCH_OFF,
                                                BENCH_STRIDE,
                                                default_bench_strings)
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(0, 300)), pa.int64()),
        "text": pa.array([f"doc {i} " + "x" * 60 for i in range(300)],
                         pa.string()),
    }), str(tmp_path / "documents.parquet"))
    got = default_bench_strings(str(tmp_path))
    want = [r[0] for r in duckdb.sql(f"""
        SELECT substr(text, {BENCH_OFF + 1}, {BENCH_LEN}) FROM
        read_parquet('{tmp_path}/documents.parquet')
        WHERE doc_id % {BENCH_STRIDE} = 0
          AND length(text) >= {BENCH_OFF + BENCH_LEN}
    """).fetchall()]
    assert got == want and len(got) == 4   # ids 0, 97, 194, 291


def test_stratified_sample_exact_quota_multiblock(ray_session):
    """Quota holds across many small blocks: the per-block partial
    top-k plus the per-source reduce must agree with the global
    hash-first-k, regardless of partitioning."""
    import hashlib

    from crawler_ray.pipelines.curation import stratified_sample
    rows = [(i, f"src{i % 3}") for i in range(90)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "source": pa.array([r[1] for r in rows], pa.string()),
    })).repartition(9)                    # force multi-block partials
    got = stratified_sample(ds, k=4).to_pandas()
    assert got.groupby("source").size().to_dict() == {
        "src0": 4, "src1": 4, "src2": 4}
    # matches the global hash-first-k rule exactly
    for s in ("src0", "src1", "src2"):
        ids = [i for i, src in rows if src == s]
        want = sorted(ids, key=lambda i: (
            hashlib.md5(str(i).encode()).hexdigest(), i))[:4]
        assert sorted(got[got["source"] == s]["doc_id"]) == sorted(want)


def test_normalize_text_unicode_and_whitespace(ray_session):
    from crawler_ray.pipelines.curation import normalize_text
    # NFD 'é' (e + combining acute) must normalize to the NFC 'é'
    nfd = "Café   X"
    docs = _docs_ds([(1, "  HeLLo   WORLD  "), (2, nfd), (3, None)])
    df = normalize_text(docs).to_pandas().set_index("doc_id")
    assert df.loc[1, "norm_text"] == "hello world"
    assert df.loc[2, "norm_text"] == "café x"      # NFC, collapsed
    assert df.loc[3, "norm_text"] == ""                 # null-safe


def test_normalize_array_large_string_non_ascii():
    """The NFC detour must type its replacement like the input —
    large_string text (the crawl parquet schema) with non-ASCII rows
    crashed replace_with_mask before round 4's fix."""
    import pyarrow as pa

    from crawler_ray.pipelines.curation import normalize_array
    out = normalize_array(pa.array(["HÉllo  wörld", "plain", ""],
                                   pa.large_string()))
    assert out.to_pylist() == ["héllo wörld", "plain", ""]


def test_binary_views_at_null_rows():
    """Null corpus rows must surface as None (the missing-page path),
    not zero-length views — indices fetch mode diverged from rows
    mode on null-html pages before round 4's fix."""
    import numpy as np
    import pyarrow as pa

    from crawler_ray.stages.parse import binary_views_at
    col = pa.chunked_array([pa.array([b"abc", None], pa.binary()),
                            pa.array([b"", b"xyz"], pa.binary())])
    v = binary_views_at(col, np.array([0, 1, 2, 3, -1]))
    assert bytes(v[0]) == b"abc"
    assert v[1] is None
    assert bytes(v[2]) == b""
    assert bytes(v[3]) == b"xyz"
    assert v[4] is None
