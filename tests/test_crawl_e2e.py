"""Golden end-to-end: the Ray engine must reproduce the sequential
oracle exactly (SURVEY §5): seen-set equality, ordered crawl-log
equality, byte-identical doc text, politeness and no-refetch
invariants."""

import pandas as pd
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def crawl_out(ray_session, fixture_t0, tmp_path_factory):
    from crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
    out = str(tmp_path_factory.mktemp("crawl") / "out")
    summary = run_crawl(f"{fixture_t0}/pages.parquet",
                        f"{fixture_t0}/seeds.parquet",
                        f"{fixture_t0}/robots.parquet",
                        out, CrawlConfig(n_frontier_shards=2, n_seen_shards=2,
                                         n_page_shards=2))
    return out, summary


def test_seen_set_equality(crawl_out, oracle_t0):
    from crawler_ray.pipelines.crawl import crawl_log_dataset
    out, summary = crawl_out
    log = crawl_log_dataset(out).to_pandas()
    assert set(log["url"]) == oracle_t0.seen
    assert summary["seen_size"] == len(oracle_t0.seen)
    assert summary["frontier_remaining"] == 0


def test_crawl_log_order_equality(crawl_out, oracle_t0):
    from crawler_ray.pipelines.crawl import crawl_log_dataset
    out, _ = crawl_out
    log = crawl_log_dataset(out).to_pandas()
    olog = pd.DataFrame(oracle_t0.crawl_log)
    assert len(log) == len(olog)
    for col in ["pop_rank", "url", "host", "depth", "parent_order",
                "dom_idx", "status", "kind", "wave", "window"]:
        assert (log[col].values == olog[col].values).all(), col


def test_docs_byte_identical_and_deduped(crawl_out, oracle_t0):
    from crawler_ray.pipelines.crawl import finalize_docs
    out, _ = crawl_out
    docs = finalize_docs(out).to_pandas()
    odocs = pd.DataFrame(oracle_t0.docs)
    odocs["doc_key"] = [r.doc_hash + "-" + r.release_date.isoformat()
                        for r in odocs.itertuples()]
    assert set(docs["doc_key"]) == set(odocs["doc_key"])
    assert len(docs) == len(odocs)                  # composite-key dedup
    m = docs.merge(odocs, on="doc_key", suffixes=("_e", "_o"))
    assert (m["text_e"] == m["text_o"]).all()       # byte-identical text
    assert (m["pop_rank_e"] == m["pop_rank_o"]).all()  # earliest wins


def test_no_url_fetched_twice(crawl_out):
    from crawler_ray.pipelines.crawl import crawl_log_dataset
    out, _ = crawl_out
    urls = crawl_log_dataset(out).to_pandas()["url"]
    assert urls.is_unique


def test_politeness_never_exceeded(crawl_out, fixture_t0):
    from crawler_ray.pipelines.crawl import crawl_log_dataset
    out, _ = crawl_out
    robots = pq.read_table(f"{fixture_t0}/robots.parquet")
    budget = {}
    for h, d in zip(robots["host"].to_pylist(),
                    robots["crawl_delay_ms"].to_pylist()):
        budget[h] = 10_000 if d == 0 else max(1, min(10_000, 60_000 // d))
    log = crawl_log_dataset(out).to_pandas()
    per = log.groupby(["host", "window"]).size()
    for (host, _w), n in per.items():
        assert n <= budget[host], (host, n, budget[host])


def test_robots_never_fetched(crawl_out, fixture_t0):
    from crawler_ray.pipelines.crawl import crawl_log_dataset
    out, _ = crawl_out
    robots = pq.read_table(f"{fixture_t0}/robots.parquet")
    disallow = {h: list(d or []) for h, d in zip(
        robots["host"].to_pylist(), robots["disallow_prefixes"].to_pylist())}
    log = crawl_log_dataset(out).to_pandas()
    for url, host in zip(log["url"], log["host"]):
        path = url.split(host, 1)[1]
        assert not any(path.startswith(p) for p in disallow.get(host, []))


def test_frontier_mass_conservation(crawl_out, oracle_t0):
    """pushed (seen admitted) == popped (log rows) + remaining (0)."""
    out, summary = crawl_out
    assert summary["urls_fetched"] == summary["seen_size"]
    assert summary["frontier_remaining"] == 0


def test_crawl_reachable_dataset_matches_oracle(ray_session, tmp_path_factory):
    """The pure-Dataset BFS tier (Dataset.join inner + left_anti per
    level) against the recursive-CTE oracle at sf0.001 — the check
    that used to ride the driver gate as ``crawl_reachable_ds`` before
    the 50-entry registration cap moved it here. Asserts the full
    (url, text) result set, i.e. reachability AND byte-identical
    extraction, equals DuckDB's answer."""
    import duckdb

    from crawler_ray.pipelines.docgraph import (
        CRAWL_REACHABLE_SQL, crawl_reachable_dataset)

    sf = "/root/testdata/sf0.001"
    scratch = str(tmp_path_factory.mktemp("docgraph_ds"))
    got = (crawl_reachable_dataset(sf, scratch_root=scratch)
           .to_pandas().sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.execute(CRAWL_REACHABLE_SQL).df()
            .sort_values("url").reset_index(drop=True))
    assert len(got) == len(want)
    assert (got["url"].values == want["url"].values).all()
    assert (got["text"].values == want["text"].values).all()


def test_curation_pipeline_matches_oracle(ray_session):
    """End-to-end curation composition (crawl → normalize → min-id
    exact dedup → decontaminate → stratified sample) vs its single
    composed SQL oracle at sf0.001."""
    import duckdb

    from crawler_ray.pipelines.curation import (
        CURATION_PIPELINE_SQL, curation_pipeline)

    sf = "/root/testdata/sf0.001"
    got = (curation_pipeline(sf).to_pandas()
           .sort_values(["source", "doc_id"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.execute(CURATION_PIPELINE_SQL).df()
            .sort_values(["source", "doc_id"]).reset_index(drop=True))
    assert len(got) == len(want)
    assert (got["doc_id"].values == want["doc_id"].values).all()
    assert (got["source"].values == want["source"].values).all()


def test_indices_fetch_mode_equals_rows(ray_session, fixture_t0, oracle_t0,
                                        tmp_path_factory):
    """fetch_mode="indices" (plasma-published corpus, in-place html
    views) must produce the same crawl as the default "rows" mode —
    seen set and ordered log equality against the oracle."""
    import pandas as pd

    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             run_crawl)
    out = str(tmp_path_factory.mktemp("crawl_idx") / "out")
    run_crawl(f"{fixture_t0}/pages.parquet", f"{fixture_t0}/seeds.parquet",
              f"{fixture_t0}/robots.parquet", out,
              CrawlConfig(n_frontier_shards=2, n_seen_shards=2,
                          n_page_shards=2, fetch_mode="indices"))
    log = crawl_log_dataset(out).to_pandas()
    olog = pd.DataFrame(oracle_t0.crawl_log)
    assert len(log) == len(olog)
    assert (log["url"].values == olog["url"].values).all()
    assert set(log["url"]) == oracle_t0.seen


def test_phase_timing_emits_wave_outliers(ray_session, fixture_t0,
                                          tmp_path_factory, capfd,
                                          monkeypatch):
    """CRAWLER_RAY_PHASE_TIMING must emit the PHASE_TIMING summary and
    the per-iteration WAVE_OUTLIERS lines (diagnostic surface the
    scaling bench persists per trial) without changing crawl output."""
    import json as _json

    from crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
    monkeypatch.setenv("CRAWLER_RAY_PHASE_TIMING", "1")
    out = str(tmp_path_factory.mktemp("crawl_pt") / "out")
    summary = run_crawl(f"{fixture_t0}/pages.parquet",
                        f"{fixture_t0}/seeds.parquet",
                        f"{fixture_t0}/robots.parquet", out,
                        CrawlConfig(n_frontier_shards=2, n_seen_shards=2,
                                    n_page_shards=2))
    err = capfd.readouterr().err
    assert "PHASE_TIMING " in err
    outlier_lines = [ln for ln in err.splitlines()
                     if ln.startswith("WAVE_OUTLIERS ")]
    assert outlier_lines, "no WAVE_OUTLIERS line emitted"
    worst = _json.loads(outlier_lines[-1].split(" ", 2)[2])
    assert worst and all("wall_s" in w and "wave" in w for w in worst)
    # the tracker is observability only: the crawl itself is unchanged
    assert summary["urls_fetched"] > 0
