"""Per-wave lineage/metrics (north_rule: checkpointed per-partition
lineage + metrics) and the streaming corpus-extraction pipeline."""

import pytest


def test_wave_metrics_conservation(ray_session, fixture_t0,
                                   tmp_path_factory):
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             run_crawl, wave_metrics)
    out = str(tmp_path_factory.mktemp("lineage") / "out")
    summary = run_crawl(f"{fixture_t0}/pages.parquet",
                        f"{fixture_t0}/seeds.parquet",
                        f"{fixture_t0}/robots.parquet",
                        out, CrawlConfig(n_frontier_shards=2,
                                         n_seen_shards=2, n_page_shards=2))
    m = wave_metrics(out).to_pandas()
    log = crawl_log_dataset(out).to_pandas()
    # lineage totals reconcile with the crawl log and summary
    assert m["rows"].sum() == len(log) == summary["urls_fetched"]
    assert m["missing"].sum() == (log["status"] == 404).sum()
    assert m["doc_ok"].sum() == (log["kind"] == "detail").sum() \
        or m["doc_ok"].sum() <= (log["kind"] == "detail").sum()
    # one row per (wave, window), waves strictly increasing
    assert m["wave"].is_unique
    assert (m["wave"].values == sorted(m["wave"].values)).all()


def test_streaming_extract_corpus(ray_session, fixture_t0):
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.extract import extract_corpus, extracted_docs
    ds = extract_corpus(f"{fixture_t0}/pages.parquet")
    df = ds.to_pandas()
    pages = pq.read_table(f"{fixture_t0}/pages.parquet")
    assert len(df) == pages.num_rows
    # byte-identical extraction per url against the fixture oracle text
    truth = dict(zip(pages["url"].to_pylist(), pages["text"].to_pylist()))
    for url, text in zip(df["url"], df["text"]):
        assert text == truth[url], url
    docs = extracted_docs(f"{fixture_t0}/pages.parquet").to_pandas()
    assert (docs["title"].str.len() > 0).all()
    assert docs["doc_key"].notna().all()
