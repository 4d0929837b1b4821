"""Property-based crawl invariants (SURVEY §5): random seeded link
graphs and random engine configs — the engine must always match the
sequential oracle exactly and respect the safety invariants."""

import pandas as pd
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def crawl_case(draw):
    return {
        "seed": draw(st.integers(0, 10_000)),
        "n_pages": draw(st.integers(80, 350)),
        "n_hosts": draw(st.integers(3, 12)),
        "dead_link_rate": draw(st.floats(0.0, 0.15)),
        "nonhtml_rate": draw(st.floats(0.0, 0.15)),
        "pre2018_rate": draw(st.floats(0.0, 0.3)),
        "private_rate": draw(st.floats(0.0, 0.2)),
        "chain_max": draw(st.integers(2, 12)),
        "pipeline_depth": draw(st.integers(1, 4)),
        "n_shards": draw(st.integers(1, 3)),
        "round_ms": draw(st.sampled_from([20_000, 60_000, 240_000])),
        "cap": draw(st.sampled_from([5, 50, 10_000])),
    }


@settings(max_examples=4, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(case=crawl_case())
def test_engine_matches_oracle_on_random_graphs(ray_session, tmp_path_factory,
                                                case):
    from crawler_ray.fixtures import SyntheticWeb, WebConfig
    from crawler_ray.oracle import CrawlParams, crawl_oracle
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             run_crawl)

    web = SyntheticWeb(WebConfig(
        seed=case["seed"], n_pages=case["n_pages"], n_hosts=case["n_hosts"],
        dead_link_rate=case["dead_link_rate"],
        nonhtml_rate=case["nonhtml_rate"],
        pre2018_rate=case["pre2018_rate"], private_rate=case["private_rate"],
        chain_max=case["chain_max"]))
    pages, seeds, robots = (web.pages_table(), web.seeds_table(),
                            web.robots_table())

    base = tmp_path_factory.mktemp("prop")
    pq.write_table(pages, str(base / "pages.parquet"))
    pq.write_table(seeds, str(base / "seeds.parquet"))
    pq.write_table(robots, str(base / "robots.parquet"))

    oracle = crawl_oracle(pages, seeds, robots, CrawlParams(
        round_ms=case["round_ms"], politeness_cap=case["cap"],
        pipeline_depth=case["pipeline_depth"]))

    out = str(base / "out")
    summary = run_crawl(
        str(base / "pages.parquet"), str(base / "seeds.parquet"),
        str(base / "robots.parquet"), out,
        CrawlConfig(n_frontier_shards=case["n_shards"],
                    n_seen_shards=case["n_shards"],
                    n_page_shards=case["n_shards"],
                    round_ms=case["round_ms"], politeness_cap=case["cap"],
                    pipeline_depth=case["pipeline_depth"]))

    log = crawl_log_dataset(out).to_pandas()
    olog = pd.DataFrame(oracle.crawl_log)

    # exact equality of the ordered crawl log
    assert len(log) == len(olog)
    for col in ["pop_rank", "url", "host", "depth", "parent_order",
                "dom_idx", "status", "kind", "wave", "window"]:
        assert (log[col].values == olog[col].values).all(), col

    # invariant: no url fetched twice
    assert log["url"].is_unique
    # invariant: seen set == scheduled set, frontier fully drained
    assert set(log["url"]) == oracle.seen
    assert summary["frontier_remaining"] == 0
    assert summary["urls_fetched"] == summary["seen_size"]

    # invariant: politeness budget never exceeded per (host, window)
    budget = {}
    for h, d in zip(robots["host"].to_pylist(),
                    robots["crawl_delay_ms"].to_pylist()):
        budget[h] = case["cap"] if d == 0 else \
            max(1, min(case["cap"], case["round_ms"] // int(d)))
    per = log.groupby(["host", "window"]).size()
    for (host, _w), n in per.items():
        assert n <= budget[host], (host, n, budget[host])
