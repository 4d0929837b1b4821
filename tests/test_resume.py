"""Resume equivalence (SURVEY §5): kill after a checkpoint epoch,
resume, and the final outputs must be identical to an uninterrupted
run."""

import pandas as pd
import pytest


def _run(fixture, out, **kw):
    from crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
    cfg = CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                      checkpoint_every=kw.pop("checkpoint_every", 0))
    return run_crawl(f"{fixture}/pages.parquet", f"{fixture}/seeds.parquet",
                     f"{fixture}/robots.parquet", out, cfg, **kw)


def test_resume_equals_uninterrupted(ray_session, fixture_t0,
                                     tmp_path_factory):
    from crawler_ray.pipelines.crawl import crawl_log_dataset, finalize_docs
    base = tmp_path_factory.mktemp("resume")
    full_out = str(base / "full")
    _run(fixture_t0, full_out)

    part_out = str(base / "part")
    aborted = _run(fixture_t0, part_out, checkpoint_every=5,
                   stop_after_waves=5)
    assert "aborted_at_wave" in aborted
    resumed = _run(fixture_t0, part_out, checkpoint_every=5, resume=True)

    full_log = crawl_log_dataset(full_out).to_pandas()
    res_log = crawl_log_dataset(part_out).to_pandas()
    assert len(full_log) == len(res_log)
    for col in ["pop_rank", "url", "depth", "parent_order", "dom_idx",
                "status", "kind", "wave", "window"]:
        assert (full_log[col].values == res_log[col].values).all(), col

    fd = finalize_docs(full_out).to_pandas().sort_values("doc_key") \
        .reset_index(drop=True)
    rd = finalize_docs(part_out).to_pandas().sort_values("doc_key") \
        .reset_index(drop=True)
    assert fd[["doc_key", "text", "pop_rank"]].equals(
        rd[["doc_key", "text", "pop_rank"]])
    assert resumed["frontier_remaining"] == 0


def test_resume_without_checkpoint_raises(ray_session, fixture_t0, tmp_path):
    with pytest.raises(FileNotFoundError):
        _run(fixture_t0, str(tmp_path / "nope"), resume=True)
