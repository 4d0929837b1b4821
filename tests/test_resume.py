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


def test_offer_survives_concurrent_restore(ray_session, tmp_path):
    """Regression: ``offer`` runs in its own concurrency lane, so on a
    resumed crawl an offer can execute BEFORE the queued default-lane
    ``restore`` on a cold actor. Restore must preserve the offer
    buffer — the old wipe (``_pending = {}``) silently dropped those
    discovered links (resumed run != uninterrupted, ~1/10 on a
    contended 4-CPU box). Driven deterministically via call order."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from crawler_ray.state.seen import make_seen_shards

    snap = str(tmp_path / "seen_0000.parquet")
    pq.write_table(pa.table({"url_hash": pa.array(
        np.array([7, 9], dtype=np.uint64), pa.uint64())}), snap)

    (shard,) = make_seen_shards(1, 1024, robots={})
    offered = pa.table({
        "url": ["https://h0.example/a", "https://h0.example/b"],
        "url_hash": pa.array(np.array([11, 7], np.uint64), pa.uint64()),
        "host": ["h0.example", "h0.example"],
        "depth": pa.array([1, 1], pa.int32()),
        "parent_order": pa.array([0, 0], pa.int64()),
        "dom_idx": pa.array([0, 1], pa.int32()),
    })
    # offer lands first (the race's losing interleaving), restore after
    ray.get(shard.offer.remote(offered, 5))
    ray.get(shard.restore.remote(snap))
    assert ray.get(shard.wave_offer_count.remote(5)) == 1
    # commit: the buffered offer must still be there; hash 7 is a dup
    # against the restored membership, hash 11 is admitted
    admitted = ray.get(shard.commit_wave.remote(5, 8))
    assert admitted == 1
    stats = ray.get(shard.stats.remote())
    assert stats["size"] == 3                     # {7, 9} + 11
