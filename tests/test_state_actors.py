"""Unit tests for the stateful shards (frontier priority/politeness,
seen dedup/robots) through their actor API."""

import numpy as np
import pyarrow as pa
import pytest

from crawler_ray.sources.pages import pack


def _cand(rows):
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "url_hash": pa.array([r[1] for r in rows], pa.uint64()),
        "host": pa.array([r[2] for r in rows], pa.string()),
        "depth": pa.array([r[3] for r in rows], pa.int32()),
        "parent_order": pa.array([r[4] for r in rows], pa.int64()),
        "dom_idx": pa.array([r[5] for r in rows], pa.int32()),
    })


def test_frontier_priority_and_budget(ray_session):
    import ray

    from crawler_ray.state.frontier import FrontierShard
    f = FrontierShard.remote(0, {"slow.host": 30_000}, 60_000, 10_000)
    rows = [
        ("https://slow.host/b", 2, "slow.host", 1, 5, 0),
        ("https://slow.host/a", 1, "slow.host", 0, -1, 3),
        ("https://slow.host/c", 3, "slow.host", 1, 5, 1),
        ("https://fast.host/x", 4, "fast.host", 2, 9, 0),
    ]
    ray.get(f.push.remote(pack(_cand(rows))))
    t = ray.get(f.pop_wave.remote())
    # slow.host budget = 60000/30000 = 2 → pops 2 best-priority entries
    by_host = {}
    for u, h in zip(t["url"].to_pylist(), t["host"].to_pylist()):
        by_host.setdefault(h, []).append(u)
    assert by_host["slow.host"] == ["https://slow.host/a", "https://slow.host/b"]
    assert by_host["fast.host"] == ["https://fast.host/x"]
    # budget exhausted within the window
    assert ray.get(f.pop_wave.remote()) is None
    assert ray.get(f.size.remote()) == 1
    ray.get(f.reset_window.remote())
    t2 = ray.get(f.pop_wave.remote())
    assert t2["url"].to_pylist() == ["https://slow.host/c"]


def test_frontier_snapshot_roundtrip(ray_session, tmp_path):
    import ray

    from crawler_ray.state.frontier import FrontierShard
    f = FrontierShard.remote(0, {"h": 30_000}, 60_000, 10_000)
    ray.get(f.push.remote(pack(_cand([("https://h/1", 1, "h", 0, -1, 0),
                                      ("https://h/2", 2, "h", 1, 0, 1)]))))
    ray.get(f.pop_wave.remote())            # consumes budget (2 → 0)
    p = str(tmp_path / "snap.parquet")
    ray.get(f.snapshot.remote(p))
    g = FrontierShard.remote(1, {"h": 30_000}, 60_000, 10_000)
    ray.get(g.restore.remote(p))
    assert ray.get(g.size.remote()) == 0
    # restored budget state: nothing left this window
    assert ray.get(g.pop_wave.remote()) is None


def test_seen_dedup_robots_and_min_key(ray_session):
    import ray

    from crawler_ray.state.seen import SeenShard
    from crawler_ray.state.frontier import FrontierShard
    s = SeenShard.remote(0, 1000, {"h": ["/private/"]})
    f = FrontierShard.remote(0, {}, 60_000, 10_000)
    ray.get(s.set_frontier.remote([f]))
    # same url offered twice in one wave with different keys → min key wins
    ray.get(s.offer.remote(pack(_cand([
        ("https://h/a", 10, "h", 3, 7, 2),
        ("https://h/a", 10, "h", 1, 2, 9),
        ("https://h/private/x", 11, "h", 1, 2, 0),
        ("https://h/b", 12, "h", 2, 2, 1),
    ]))))
    assert ray.get(s.commit_wave.remote()) == 2     # a (min key) + b
    t = ray.get(f.pop_wave.remote())
    assert t["url"].to_pylist() == ["https://h/a", "https://h/b"]
    assert t["depth"].to_pylist() == [1, 2]         # min key kept
    # re-offering an admitted url is a dup
    ray.get(s.offer.remote(pack(_cand([("https://h/a", 10, "h", 0, 0, 0)]))))
    assert ray.get(s.commit_wave.remote()) == 0
    stats = ray.get(s.stats.remote())
    assert stats["robots_excluded"] == 1
    assert stats["admitted"] == 2


def test_seen_snapshot_roundtrip(ray_session, tmp_path):
    import ray

    from crawler_ray.state.seen import SeenShard
    s = SeenShard.remote(0, 1000, {})
    ray.get(s.set_frontier.remote([]))
    ray.get(s.offer.remote(pack(_cand([("https://h/a", 10, "h", 0, -1, 0)]))))
    ray.get(s.commit_wave.remote())
    p = str(tmp_path / "seen.parquet")
    ray.get(s.snapshot.remote(p))
    s2 = SeenShard.remote(1, 1000, {})
    ray.get(s2.set_frontier.remote([]))
    assert ray.get(s2.restore.remote(p)) == 1
    ray.get(s2.offer.remote(pack(_cand([("https://h/a", 10, "h", 0, -1, 0)]))))
    assert ray.get(s2.commit_wave.remote()) == 0    # still seen after restore
