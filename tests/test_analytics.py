"""Analytics pipelines vs their DuckDB oracles on sf0.001 — the
in-repo mirror of the driver's correctness gate for paths the gate
cannot reach (e.g. the shuffle-join variant of revenue_by_nation,
which the sf0.01 run takes the broadcast branch for)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["nation", "customer", "orders", "lineitem", "events",
              "documents"]:
        c.execute(f"CREATE VIEW {t} AS "
                  f"SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def test_hll_estimator_accuracy():
    """Pure-function check: estimate within 3σ (≈5 %) of the true
    cardinality across magnitudes, and merging split partials gives
    the identical registers as one pass (associativity)."""
    import numpy as np

    from crawler_ray.functions.hll import (
        hll_estimate, hll_merge, hll_partial)
    rng = np.random.default_rng(7)
    for n in (50, 1_000, 50_000):
        vals = rng.choice(np.arange(10 * n, dtype=np.int64),
                          size=3 * n, replace=True)     # with repeats
        true = len(np.unique(vals))
        est = hll_estimate(hll_merge([hll_partial(vals)]))
        assert abs(est - true) / true < 0.05, (n, true, est)
        # split-merge == single pass, any split point
        split = hll_merge([hll_partial(vals[:n]),
                           hll_partial(vals[n:])])
        whole = hll_merge([hll_partial(vals)])
        assert (split == whole).all()


def test_events_hourly_hll_vs_exact(ray_session, con):
    """The HLL variant must agree with the exact two-level distinct
    within the p=12 error band on every (event_type, hour) row, and
    keep n_events/total_value EXACT (they don't go through HLL)."""
    from crawler_ray.pipelines.analytics import (
        events_hourly, events_hourly_hll)
    keys = ["event_type", "hour"]
    ex = (events_hourly(SF).to_pandas()
          .sort_values(keys).reset_index(drop=True))
    ap = (events_hourly_hll(SF).to_pandas()
          .sort_values(keys).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        ex[keys + ["n_events", "total_value"]],
        ap[keys + ["n_events", "total_value"]], check_exact=True)
    err = (ap["n_users"] - ex["n_users"]).abs()
    tol = np.maximum(2, 0.05 * ex["n_users"])
    assert (err <= tol).all(), ex.assign(hll=ap["n_users"])[err > tol]


def test_revenue_by_nation_all_join_tiers(ray_session, con):
    """All three adaptive-join plans must produce identical,
    oracle-exact results: tier 1 (full map-side broadcast, no join
    operator), tier 2a (orders shuffle join + customer broadcast
    arrays; sf0.001 has 1500 orders / 150 customers so max=1000
    splits them), tier 2b (both sides shuffle joins)."""
    from crawler_ray.pipelines.analytics import (
        REVENUE_NATION_SQL, revenue_by_nation)
    ora = (con.execute(REVENUE_NATION_SQL).df()
           .sort_values("nation").reset_index(drop=True))
    for broadcast_max in (2_000_000, 1000, 0):
        got = (revenue_by_nation(SF, broadcast_max=broadcast_max)
               .to_pandas().sort_values("nation").reset_index(drop=True))
        cols = sorted(got.columns)
        pd.testing.assert_frame_equal(
            got[cols], ora[cols].astype(got[cols].dtypes.to_dict()),
            check_exact=True)


def test_stopwords_global_ss_vs_exact(ray_session):
    """Bounded-summary heavy hitters vs the exact merge: at default
    capacity the report is exact and certified stable; at a tiny
    capacity the stopword head must still surface with valid
    [count_lo <= exact <= count_hi] bounds."""
    from crawler_ray.pipelines.analytics import (stopwords_global,
                                                 stopwords_global_ss)
    exact = (stopwords_global(SF).to_pandas()
             .set_index("term")["term_count"])

    full = stopwords_global_ss(SF).to_pandas()
    assert full["stable"].all()
    assert list(full["term"]) == list(exact.index)
    np.testing.assert_array_equal(full["count_lo"].to_numpy(),
                                  exact.to_numpy())

    tiny = stopwords_global_ss(SF, capacity=32).to_pandas()
    top5 = set(exact.index[:5])
    assert top5 <= set(tiny["term"])         # the head always survives
    t = tiny.set_index("term")
    for term in top5:
        assert t.loc[term, "count_lo"] <= exact[term] \
            <= t.loc[term, "count_hi"]


def test_doc_chunk_vs_oracle(ray_session, con):
    from crawler_ray.pipelines.analytics import (DOC_CHUNK_SQL,
                                                 doc_chunk_query)
    keys = ["doc_id", "chunk_idx"]
    r = (doc_chunk_query(SF).to_pandas()
         .sort_values(keys).reset_index(drop=True))
    o = (con.execute(DOC_CHUNK_SQL).fetchdf()
         .sort_values(keys).reset_index(drop=True))
    pd.testing.assert_frame_equal(r, o, check_exact=True)
    # overlap really carries over: consecutive chunks share 64 chars
    big = r[r["doc_id"] == r.groupby("doc_id").size().idxmax()]
    if len(big) >= 2:
        a, b = big["chunk_text"].iloc[0], big["chunk_text"].iloc[1]
        assert a[-64:] == b[:64]


def test_doc_top_quality_vs_oracle(ray_session, con):
    """Exact distributed quantile threshold == DuckDB quantile_disc,
    and the filtered row set matches exactly."""
    from crawler_ray.pipelines.analytics import (DOC_TOP_QUALITY_SQL,
                                                 doc_top_quality_query)
    r = (doc_top_quality_query(SF).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    o = (con.execute(DOC_TOP_QUALITY_SQL).fetchdf()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(r, o, check_exact=True)
    assert len(r) > 0


def test_exact_kth_value_random(ray_session):
    """Histogram-refinement selection == np.partition on random data,
    including ranks at both extremes and a heavy-tie column."""
    import ray as _ray

    from crawler_ray.functions.quantile import (exact_kth_value,
                                                exact_quantile_disc)
    rng = np.random.default_rng(3)
    vals = np.concatenate([rng.standard_normal(20_000) * 100,
                           np.full(5_000, 3.25)])       # tie mass
    ds = _ray.data.from_arrow(
        __import__("pyarrow").table({"x": vals})).repartition(16) \
        .materialize()
    srt = np.sort(vals)
    for k in [0, 1, 12_345, len(vals) - 1]:
        assert exact_kth_value(ds, "x", k) == srt[k], k
    import math
    for q in (0.25, 0.5, 0.9):
        k = max(0, math.ceil(q * len(vals)) - 1)
        assert exact_quantile_disc(ds, "x", q) == srt[k], q


def test_exact_kth_two_adjacent_floats(ray_session):
    """Round-3 review repro: a live range of exactly TWO representable
    floats must resolve by rank (count of lo values), not return lo
    unconditionally — [1.0 x2, nextafter(1.0) x8] at q=0.9 is the
    upper value."""
    import math

    import pyarrow as _pa
    import ray as _ray

    from crawler_ray.functions.quantile import exact_quantile_disc
    hi = np.nextafter(1.0, 2.0)
    vals = [1.0, 1.0] + [hi] * 8
    ds = _ray.data.from_arrow(
        _pa.table({"x": _pa.array(vals, _pa.float64())}))
    srt = np.sort(np.array(vals))
    for q in (0.1, 0.2, 0.5, 0.9, 1.0):
        k = max(0, math.ceil(q * len(vals)) - 1)
        assert exact_quantile_disc(ds, "x", q) == srt[k], q


def test_doc_pack_vs_oracle(ray_session, con):
    """Greedy first-fit packing == the recursive-CTE replay, and the
    per-sequence fill never exceeds the budget (except single
    over-budget pieces, which open their own sequence)."""
    from crawler_ray.pipelines.analytics import (DOC_PACK_SQL, PACK_BUDGET,
                                                 doc_pack_query)
    keys = ["doc_id", "piece_idx"]
    r = (doc_pack_query(SF).to_pandas()
         .sort_values(keys).reset_index(drop=True))
    o = (con.execute(DOC_PACK_SQL).fetchdf()
         .sort_values(keys).reset_index(drop=True))
    pd.testing.assert_frame_equal(r, o[r.columns], check_exact=True)
    fills = r.groupby(["doc_id", "seq_idx"]).agg(
        fill=("piece_len", "sum"), n=("piece_len", "size"))
    over = fills[fills["fill"] > PACK_BUDGET]
    assert (over["n"] == 1).all()          # only lone oversized pieces
    assert (r.groupby("doc_id")["seq_idx"].max() > 0).any()  # real packing


def test_doc_sample_vs_oracle(ray_session, con):
    """Hash-derived sampling is reproducible and engine-independent:
    the Ray row set equals the SQL row set exactly, at roughly the
    nominal 25 % rate."""
    from crawler_ray.pipelines.analytics import (DOC_SAMPLE_SQL,
                                                 doc_sample_query)
    r = (doc_sample_query(SF).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    o = (con.execute(DOC_SAMPLE_SQL).fetchdf()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(r, o, check_exact=True)
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert 0.15 <= len(r) / n_docs <= 0.35
