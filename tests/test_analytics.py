"""Analytics pipelines vs their DuckDB oracles on sf0.001 — the
in-repo mirror of the driver's correctness gate for paths the gate
cannot reach (e.g. the shuffle-join variant of revenue_by_nation,
which the sf0.01 run takes the broadcast branch for)."""

import duckdb
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
