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


def test_revenue_by_nation_both_join_paths(ray_session, con):
    """The adaptive customer join (broadcast arrays vs second
    Dataset.join shuffle) must produce identical, oracle-exact results
    on both branches."""
    from crawler_ray.pipelines.analytics import (
        REVENUE_NATION_SQL, revenue_by_nation)
    ora = (con.execute(REVENUE_NATION_SQL).df()
           .sort_values("nation").reset_index(drop=True))
    for broadcast_max in (2_000_000, 0):    # broadcast / shuffle paths
        got = (revenue_by_nation(SF, broadcast_max=broadcast_max)
               .to_pandas().sort_values("nation").reset_index(drop=True))
        cols = sorted(got.columns)
        pd.testing.assert_frame_equal(
            got[cols], ora[cols].astype(got[cols].dtypes.to_dict()),
            check_exact=True)
