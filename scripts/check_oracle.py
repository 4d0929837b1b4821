"""Local replica of the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` entry at the given sf dir and,
where an ``oracle_sql()`` entry exists, compares against DuckDB:
row count, sorted column names, and exact cell values (rows sorted by
all columns — order-insensitive, like the driver's value hash).

Usage:  python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray
    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        else:
            df[c] = df[c].astype(object)
    df = df.sort_values(list(df.columns), kind="mergesort",
                        ignore_index=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        errs.append(f"schema: ray={sorted(ray_df.columns)} "
                    f"sql={sorted(sql_df.columns)}")
        return errs
    if len(ray_df) != len(sql_df):
        errs.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = normalize(ray_df), normalize(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if a[c].dtype == np.float64:
                eq = (av == bv) | (np.isnan(av.astype(float))
                                   & np.isnan(bv.astype(float)))
            else:
                eq = av == bv
            bad = int((~eq).sum())
            if bad:
                i = int(np.nonzero(~eq)[0][0])
                errs.append(f"col {c}: {bad} mismatches; first at row {i}: "
                            f"ray={av[i]!r} sql={bv[i]!r}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failed.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(ray_df)} rows, {dt:.1f}s")
            continue
        sql_df = con.sql(oracles[name]).df()
        errs = compare(name, ray_df, sql_df)
        if errs:
            print(f"FAIL {name} ({dt:.1f}s):")
            for e in errs[:6]:
                print(f"     {e}")
            failed.append(name)
        else:
            print(f"ok   {name}: {len(ray_df)} rows match oracle, {dt:.1f}s")
    print(f"\n{len(failed)} failed" if failed else "\nall green")
    return 1 if failed else 0


if __name__ == "__main__":
    rc = main()
    import ray
    ray.shutdown()
    sys.exit(rc)
