"""Ray-Data-first analytics pipelines over the driver test tables,
each paired with the DuckDB oracle SQL that defines its semantics.

These are the SQL-checkable operators of SURVEY.md §2 (aggregations
A1-A6, joins J1-J6, sorts/top-k O1-O5) re-expressed over the TPC-H-ish
tables, plus the training-data text/dedup/similarity ops. The paired
``*_SQL`` strings live next to the code so the two stay in sync — the
driver's correctness gate hashes both results (columns sorted by name,
order-insensitive), so every aggregate is computed in **exact integer
units** (cents / 1e-4 / 1e-6 units) on both sides: float SUM is not
associative across partitions, so any double accumulated in a shuffle
would hash-mismatch DuckDB's sequential sum. Divisions back to doubles
happen once, on the final reduced value, with the same expression tree
in numpy and SQL — bit-identical IEEE ops.

Scale notes: every per-batch function is vectorized (numpy / pandas
groupby); pre-aggregation happens inside ``map_batches`` before any
``groupby`` shuffle, so the all-to-all exchange moves partial sums
(one row per group per block), not raw rows; dimension lookups are
broadcast (``ray.put`` once, read per task), never shuffled; the one
large-large join (lineitem ⋈ orders) uses ``Dataset.join`` hash
partitioning.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import pyarrow.compute as pc
import ray

from crawler_ray.arrowutil import table_from_pandas as _table_from_pandas
from crawler_ray.functions.textops import (
    ALPHA_RE, DIGIT_RE, EMAIL_RE, IPV4_RE, PHONE_RE, PUNCT_RE, SENT_RE,
    TOKEN_RE, WORD_RE,
)

__all__ = [
    "q1_pricing_summary", "Q1_SQL", "revenue_by_nation", "REVENUE_NATION_SQL",
    "top_parts_by_revenue", "TOP_PARTS_SQL", "events_hourly",
    "EVENTS_HOURLY_SQL", "sessionize", "SESSIONIZE_SQL",
    "stopwords_by_source", "STOPWORDS_SQL", "doc_stats_query", "DOC_STATS_SQL",
    "doc_tokens_query", "DOC_TOKENS_SQL", "doc_quality_query",
    "DOC_QUALITY_SQL", "doc_md5_query", "DOC_MD5_SQL",
]


#: per-block decompressed target for analytics reads. Ray's default
#: splits every read into ~2×num_cpus blocks regardless of size, so a
#: 14 MB column pruning at 32 CPUs becomes 64 × 225 KB blocks and
#: per-block fixed costs (task dispatch, sort-map, schema unify)
#: dominate 3:1 over compute (round-3 profiling: revenue_by_nation
#: 4.5 s → 1.5 s from this alone). 16 MB keeps blocks big enough to
#: amortize those costs yet small enough that batch × concurrency
#: fits worker heaps at 100 TB, where this rule converges to Ray's
#: own target_max_block_size behavior.
_READ_BLOCK_BYTES = 16 << 20


def _read(sf_dir: str, table: str, columns: list[str] | None = None,
          min_blocks: int = 4, **read_kwargs) -> "ray.data.Dataset":
    """Column-pruned read with a SIZE-DERIVED block count: blocks ≈
    pruned-bytes / 16 MB, floored at ``min_blocks`` so small-SF inputs
    still exercise multi-block paths, capped at 2×CPUs (Ray's own
    default) so huge inputs split no finer than the scheduler wants.
    Compute-bound consumers (per-row cost ≫ per-byte cost, e.g. the
    LSH multiprobe explode) pass ``min_blocks="cpus"`` to keep the
    downstream map stage CPU-count-parallel even on tiny inputs."""
    import pyarrow.parquet as pq
    path = os.path.join(sf_dir, f"{table}.parquet")
    md = pq.read_metadata(path)
    cols = set(columns) if columns else None
    nbytes = 0
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            if cols is None or c.path_in_schema.split(".")[0] in cols:
                nbytes += c.total_uncompressed_size
    cpus = int(ray.cluster_resources().get("CPU", 32)) \
        if ray.is_initialized() else 32
    floor = cpus if min_blocks == "cpus" else min_blocks
    nblocks = max(floor, min(2 * cpus, -(-nbytes // _READ_BLOCK_BYTES)))
    # The driver's testdata parquet carries `pandas` schema metadata
    # (a dict value), which defeats Ray's schema hashing inside
    # ReadParquet ("Failed to hash the schemas … unhashable type:
    # 'dict'" log noise, and no block-schema dedup). Hand read_parquet
    # a metadata-stripped schema so every block is born clean.
    if "schema" not in read_kwargs:
        import pyarrow as _pa
        schema = pq.read_schema(path).remove_metadata()
        if columns:
            # pruned batches come back in requested-column order
            schema = _pa.schema([schema.field(c).remove_metadata()
                                 for c in columns])
        read_kwargs["schema"] = schema
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=nblocks,
                                 **read_kwargs)


def _cents(x: np.ndarray, scale: float) -> np.ndarray:
    """Exact integer units for a fixed-point decimal stored as double."""
    return np.round(x * scale).astype(np.int64)


_N_KEY_COARSE = 64


def _coarse_of(ids: np.ndarray) -> np.ndarray:
    """64-way coarse shuffle group for an integer key column — the
    per-key ``map_groups`` fix (one Python call per coarse group, a
    vectorized equal-key run walk inside, instead of one Python call
    per key; see ``dedup._bucket_pairs`` / commit 93185a4)."""
    with np.errstate(over="ignore"):
        h = ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return (h % np.uint64(_N_KEY_COARSE)).astype(np.int64)


def _user_runs(uid: np.ndarray) -> np.ndarray:
    """Boolean mask marking the first row of each equal-key run
    (input must be sorted by the key)."""
    new = np.ones(len(uid), dtype=bool)
    if len(uid) > 1:
        new[1:] = uid[1:] != uid[:-1]
    return new


# --------------------------------------------------------------------------
# Q1: pricing summary (TPC-H Q1 shape) — partial agg inside map_batches,
# tiny groupby of partials after (A-series pre-aggregation pattern)
# --------------------------------------------------------------------------

Q1_CUTOFF = "1998-12-01"

Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sum_qty,
  sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
    AS sum_base_price,
  sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT))
    / 10000.0 AS sum_disc_price,
  sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000,
                 0) AS BIGINT)) / 1000000.0 AS sum_charge,
  sum(CAST(round(l_quantity, 0) AS BIGINT)) / count(*) AS avg_qty,
  (sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0) / count(*)
    AS avg_price,
  (sum(CAST(round(l_discount * 100, 0) AS BIGINT)) / 100.0) / count(*)
    AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


def _q1_partial(batch: pa.Table) -> pa.Table:
    df = pd.DataFrame({
        "l_returnflag": batch["l_returnflag"].to_pandas(),
        "l_linestatus": batch["l_linestatus"].to_pandas(),
    })
    ext = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
    disc = batch["l_discount"].to_numpy(zero_copy_only=False)
    tax = batch["l_tax"].to_numpy(zero_copy_only=False)
    disc_price = ext * (1 - disc)
    charge = disc_price * (1 + tax)
    df["qty_i"] = _cents(batch["l_quantity"].to_numpy(zero_copy_only=False), 1)
    df["base_c"] = _cents(ext, 100)
    df["disc_c4"] = _cents(disc_price, 10000)
    df["charge_c6"] = _cents(charge, 1000000)
    df["disc_pct"] = _cents(disc, 100)
    df["n"] = np.int64(1)
    g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()
    return _table_from_pandas(g)


def _q1_final(g: pd.DataFrame) -> pd.DataFrame:
    qty = np.int64(g["qty_i"].sum())
    base = np.int64(g["base_c"].sum())
    disc4 = np.int64(g["disc_c4"].sum())
    charge6 = np.int64(g["charge_c6"].sum())
    dpct = np.int64(g["disc_pct"].sum())
    n = np.int64(g["n"].sum())
    return pd.DataFrame({
        "l_returnflag": [g["l_returnflag"].iloc[0]],
        "l_linestatus": [g["l_linestatus"].iloc[0]],
        "sum_qty": [qty],
        "sum_base_price": [base / 100.0],
        "sum_disc_price": [disc4 / 10000.0],
        "sum_charge": [charge6 / 1000000.0],
        "avg_qty": [qty / n],
        "avg_price": [(base / 100.0) / n],
        "avg_disc": [(dpct / 100.0) / n],
        "count_order": [n],
    })


def q1_pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    import pyarrow.dataset as pads
    # predicate pushed into the scan: only qualifying row groups leave
    # storage (M5-style date filter at the read)
    cutoff = pads.field("l_shipdate") <= np.datetime64(Q1_CUTOFF, "us")
    return (_read(sf_dir, "lineitem",
                  columns=["l_returnflag", "l_linestatus", "l_quantity",
                           "l_extendedprice", "l_discount", "l_tax",
                           "l_shipdate"],
                  filter=cutoff)
            .map_batches(_q1_partial, batch_format="pyarrow")
            .groupby(["l_returnflag", "l_linestatus"])
            .map_groups(_q1_final, batch_format="pandas"))


# --------------------------------------------------------------------------
# revenue by nation — lineitem ⋈ orders via Dataset.join (hash shuffle),
# orders→customer→nation via broadcast lookup (J1-style small side)
# --------------------------------------------------------------------------

REVENUE_NATION_SQL = """
SELECT n_name AS nation,
  sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT))
    / 10000.0 AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


#: customer-side rows up to which revenue_by_nation uses a broadcast
#: array join (two sorted numpy int arrays ≈ 16 B/row — 32 MB at 2M)
#: instead of a second distributed hash shuffle. Optimizer-style
#: broadcast-vs-shuffle selection by build-side size.
REVENUE_BROADCAST_MAX = 2_000_000


def revenue_by_nation(sf_dir: str,
                      broadcast_max: int = REVENUE_BROADCAST_MAX
                      ) -> "ray.data.Dataset":
    """Optimizer-style plan selection by build-side row count
    (``broadcast_max``; sorted int64 numpy arrays ship at ~16 B/row):

    - **tier 1, both orders and customer fit** (every test/bench SF;
      a real optimizer's broadcast-hash-join choice): ONE streaming
      pass over lineitem — vectorized ``searchsorted`` probe of a
      pre-composed orderkey→nation-index array (``ray.put`` once),
      per-block int64 partial sums by nation — so each block emits
      ≤25 rows and the only shuffle is the 25-row final groupby. No
      join operator, no per-row Python.
    - **tier 2, orders too big** (the 100-TB path): lineitem ⋈ orders
      as a DISTRIBUTED hash ``Dataset.join``; the customer side again
      adaptive — broadcast arrays if it fits, else a second
      ``Dataset.join``. Probe sides are pre-aggregated inside
      ``map_batches`` before every shuffle, so shuffles move partial
      sums, not raw rows.

    Nation (≤25 rows) is always closure-broadcast. (Round-2 verdict:
    the previous driver-built full-customer dict was the suite's
    scale-killer; round-3 profiling showed the per-execution
    ``Dataset.join`` aggregator-actor spin-up dominating small-SF
    wall time, hence tier 1.)"""
    import pyarrow.parquet as pq

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_name"])
    nk = np.asarray(nat["n_nationkey"].to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    nv = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    nord = np.argsort(nk)
    nk, nv = nk[nord], nv[nord]     # 25 rows — closure-broadcast

    def nation_of(nationkeys: np.ndarray) -> np.ndarray:
        idx = np.minimum(np.searchsorted(nk, nationkeys), len(nk) - 1)
        return nv[idx]

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "nation": [g["nation"].iloc[0]],
            "revenue": [np.int64(g["rev4"].sum()) / 10000.0],
            "n_items": [np.int64(g["n"].sum())],
        })

    cust_path = os.path.join(sf_dir, "customer.parquet")
    orders_path = os.path.join(sf_dir, "orders.parquet")
    n_cust = pq.read_metadata(cust_path).num_rows
    n_orders = pq.read_metadata(orders_path).num_rows

    if n_orders <= broadcast_max and n_cust <= broadcast_max:
        # tier 1: compose orderkey → nation index ONCE on the driver
        # (two sorted-array probes over ≤broadcast_max rows), ship the
        # pair of arrays, stream lineitem through a single stage
        ct = pq.read_table(cust_path, columns=["c_custkey", "c_nationkey"])
        ck = ct["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cn = ct["c_nationkey"].to_numpy(zero_copy_only=False
                                        ).astype(np.int64)
        cord = np.argsort(ck)
        ck, cn = ck[cord], cn[cord]
        ot = pq.read_table(orders_path, columns=["o_orderkey", "o_custkey"])
        ok = ot["o_orderkey"].to_numpy(zero_copy_only=False
                                       ).astype(np.int64)
        oc = ot["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        oord = np.argsort(ok)
        ok, oc = ok[oord], oc[oord]
        # verified probes — inner-join semantics: an order whose
        # custkey is absent from customer gets sentinel -1 (clamped
        # searchsorted alone would silently credit the revenue to the
        # NEAREST key's nation on any input without perfect FKs)
        cidx = np.minimum(np.searchsorted(ck, oc), len(ck) - 1)
        nidx = np.minimum(np.searchsorted(nk, cn[cidx]), len(nk) - 1
                          ).astype(np.int32)
        onat = np.where((ck[cidx] == oc) & (nk[nidx] == cn[cidx]),
                        nidx, np.int32(-1))    # nation index per order
        lookup_ref = ray.put((ok, onat))

        def li_to_nation(batch: pa.Table) -> pa.Table:
            oks, onats = ray.get(lookup_ref)
            keys = batch["l_orderkey"].to_numpy(zero_copy_only=False
                                                ).astype(np.int64)
            pos = np.minimum(np.searchsorted(oks, keys), len(oks) - 1)
            ni = onats[pos]
            # drop rows whose orderkey misses orders, or whose order
            # carried the missing-customer sentinel (inner join)
            keep = (oks[pos] == keys) & (ni >= 0)
            if not keep.all():
                batch = batch.filter(pa.array(keep))
                ni = ni[keep]
            ext = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = batch["l_discount"].to_numpy(zero_copy_only=False)
            # int64-exact partial sums per nation (pandas C groupby;
            # np.bincount would round through float64)
            df = pd.DataFrame({"ni": ni,
                               "rev4": _cents(ext * (1 - disc), 10000),
                               "n": np.int64(1)})
            g = df.groupby("ni", as_index=False).sum()
            return pa.table({"nation": nv[g["ni"].to_numpy()],
                             "rev4": g["rev4"].to_numpy(),
                             "n": g["n"].to_numpy()})

        return (_read(sf_dir, "lineitem",
                      columns=["l_orderkey", "l_extendedprice",
                               "l_discount"])
                .map_batches(li_to_nation, batch_format="pyarrow")
                .groupby("nation").map_groups(final,
                                              batch_format="pandas"))

    def li_partial(batch: pa.Table) -> pa.Table:
        ext = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "l_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
            "rev4": _cents(ext * (1 - disc), 10000),
            "n": np.int64(1),
        })
        g = df.groupby("l_orderkey", as_index=False).sum()
        return _table_from_pandas(g)

    li = (_read(sf_dir, "lineitem",
                columns=["l_orderkey", "l_extendedprice", "l_discount"])
          .map_batches(li_partial, batch_format="pyarrow"))
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    joined = li.join(orders, "inner", num_partitions=8,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def cust_partial(batch: pa.Table) -> pa.Table:
        # pre-agg by custkey: the customer join's left side shrinks to
        # ≤ distinct custkeys per block before the shuffle
        df = pd.DataFrame({
            "o_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False),
            "rev4": batch["rev4"].to_numpy(zero_copy_only=False),
            "n": batch["n"].to_numpy(zero_copy_only=False),
        })
        g = df.groupby("o_custkey", as_index=False).sum()
        return _table_from_pandas(g)

    if n_cust <= broadcast_max:
        # broadcast path: two sorted int64 arrays, searchsorted probe
        ct = pq.read_table(cust_path, columns=["c_custkey", "c_nationkey"])
        ck = ct["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cn = ct["c_nationkey"].to_numpy(zero_copy_only=False
                                        ).astype(np.int64)
        cord = np.argsort(ck)
        lookup_ref = ray.put((ck[cord], cn[cord]))

        def to_nation(batch: pa.Table) -> pa.Table:
            cks, cns = ray.get(lookup_ref)
            ok = batch["o_custkey"].to_numpy(zero_copy_only=False
                                             ).astype(np.int64)
            idx = np.minimum(np.searchsorted(cks, ok), len(cks) - 1)
            keep = cks[idx] == ok         # inner-join: drop missing FKs
            if not keep.all():
                batch = batch.filter(pa.array(keep))
                idx = idx[keep]
            df = pd.DataFrame({
                "nation": nation_of(cns[idx]),
                "rev4": batch["rev4"].to_numpy(zero_copy_only=False),
                "n": batch["n"].to_numpy(zero_copy_only=False)})
            g = df.groupby("nation", as_index=False).sum()
            return _table_from_pandas(g)

        j2 = joined.map_batches(cust_partial, batch_format="pyarrow")
    else:
        # shuffle path: second distributed hash join
        cust = _read(sf_dir, "customer",
                     columns=["c_custkey", "c_nationkey"])
        j2 = (joined.map_batches(cust_partial, batch_format="pyarrow")
                    .join(cust, "inner", num_partitions=8,
                          on=("o_custkey",), right_on=("c_custkey",)))

        def to_nation(batch: pa.Table) -> pa.Table:
            cns = batch["c_nationkey"].to_numpy(zero_copy_only=False
                                                ).astype(np.int64)
            df = pd.DataFrame({
                "nation": nation_of(cns),
                "rev4": batch["rev4"].to_numpy(zero_copy_only=False),
                "n": batch["n"].to_numpy(zero_copy_only=False)})
            g = df.groupby("nation", as_index=False).sum()
            return _table_from_pandas(g)

    return (j2.map_batches(to_nation, batch_format="pyarrow")
              .groupby("nation").map_groups(final, batch_format="pandas"))


# --------------------------------------------------------------------------
# top-k parts by revenue — pre-agg → groupby → global sort → limit (O-series)
# --------------------------------------------------------------------------

TOP_PARTS_SQL = """
WITH pr AS (
  SELECT l_partkey AS partkey,
    sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT))
      AS rev4
  FROM lineitem GROUP BY l_partkey
)
SELECT pr.partkey, pr.rev4 / 10000.0 AS revenue, p_name
FROM pr JOIN part ON partkey = p_partkey
ORDER BY pr.rev4 DESC, pr.partkey
LIMIT 10
"""


def top_parts_by_revenue(sf_dir: str) -> pa.Table:
    import pyarrow.parquet as pq

    def partial(batch: pa.Table) -> pa.Table:
        ext = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "partkey": batch["l_partkey"].to_numpy(zero_copy_only=False),
            "rev4": _cents(ext * (1 - disc), 10000)})
        g = df.groupby("partkey", as_index=False).sum()
        g["_c"] = _coarse_of(g["partkey"].to_numpy())
        return _table_from_pandas(g)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        # one C-speed pandas groupby per coarse group — a raw
        # groupby(partkey) would pay one Python call per part key
        # (~200k at sf1; the slowest query in BENCH_r01 for that)
        out = g.groupby("partkey", as_index=False)["rev4"].sum()
        out["rev4"] = out["rev4"].astype(np.int64)
        out["neg_rev4"] = -out["rev4"]
        return out

    top = (_read(sf_dir, "lineitem",
                 columns=["l_partkey", "l_extendedprice", "l_discount"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("_c").map_groups(combine, batch_format="pandas")
           .sort(["neg_rev4", "partkey"])
           .limit(10)
           .to_pandas())
    # 10-row driver-side name lookup against the part table (broadcast-
    # small final join; at scale this is a filtered parquet read)
    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_name"])
    names = dict(zip(part["p_partkey"].to_pylist(), part["p_name"].to_pylist()))
    return pa.table({
        "partkey": pa.array(top["partkey"].to_numpy()),
        "revenue": pa.array(top["rev4"].to_numpy() / 10000.0),
        "p_name": pa.array([names[k] for k in top["partkey"]], pa.string()),
    })


# --------------------------------------------------------------------------
# events: hourly rollup + sessionization (streaming-table ops)
# --------------------------------------------------------------------------

EVENTS_HOURLY_SQL = """
SELECT event_type,
  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
  count(*) AS n_events,
  sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS total_value,
  count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type, hour
"""


def events_hourly(sf_dir: str) -> "ray.data.Dataset":
    """Hourly rollup with exact count-distinct via the two-level
    distinct pattern: the per-batch partial pre-aggregates to one row
    per DISTINCT (event_type, hour, user_id) — so the shuffle moves
    distinct triplets, not raw events — and the final stage merges
    triplets inside a 64-way coarse group with one C-speed pandas
    groupby (not one Python call per (type, hour))."""
    def partial(batch: pa.Table) -> pa.Table:
        hours = pd.Series(batch["ts"].to_pandas()).dt.floor("h") \
                  .dt.strftime("%Y-%m-%d %H:00")
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas(),
            "hour": hours.to_numpy(),
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "value_c": _cents(
                batch["value"].to_numpy(zero_copy_only=False), 100),
        })
        p = df.groupby(["event_type", "hour", "user_id"],
                       as_index=False).agg(n=("value_c", "size"),
                                           value_c=("value_c", "sum"))
        # deterministic vectorized string hash (fixed-key siphash)
        h = (pd.util.hash_array(p["event_type"].to_numpy(object))
             ^ pd.util.hash_array(p["hour"].to_numpy(object)))
        p["_c"] = (h % np.uint64(_N_KEY_COARSE)).astype(np.int64)
        p["n"] = p["n"].astype(np.int64)
        return _table_from_pandas(p)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["event_type", "hour", "user_id"],
                      as_index=False).agg(n=("n", "sum"),
                                          value_c=("value_c", "sum"))
        out = m.groupby(["event_type", "hour"], as_index=False).agg(
            n_events=("n", "sum"), value_c=("value_c", "sum"),
            n_users=("user_id", "size"))
        return pd.DataFrame({
            "event_type": out["event_type"],
            "hour": out["hour"],
            "n_events": out["n_events"].astype(np.int64),
            "total_value": out["value_c"].to_numpy().astype(np.int64)
                           / 100.0,
            "n_users": out["n_users"].astype(np.int64),
        })

    return (_read(sf_dir, "events",
                  columns=["event_type", "ts", "value", "user_id"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("_c")
            .map_groups(final, batch_format="pandas"))


def events_hourly_hll(sf_dir: str, p: int | None = None
                      ) -> "ray.data.Dataset":
    """:func:`events_hourly` with the user count-distinct replaced by
    HyperLogLog — the scale variant for cardinalities where the exact
    two-level distinct's shuffle (one row per distinct triplet)
    becomes the bottleneck. Each block contributes ONE ``2^p``-byte
    register blob per (event_type, hour) group; blobs merge by
    elementwise max in the coarse-group reduce, so shuffle volume is
    ``O(groups × blocks × 2^p)`` — independent of user cardinality.
    ``n_events``/``total_value`` stay exact (same partial-sum path).
    n_users carries HLL's ±1.04/√m standard error (±1.6 % at the
    default p=12); tolerance-tested against the exact path."""
    from crawler_ray.functions.hll import HLL_P, hll_estimate, \
        hll_merge, hll_partial
    p = HLL_P if p is None else p

    def partial(batch: pa.Table) -> pa.Table:
        hours = pd.Series(batch["ts"].to_pandas()).dt.floor("h") \
                  .dt.strftime("%Y-%m-%d %H:00")
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas(),
            "hour": hours.to_numpy(),
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "value_c": _cents(
                batch["value"].to_numpy(zero_copy_only=False), 100),
        })
        agg = df.groupby(["event_type", "hour"], as_index=False).agg(
            n=("value_c", "size"), value_c=("value_c", "sum"))
        regs = [
            hll_partial(g["user_id"].to_numpy(), p)
            for _, g in df.groupby(["event_type", "hour"], sort=True)
        ]
        h = (pd.util.hash_array(agg["event_type"].to_numpy(object))
             ^ pd.util.hash_array(agg["hour"].to_numpy(object)))
        return pa.table({
            "event_type": pa.array(agg["event_type"]),
            "hour": pa.array(agg["hour"]),
            "n": pa.array(agg["n"].to_numpy().astype(np.int64)),
            "value_c": pa.array(agg["value_c"].to_numpy()),
            "_hll": pa.array(regs, pa.binary()),
            "_c": pa.array((h % np.uint64(_N_KEY_COARSE))
                           .astype(np.int64)),
        })

    def final(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (et, hr), sub in g.groupby(["event_type", "hour"],
                                       sort=True):
            rows.append({
                "event_type": et, "hour": hr,
                "n_events": np.int64(sub["n"].sum()),
                "total_value": np.int64(sub["value_c"].sum()) / 100.0,
                "n_users": np.int64(hll_estimate(
                    hll_merge(sub["_hll"].tolist()))),
            })
        return pd.DataFrame(rows)

    return (_read(sf_dir, "events",
                  columns=["event_type", "ts", "value", "user_id"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("_c")
            .map_groups(final, batch_format="pandas"))


SESSION_GAP_MIN = 30

SESSIONIZE_SQL = f"""
WITH o AS (
  SELECT user_id, event_id, ts,
    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
  FROM events
), b AS (
  SELECT user_id, event_id, ts,
    CASE WHEN pts IS NULL OR ts - pts > INTERVAL '{SESSION_GAP_MIN} minutes'
         THEN 1 ELSE 0 END AS brk
  FROM o
), s AS (
  SELECT user_id,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sess
  FROM b
), c AS (
  SELECT user_id, sess, count(*) AS cnt FROM s GROUP BY user_id, sess
)
SELECT user_id, count(*) AS n_sessions, CAST(sum(cnt) AS BIGINT) AS n_events,
       max(cnt) AS max_session_events
FROM c GROUP BY user_id
"""


def sessionize(sf_dir: str) -> "ray.data.Dataset":
    """Per-user session stats (gap > 30 min ⇒ new session) — the
    windowed/stateful streaming op. Shuffle key is a 64-way hash of
    the user (NOT the raw user id: per-user ``map_groups`` costs one
    Python call per user); inside each coarse group one sort +
    vectorized run walk computes every user's sessions at C speed."""
    gap = np.timedelta64(SESSION_GAP_MIN * 60, "s")

    def add_coarse(batch: pa.Table) -> pa.Table:
        return batch.append_column("_c", pa.array(_coarse_of(
            batch["user_id"].to_numpy(zero_copy_only=False))))

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        n = len(g)
        new_user = _user_runs(uid)
        brk = new_user.copy()
        if n > 1:
            brk[1:] |= (ts[1:] - ts[:-1]) > gap
        s_idx = np.flatnonzero(brk)                 # session starts
        sizes = np.diff(np.append(s_idx, n))        # per-session sizes
        u_idx = np.flatnonzero(new_user)            # user starts
        # u_idx ⊆ s_idx (user start always opens a session)
        sess_start = np.searchsorted(s_idx, u_idx)
        return pd.DataFrame({
            "user_id": uid[u_idx],
            "n_sessions": np.diff(np.append(sess_start, len(s_idx)))
                            .astype(np.int64),
            "n_events": np.diff(np.append(u_idx, n)).astype(np.int64),
            "max_session_events": np.maximum.reduceat(sizes, sess_start)
                                    .astype(np.int64),
        })

    return (_read(sf_dir, "events", columns=["user_id", "event_id", "ts"])
            .map_batches(add_coarse, batch_format="pyarrow")
            .groupby("_c")
            .map_groups(per_group, batch_format="pandas"))


# --------------------------------------------------------------------------
# stopword aggregation (A1/A2): per-source term counts, top-10
# --------------------------------------------------------------------------

STOPWORDS_TOP_N = 10

STOPWORDS_SQL = f"""
WITH toks AS (
  SELECT source,
         unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS term
  FROM documents
), counts AS (
  SELECT source, term, count(*) AS term_count
  FROM toks WHERE term <> '' GROUP BY source, term
), ranked AS (
  SELECT source, term, term_count,
    row_number() OVER (PARTITION BY source
                       ORDER BY term_count DESC, term) AS rk
  FROM counts
)
SELECT source, term, term_count FROM ranked WHERE rk <= {STOPWORDS_TOP_N}
"""

_TERM_SPLIT = re.compile(r"[^a-z]+")


def stopwords_by_source(sf_dir: str, top_n: int = STOPWORDS_TOP_N
                        ) -> "ray.data.Dataset":
    """Reference A1 (``services/dpa_stopwords_service.py:28-104``)
    reshaped: per-block Counter partials → groupby(source, term) merge
    → per-source top-n. The shuffle moves (source, term, partial)
    rows, not documents."""
    from collections import Counter

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for src, text in zip(batch["source"].to_pylist(),
                             batch["text"].to_pylist()):
            for term in _TERM_SPLIT.split((text or "").lower()):
                if term:
                    counts[(src, term)] += 1
        items = sorted(counts.items())
        return pa.table({
            "source": pa.array([k[0] for k, _ in items], pa.string()),
            "term": pa.array([k[1] for k, _ in items], pa.string()),
            "term_count": pa.array([v for _, v in items], pa.int64()),
        })

    def merge_and_topn(g: pd.DataFrame) -> pd.DataFrame:
        # per-source group: one C-speed pandas merge of the per-block
        # partials, then the local top-n (shuffle key = source only —
        # a (source, term) groupby would invoke Python per term)
        m = g.groupby("term", as_index=False)["term_count"].sum()
        m.insert(0, "source", g["source"].iloc[0])
        m = m.sort_values(["term_count", "term"], ascending=[False, True],
                          kind="mergesort")
        m["term_count"] = m["term_count"].astype(np.int64)
        return m.head(top_n)

    return (_read(sf_dir, "documents", columns=["source", "text"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("source")
            .map_groups(merge_and_topn, batch_format="pandas"))


STOPWORDS_GLOBAL_SQL = f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS term
  FROM documents
), counts AS (
  SELECT term, count(*) AS term_count FROM toks
  WHERE term <> '' GROUP BY term
), ranked AS (
  SELECT term, term_count,
    row_number() OVER (ORDER BY term_count DESC, term) AS rk
  FROM counts
)
SELECT term, term_count FROM ranked WHERE rk <= {STOPWORDS_TOP_N}
"""


def stopwords_global(sf_dir: str, top_n: int = STOPWORDS_TOP_N
                     ) -> "ray.data.Dataset":
    """A2: the cross-source merge of the stopword counts
    (``services/gdpr_stopwords_service.py:20-26`` union, with real
    count-merge semantics). Per-block term partials → 64-way
    term-hash groups (each term lives wholly in one group, so the
    global top-n ⊆ union of per-group top-n) → distributed sort +
    limit. The shuffle moves (term, partial-count) rows only."""
    import zlib
    from collections import Counter

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for text in batch["text"].to_pylist():
            for term in _TERM_SPLIT.split((text or "").lower()):
                if term:
                    counts[term] += 1
        items = sorted(counts.items())
        return pa.table({
            "term": pa.array([k for k, _ in items], pa.string()),
            "term_count": pa.array([v for _, v in items], pa.int64()),
            "_c": pa.array([zlib.crc32(k.encode()) % 64 for k, _ in items],
                           pa.int64()),
        })

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("term", as_index=False)["term_count"].sum()
        m = m.sort_values(["term_count", "term"], ascending=[False, True],
                          kind="mergesort").head(top_n)
        m["term_count"] = m["term_count"].astype(np.int64)
        return m[["term", "term_count"]]

    return (_read(sf_dir, "documents", columns=["text"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("_c")
            .map_groups(per_group, batch_format="pandas")
            .sort(["term_count", "term"], descending=[True, False])
            .limit(top_n))


def stopwords_global_ss(sf_dir: str, top_n: int = STOPWORDS_TOP_N,
                        capacity: int | None = None) -> "pa.Table":
    """:func:`stopwords_global` with each block's contribution capped
    at a bounded summary (:mod:`crawler_ray.functions.topk`) — the
    scale variant for corpora whose vocabulary (typos, ids, hashes)
    grows with the data. Shuffle volume is ``O(blocks × capacity)``
    instead of the vocabulary size; every reported term carries
    certified ``[count_lo, count_hi]`` bounds and the report is
    flagged ``stable`` when no dropped term could outrank it (the
    usual case — stopword counts dwarf the tail bound). Driver-side
    work is only the 64 per-group top-n lists + one tail row per
    block. Tolerance-tested against the exact path."""
    import zlib
    from collections import Counter

    from crawler_ray.functions.topk import (TAIL_MARKER, TOPK_CAPACITY,
                                            merge_summaries,
                                            summarize_counts)
    cap = TOPK_CAPACITY if capacity is None else capacity

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for text in batch["text"].to_pylist():
            for term in _TERM_SPLIT.split((text or "").lower()):
                if term:
                    counts[term] += 1
        items = sorted(counts.items())
        terms = np.array([k for k, _ in items], dtype=object)
        cnts = np.array([v for _, v in items], dtype=np.int64)
        terms, cnts, tail = summarize_counts(terms, cnts, cap)
        out_t = list(terms)
        out_c = [int(c) for c in cnts]
        if tail:
            out_t.append(TAIL_MARKER)
            out_c.append(tail)
        return pa.table({
            "term": pa.array(out_t, pa.string()),
            "term_count": pa.array(out_c, pa.int64()),
            "_c": pa.array([zlib.crc32(t.encode()) % 64 for t in out_t],
                           pa.int64()),
        })

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        tails = g[g["term"] == TAIL_MARKER]
        m = (g[g["term"] != TAIL_MARKER]
             .groupby("term", as_index=False)["term_count"].sum())
        # a term lives wholly in one term-hash group, so the group sum
        # IS its global count_lo — per-group top-n covers the report
        m = m.sort_values(["term_count", "term"], ascending=[False, True],
                          kind="mergesort").head(top_n)
        out = pd.concat([m, tails[["term", "term_count"]]])
        out["term_count"] = out["term_count"].astype(np.int64)
        return out[["term", "term_count"]]

    summary = (_read(sf_dir, "documents", columns=["text"])
               .map_batches(partial, batch_format="pyarrow")
               .groupby("_c")
               .map_groups(per_group, batch_format="pandas")
               .to_pandas())
    report, tail_sum = merge_summaries(summary, top_n)
    stable = bool(len(report)
                  and int(report["count_lo"].iloc[-1]) > tail_sum)
    return pa.table({
        "term": pa.array(report["term"], pa.string()),
        "count_lo": pa.array(report["count_lo"], pa.int64()),
        "count_hi": pa.array(report["count_hi"], pa.int64()),
        "stable": pa.array([stable] * len(report), pa.bool_()),
    })


# --------------------------------------------------------------------------
# document text-analysis queries (kernels from functions/textops.py)
# --------------------------------------------------------------------------

DOC_STATS_SQL = rf"""
SELECT doc_id,
  length(text) AS n_chars,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  length(regexp_extract_all(text, '{WORD_RE}')) AS n_words,
  length(regexp_extract_all(text, '{SENT_RE}')) AS n_sentences,
  CAST(floor(length(text) / 3000) AS BIGINT) AS n_pages,
  length(regexp_extract_all(text, '{WORD_RE}')) / 265.0 AS read_time_min
FROM documents
"""


def doc_stats_query(sf_dir: str) -> "ray.data.Dataset":
    from crawler_ray.functions.textops import text_stats
    return (_read(sf_dir, "documents", columns=["doc_id", "text"])
            .map_batches(text_stats, batch_format="pyarrow"))


DOC_TOKENS_SQL = rf"""
SELECT doc_id,
  length(regexp_extract_all(text, '{WORD_RE}')) AS n_ws_tokens,
  length(regexp_extract_all(text, '{TOKEN_RE}')) AS n_bpe_tokens
FROM documents
"""


def doc_tokens_query(sf_dir: str) -> "ray.data.Dataset":
    from crawler_ray.functions.textops import token_counts
    return (_read(sf_dir, "documents", columns=["doc_id", "text"])
            .map_batches(token_counts, batch_format="pyarrow"))


DOC_QUALITY_SQL = rf"""
SELECT doc_id,
  length(regexp_extract_all(text, '{ALPHA_RE}'))
    / greatest(length(text), 1) AS alpha_ratio,
  length(regexp_extract_all(text, '{DIGIT_RE}'))
    / greatest(length(text), 1) AS digit_ratio,
  length(regexp_extract_all(text, '{PUNCT_RE}'))
    / greatest(length(text), 1) AS punct_ratio,
  length(regexp_extract_all(text, '{ALPHA_RE}'))
    / greatest(length(regexp_extract_all(text, '{WORD_RE}')), 1)
    AS mean_word_len,
  least(length(text) / 50.0, 1.0) AS length_score,
  length(regexp_extract_all(text, '{ALPHA_RE}'))
      / greatest(length(text), 1) * 0.5
    + least(length(text) / 50.0, 1.0) * 0.3
    + (1.0 - length(regexp_extract_all(text, '{PUNCT_RE}'))
             / greatest(length(text), 1)) * 0.1
    + (1.0 - length(regexp_extract_all(text, '{DIGIT_RE}'))
             / greatest(length(text), 1)) * 0.1 AS quality
FROM documents
"""


def doc_quality_query(sf_dir: str) -> "ray.data.Dataset":
    from crawler_ray.functions.textops import quality_scores
    return (_read(sf_dir, "documents", columns=["doc_id", "text"])
            .map_batches(quality_scores, batch_format="pyarrow"))


DOC_MD5_SQL = """
SELECT doc_id, md5(text) AS content_md5 FROM documents
"""

# PII redaction (sequential email → phone → ip, matching
# functions/textops.pii_redact's fixed operation tree). Concatenated,
# not an f-string: EMAIL_RE contains a {2,} quantifier.
DOC_PII_SQL = (
    "WITH s1 AS (\n"
    "  SELECT doc_id,\n"
    "    length(regexp_extract_all(text, '" + EMAIL_RE + "')) AS n_emails,\n"
    "    regexp_replace(text, '" + EMAIL_RE + "', '<EMAIL>', 'g') AS t1\n"
    "  FROM documents\n"
    "), s2 AS (\n"
    "  SELECT doc_id, n_emails,\n"
    "    length(regexp_extract_all(t1, '" + PHONE_RE + "')) AS n_phones,\n"
    "    regexp_replace(t1, '" + PHONE_RE + "', '<PHONE>', 'g') AS t2\n"
    "  FROM s1\n"
    ")\n"
    "SELECT doc_id, n_emails, n_phones,\n"
    "  length(regexp_extract_all(t2, '" + IPV4_RE + "')) AS n_ipv4,\n"
    "  md5(regexp_replace(t2, '" + IPV4_RE + "', '<IP>', 'g'))"
    " AS redacted_md5\n"
    "FROM s2\n")


def doc_pii_query(sf_dir: str) -> "ray.data.Dataset":
    from crawler_ray.functions.textops import pii_redact
    return (_read(sf_dir, "documents", columns=["doc_id", "text"])
            .map_batches(pii_redact, batch_format="pyarrow"))


DOC_SPLIT_SQL = """
SELECT doc_id,
  substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket_hex,
  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
       ELSE 'test' END AS split
FROM documents
"""


def doc_split_query(sf_dir: str) -> "ray.data.Dataset":
    from crawler_ray.functions.textops import hash_split
    return (_read(sf_dir, "documents", columns=["doc_id"])
            .map_batches(hash_split, batch_format="pyarrow"))


# C4-style quality filter: the pipeline form of doc_quality — keep
# documents whose measured signals clear fixed thresholds (the ratios
# are the bit-exact expressions already verified by doc_quality).
DOC_FILTER_SQL = rf"""
WITH q AS (
  SELECT doc_id,
    length(regexp_extract_all(text, '{WORD_RE}')) AS n_words,
    length(regexp_extract_all(text, '{ALPHA_RE}'))
      / greatest(length(text), 1) AS alpha_ratio,
    length(regexp_extract_all(text, '{PUNCT_RE}'))
      / greatest(length(text), 1) AS punct_ratio,
    length(regexp_extract_all(text, '{ALPHA_RE}'))
      / greatest(length(regexp_extract_all(text, '{WORD_RE}')), 1)
      AS mean_word_len
  FROM documents
)
SELECT doc_id, n_words, alpha_ratio, mean_word_len FROM q
WHERE n_words >= 50 AND alpha_ratio >= 0.6 AND punct_ratio <= 0.2
  AND mean_word_len BETWEEN 3 AND 12
"""


def doc_filter_query(sf_dir: str) -> "ray.data.Dataset":
    """Predicate-pushdown form of the quality filter: the signals are
    computed per batch and the filter applied inside the same
    map_batches, so dropped rows never leave the stage."""
    from crawler_ray.functions.textops import (WORD_RE, _count,
                                               quality_scores)

    def fil(batch: pa.Table) -> pa.Table:
        q = quality_scores(batch)
        n_words = _count(batch["text"], WORD_RE)
        alpha = q["alpha_ratio"].to_numpy(zero_copy_only=False)
        punct = q["punct_ratio"].to_numpy(zero_copy_only=False)
        mwl = q["mean_word_len"].to_numpy(zero_copy_only=False)
        keep = ((n_words >= 50) & (alpha >= 0.6) & (punct <= 0.2)
                & (mwl >= 3) & (mwl <= 12))
        return pa.table({
            "doc_id": batch["doc_id"].filter(pa.array(keep)),
            "n_words": pa.array(n_words[keep]),
            "alpha_ratio": pa.array(alpha[keep]),
            "mean_word_len": pa.array(mwl[keep]),
        })

    return (_read(sf_dir, "documents", columns=["doc_id", "text"])
            .map_batches(fil, batch_format="pyarrow"))


def doc_md5_query(sf_dir: str) -> "ray.data.Dataset":
    def fn(batch: pa.Table) -> pa.Table:
        import hashlib
        return pa.table({
            "doc_id": batch["doc_id"],
            "content_md5": pa.array(
                [hashlib.md5((t or "").encode()).hexdigest()
                 for t in batch["text"].to_pylist()], pa.string()),
        })
    return (_read(sf_dir, "documents", columns=["doc_id", "text"])
            .map_batches(fn, batch_format="pyarrow"))


CHUNK_SIZE, CHUNK_OVERLAP = 512, 64

DOC_CHUNK_SQL = f"""
SELECT d.doc_id, CAST(t.i AS BIGINT) AS chunk_idx,
  substring(coalesce(d.text, ''),
            CAST(t.i * {CHUNK_SIZE - CHUNK_OVERLAP} + 1 AS BIGINT),
            {CHUNK_SIZE}) AS chunk_text
FROM documents d,
  unnest(range(0,
    CASE WHEN length(coalesce(d.text, '')) <= {CHUNK_SIZE} THEN 1
    ELSE CAST(ceil((length(d.text) - {CHUNK_SIZE})
                   / {float(CHUNK_SIZE - CHUNK_OVERLAP)}) AS BIGINT) + 1
    END)) AS t(i)
"""


def doc_chunk_query(sf_dir: str, size: int = CHUNK_SIZE,
                    overlap: int = CHUNK_OVERLAP) -> "ray.data.Dataset":
    """Training-window chunking: each document explodes into
    fixed-size character windows with ``overlap`` carry-over (the
    sequence-packing precursor — token-exact packing sits behind the
    tokenizer, but window boundaries are byte/char math and belong in
    the engine). A pure ``flat_map``-shaped ``map_batches``: output
    rows ≈ corpus_chars / step, no shuffle, streams block-by-block.
    Chunk rows keep ``(doc_id, chunk_idx)`` so downstream dedup /
    packing can re-key without re-reading the corpus."""
    step = size - overlap

    def chunks(batch: pa.Table) -> pa.Table:
        import math as _m
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_id: list = []
        out_idx: list = []
        out_txt: list = []
        for did, t in zip(ids, batch["text"].to_pylist()):
            t = t or ""
            n = 1 if len(t) <= size else 1 + _m.ceil((len(t) - size)
                                                     / step)
            for i in range(n):
                out_id.append(did)
                out_idx.append(i)
                out_txt.append(t[i * step:i * step + size])
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "chunk_idx": pa.array(out_idx, pa.int64()),
            "chunk_text": pa.array(out_txt, pa.string()),
        })

    return (_read(sf_dir, "documents", columns=["doc_id", "text"])
            .map_batches(chunks, batch_format="pyarrow"))


DOC_TOP_QUALITY_SQL = rf"""
WITH q AS ({DOC_QUALITY_SQL})
SELECT doc_id, quality FROM q
WHERE quality >= (SELECT quantile_disc(quality, 0.75) FROM q)
"""


def doc_top_quality_query(sf_dir: str, q: float = 0.75
                          ) -> "ray.data.Dataset":
    """Keep the top ``(1-q)`` of documents by composite quality score,
    with the threshold computed EXACTLY and distributed
    (:mod:`crawler_ray.functions.quantile` histogram refinement —
    ``O(blocks × 8192)`` ints per counting pass, never a value
    shuffle), then a stateless filter pass over the materialized
    score table. Threshold semantics match DuckDB ``quantile_disc``
    bit-for-bit, so the query is hash-checked, not rows-only."""
    import pyarrow.compute as _pc

    from crawler_ray.functions.quantile import exact_quantile_disc
    from crawler_ray.functions.textops import quality_scores
    scores = (_read(sf_dir, "documents", columns=["doc_id", "text"])
              .map_batches(quality_scores, batch_format="pyarrow")
              .select_columns(["doc_id", "quality"])
              .materialize())
    thr = exact_quantile_disc(scores, "quality", q)

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(_pc.greater_equal(batch["quality"], thr))

    return scores.map_batches(keep, batch_format="pyarrow")


PACK_BUDGET = 40

DOC_PACK_SQL = f"""
WITH RECURSIVE pieces AS (
  SELECT doc_id,
         CAST(unnest(range(len(arr))) AS BIGINT) AS piece_idx,
         CAST(length(unnest(arr)) AS BIGINT) AS piece_len
  FROM (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS arr
        FROM documents)
), s AS (
  SELECT doc_id, piece_idx, piece_len,
         CAST(0 AS BIGINT) AS seq_idx, piece_len AS fill
  FROM pieces WHERE piece_idx = 0
  UNION ALL
  SELECT p.doc_id, p.piece_idx, p.piece_len,
         CASE WHEN s.fill + p.piece_len > {PACK_BUDGET}
              THEN s.seq_idx + 1 ELSE s.seq_idx END,
         CASE WHEN s.fill + p.piece_len > {PACK_BUDGET}
              THEN p.piece_len ELSE s.fill + p.piece_len END
  FROM pieces p
  JOIN s ON p.doc_id = s.doc_id AND p.piece_idx = s.piece_idx + 1
)
SELECT doc_id, piece_idx, piece_len, seq_idx FROM s
"""


def doc_pack_query(sf_dir: str, budget: int = PACK_BUDGET
                   ) -> "ray.data.Dataset":
    """Greedy sequence packing: split each document into word pieces
    (literal ``' '`` split — byte-identical to DuckDB
    ``string_split``) and first-fit them IN ORDER into sequences of
    at most ``budget`` characters (an over-budget piece opens its own
    sequence). The training-data "pack short samples into fixed
    context windows" step, keyed ``(doc_id, piece_idx) → seq_idx``.

    Packing is PER DOCUMENT by design: cross-document greedy packing
    depends on global row order, which no parallel engine reproduces
    deterministically — per-doc (or per-shard) packing is what scaled
    pipelines actually do, and it makes the operator shuffle-free:
    one flat-map-shaped ``map_batches``, chunks of a doc never leave
    the task that read the doc. The greedy scan is O(pieces) integer
    arithmetic per doc — hash-checked against a recursive-CTE oracle
    that replays first-fit exactly."""

    def pack(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        o_id: list = []
        o_pidx: list = []
        o_len: list = []
        o_seq: list = []
        for did, t in zip(ids, batch["text"].to_pylist()):
            pieces = (t or "").split(" ")
            seq = fill = 0
            for i, p in enumerate(pieces):
                ln = len(p)
                if i and fill + ln > budget:
                    seq += 1
                    fill = ln
                else:
                    fill += ln
                o_id.append(did)
                o_pidx.append(i)
                o_len.append(ln)
                o_seq.append(seq)
        return pa.table({
            "doc_id": pa.array(o_id, pa.int64()),
            "piece_idx": pa.array(o_pidx, pa.int64()),
            "piece_len": pa.array(o_len, pa.int64()),
            "seq_idx": pa.array(o_seq, pa.int64()),
        })

    return (_read(sf_dir, "documents", columns=["doc_id", "text"])
            .map_batches(pack, batch_format="pyarrow"))


#: top-byte threshold of the md5-hex keep rule: '40'/256 = 25 %.
SAMPLE_HEX_LT = "40"

DOC_SAMPLE_SQL = f"""
SELECT doc_id, source
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{SAMPLE_HEX_LT}'
"""


def doc_sample_query(sf_dir: str, hex_lt: str = SAMPLE_HEX_LT
                     ) -> "ray.data.Dataset":
    """Deterministic Bernoulli sampling (O6 — the one §2 row the
    reference lacks): keep a row iff the first md5 hex byte of its
    key is below a threshold (``'40'`` = 25 %). Hash-derived
    sampling, unlike ``Dataset.random_sample``, is REPRODUCIBLE
    across runs, partitionings and engines — the property a training
    pipeline needs so a re-run (or the SQL oracle) selects the same
    rows. Shuffle-free: the predicate evaluates inside each block;
    at 100 TB it is one streaming pass that never materializes the
    rejected 75 %."""
    from crawler_ray.functions.hashing import md5_hex_of_ids

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        pre = pc.utf8_slice_codeunits(
            pa.array(md5_hex_of_ids(ids), pa.string()), 0, 2)
        return batch.filter(pc.less(pre, hex_lt))

    return (_read(sf_dir, "documents", columns=["doc_id", "source"])
            .map_batches(keep, batch_format="pyarrow"))


# --------------------------------------------------------------------------
# keyword top-k per doc (M16, unigram variant — SQL-checkable; the full
# 1..3-gram extractor is functions/metadata.keywords_batch)
# --------------------------------------------------------------------------

KEYWORDS_TOP_K = 10
_STOPLIST_SQL = "('the','of','and','to','in','is','a','for','on','that')"
_STOPLIST = frozenset(("the", "of", "and", "to", "in", "is", "a",
                       "for", "on", "that"))

DOC_KEYWORDS_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS term
  FROM documents
), f AS (
  SELECT doc_id, term, count(*) AS term_count
  FROM toks WHERE term <> '' AND term NOT IN {_STOPLIST_SQL}
  GROUP BY doc_id, term
), r AS (
  SELECT doc_id, term, term_count,
    row_number() OVER (PARTITION BY doc_id
                       ORDER BY term_count DESC, term) AS rk
  FROM f
)
SELECT doc_id, term AS keyword, term_count FROM r
WHERE rk <= {KEYWORDS_TOP_K}
"""


def doc_keywords_query(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc top-k unigram keywords, exploded to rows (local per-doc
    heap inside map_batches — no shuffle, SURVEY O1)."""
    from collections import Counter

    def fn(batch: pa.Table) -> pa.Table:
        ids, kws, counts = [], [], []
        for i, text in zip(batch["doc_id"].to_pylist(),
                           batch["text"].to_pylist()):
            c = Counter(t for t in re.findall(r"[a-z]+", (text or "").lower())
                        if t not in _STOPLIST)
            top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
            for term, n in top[:KEYWORDS_TOP_K]:
                ids.append(i); kws.append(term); counts.append(n)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "keyword": pa.array(kws, pa.string()),
            "term_count": pa.array(counts, pa.int64()),
        })

    return (_read(sf_dir, "documents", columns=["doc_id", "text"])
            .map_batches(fn, batch_format="pyarrow"))


# --------------------------------------------------------------------------
# JSON property extraction over the events stream table
# --------------------------------------------------------------------------

EVENTS_PROPS_SQL = """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events
"""


def events_props_query(sf_dir: str) -> "ray.data.Dataset":
    import json as _json

    def fn(batch: pa.Table) -> pa.Table:
        ks = []
        for p in batch["props"].to_pylist():
            try:
                v = _json.loads(p).get("k")
            except (TypeError, ValueError):
                v = None
            ks.append(int(v) if v is not None else None)
        return pa.table({
            "event_id": batch["event_id"],
            "k": pa.array(ks, pa.int64()),
        })

    return (_read(sf_dir, "events", columns=["event_id", "props"])
            .map_batches(fn, batch_format="pyarrow"))


# --------------------------------------------------------------------------
# metadata-extractor conformance: enrich docs with a deterministic
# legal-style sentence derived from doc_id, run the M17-M20 kernels,
# and let the SQL oracle recompute the expected values arithmetically
# --------------------------------------------------------------------------

DOC_ENRICH_SQL = """
SELECT doc_id,
  1 AS n_penalties,
  CAST(1000 + doc_id AS DOUBLE) AS penalty_eur,
  doc_id % 120 AS first_article,
  (doc_id % 120) BETWEEN 1 AND 99 AS article_valid,
  1 AS gdpr_mentions,
  1 AS n_timeline
FROM documents
"""


def doc_enrich_query(sf_dir: str) -> "ray.data.Dataset":
    """Appends a templated sentence (fine amount / article ref / date
    all derived from doc_id), runs the penalty / citation / timeline
    extractors on the combined text, and projects the extracted values
    — the oracle knows the arithmetic truth, so the extraction logic
    itself is hash-checked."""
    from crawler_ray.functions.metadata import (
        citation_refs_batch, citations_count_batch, penalties_batch,
        timeline_batch)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = [
            f"{t} The authority imposed a fine of {1000 + i} EUR "
            f"on 2021-03-15. See Article {i % 120}(2)(a) GDPR."
            for i, t in zip(ids, batch["text"].to_pylist())
        ]
        enriched = pa.table({"doc_id": batch["doc_id"],
                             "text": pa.array(texts, pa.string())})
        pens = penalties_batch(enriched)["penalties"].to_pylist()
        refs = citation_refs_batch(enriched)["gdpr_refs"].to_pylist()
        cites = citations_count_batch(enriched)["gdpr_mentions"]
        times = timeline_batch(enriched)["timeline"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_penalties": pa.array([len(p) for p in pens], pa.int64()),
            "penalty_eur": pa.array(
                [p[0]["amount"] if p else None for p in pens], pa.float64()),
            "first_article": pa.array(
                [r[0]["article"] if r else None for r in refs], pa.int64()),
            "article_valid": pa.array(
                [r[0]["valid"] if r else None for r in refs], pa.bool_()),
            "gdpr_mentions": cites,
            "n_timeline": pa.array([len(t) for t in times], pa.int64()),
        })

    return (_read(sf_dir, "documents", columns=["doc_id", "text"])
            .map_batches(fn, batch_format="pyarrow"))


# --------------------------------------------------------------------------
# supplier balances by region — three-level dimension broadcast chain
# (supplier→nation→region, J1/J2 pattern over the remaining dims)
# --------------------------------------------------------------------------

SUPPLIER_REGION_SQL = """
SELECT r_name AS region,
  count(*) AS n_suppliers,
  sum(CAST(round(s_acctbal * 100, 0) AS BIGINT)) / 100.0 AS total_balance,
  (sum(CAST(round(s_acctbal * 100, 0) AS BIGINT)) / 100.0) / count(*)
    AS avg_balance
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def supplier_region_query(sf_dir: str) -> "ray.data.Dataset":
    import pyarrow.parquet as pq

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet"),
                        columns=["r_regionkey", "r_name"])
    rmap = dict(zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist()))
    nation_to_region = {n: rmap[k] for n, k in zip(
        nat["n_nationkey"].to_pylist(), nat["n_regionkey"].to_pylist())}
    lookup = ray.put(nation_to_region)

    def partial(batch: pa.Table) -> pa.Table:
        m = ray.get(lookup)
        df = pd.DataFrame({
            "region": [m[k] for k in batch["s_nationkey"].to_pylist()],
            "bal_c": _cents(batch["s_acctbal"].to_numpy(zero_copy_only=False),
                            100),
            "n": np.int64(1)})
        return _table_from_pandas(
            df.groupby("region", as_index=False).sum())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        bal = np.int64(g["bal_c"].sum())
        n = np.int64(g["n"].sum())
        return pd.DataFrame({
            "region": [g["region"].iloc[0]],
            "n_suppliers": [n],
            "total_balance": [bal / 100.0],
            "avg_balance": [(bal / 100.0) / n],
        })

    return (_read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("region").map_groups(final, batch_format="pandas"))


# --------------------------------------------------------------------------
# part catalog rollup — string ops + grouped stats over part attributes
# --------------------------------------------------------------------------

PARTS_BY_BRAND_SQL = """
SELECT p_brand,
  count(*) AS n_parts,
  count(DISTINCT p_type) AS n_types,
  min(p_size) AS min_size, max(p_size) AS max_size,
  sum(CAST(round(p_retailprice * 100, 0) AS BIGINT)) / 100.0 AS total_price
FROM part GROUP BY p_brand
"""


def parts_by_brand_query(sf_dir: str) -> "ray.data.Dataset":
    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "p_brand": [g["p_brand"].iloc[0]],
            "n_parts": [np.int64(len(g))],
            "n_types": [np.int64(g["p_type"].nunique())],
            "min_size": [g["p_size"].min()],
            "max_size": [g["p_size"].max()],
            "total_price": [np.int64(_cents(
                g["p_retailprice"].to_numpy(), 100).sum()) / 100.0],
        })

    # exact count-distinct per group needs raw rows in the group (part
    # is a dimension table — small; HLL partials would be the scale path)
    return (_read(sf_dir, "part",
                  columns=["p_brand", "p_type", "p_size", "p_retailprice"])
            .groupby("p_brand").map_groups(final, batch_format="pandas"))


# --------------------------------------------------------------------------
# as-of join (custom operator the Dataset API lacks): for each event,
# the most recent prior signup of the same user — keyed shuffle +
# in-group ordered scan (SURVEY custom-operator ladder tier (a))
# --------------------------------------------------------------------------

ASOF_SIGNUP_SQL = """
SELECT event_id,
  CAST(epoch_us(max(CASE WHEN event_type = 'signup' THEN ts END)
        OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING)) AS BIGINT) AS last_signup_us
FROM events
"""


def asof_signup_query(sf_dir: str) -> "ray.data.Dataset":
    """Per event: timestamp (µs) of the latest signup at-or-before it
    for the same user (NULL before the first signup). 64-way
    coarse-hash shuffle on user, then one vectorized forward-fill
    with per-user resets inside each group — the as-of-join recipe
    without a Python call per user."""
    def add_coarse(batch: pa.Table) -> pa.Table:
        return batch.append_column("_c", pa.array(_coarse_of(
            batch["user_id"].to_numpy(zero_copy_only=False))))

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        n = len(g)
        uid = g["user_id"].to_numpy()
        ts_us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        is_sign = (g["event_type"] == "signup").to_numpy()
        pos = np.arange(n)
        # index of the latest signup at-or-before each row …
        last_sign = np.maximum.accumulate(np.where(is_sign, pos, -1))
        # … valid only if it falls inside the row's own user run
        u_start = np.maximum.accumulate(np.where(_user_runs(uid), pos, 0))
        valid = last_sign >= u_start
        vals = pd.array(ts_us[np.maximum(last_sign, 0)], dtype="Int64")
        vals[~valid] = pd.NA
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            # .to_numpy() (object of int/NA) keeps the block layout
            # identical to the SQL oracle's nullable int64
            "last_signup_us": vals.to_numpy(),
        })

    return (_read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                             "event_type"])
            .map_batches(add_coarse, batch_format="pyarrow")
            .groupby("_c")
            .map_groups(per_group, batch_format="pandas"))


# --------------------------------------------------------------------------
# sliding-window aggregate: 7-event moving average of value per user
# --------------------------------------------------------------------------

SLIDING_AVG_SQL = """
SELECT event_id,
  CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
       OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
    AS window_sum_c,
  count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS window_n
FROM events
"""


def sliding_avg_query(sf_dir: str) -> "ray.data.Dataset":
    """Per-user 7-event sliding sum/count over the ordered stream
    (integer cents so the distributed result hash-equals SQL).
    Coarse-hash shuffle on user; inside each group the window is a
    prefix-sum difference with the window start clamped to the user's
    run start — fully vectorized, no per-user Python."""
    def add_coarse(batch: pa.Table) -> pa.Table:
        return batch.append_column("_c", pa.array(_coarse_of(
            batch["user_id"].to_numpy(zero_copy_only=False))))

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        n = len(g)
        cents = _cents(g["value"].to_numpy(), 100)
        pos = np.arange(n)
        u_start = np.maximum.accumulate(
            np.where(_user_runs(g["user_id"].to_numpy()), pos, 0))
        w_start = np.maximum(u_start, pos - 6)
        cs = np.concatenate(([0], np.cumsum(cents)))
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "window_sum_c": (cs[pos + 1] - cs[w_start]).astype(np.int64),
            "window_n": (pos - w_start + 1).astype(np.int64),
        })

    return (_read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                             "value"])
            .map_batches(add_coarse, batch_format="pyarrow")
            .groupby("_c")
            .map_groups(per_group, batch_format="pandas"))
