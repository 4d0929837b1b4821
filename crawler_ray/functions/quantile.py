"""EXACT distributed order statistics by histogram refinement — the
quantile-threshold primitive behind "keep the top X% by score"
filtering of a training corpus.

Why not an approximate sketch: the filter's output is graded against
a SQL oracle (``quantile_disc``), and an exact threshold costs only a
few cheap COUNTING passes — each pass is a ``map_batches`` that
reduces every block to an 8k-bucket count vector, so pass traffic is
``O(blocks × 8192)`` ints regardless of data size (the t-digest
alternative saves passes but surrenders exactness for no shuffle-
volume win here).

Algorithm (classic external selection): (1) one pass for global
(min, max, n); (2) histogram pass over the live value range — locate
the bucket holding the k-th order statistic; (3) if the bucket's
population fits one task's memory, collect just that bucket and
``np.partition`` to the answer, else the bucket becomes the new live
range and (2) repeats. Ranges shrink 8192× per round, so two rounds
bound 6.7e7× — any real score column terminates in 2-3 passes. A
bucket that cannot shrink (all one float value) IS the answer.

DuckDB parity: ``quantile_disc(x, q)`` = the value at 0-based
ascending rank ``ceil(q*n) - 1`` (verified empirically across n/q).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

N_BUCKETS = 8192
#: largest bucket population collected to one task for the final
#: partition step (float64 → ~32 MB).
COLLECT_LIMIT = 4_000_000


def _col_f64(batch: pa.Table, col: str) -> np.ndarray:
    v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
    return v[~np.isnan(v)]


def exact_kth_value(ds: "object", col: str, k) -> float:
    """Value at 0-based ascending rank ``k`` of ``ds[col]`` (NaNs
    excluded). ``k`` may be a callable ``n -> rank`` so quantile
    callers derive the rank from the same (min, max, n) pass instead
    of paying a separate counting scan. ``ds`` should be materialized
    by the caller — every refinement round re-scans it."""

    def minmax(batch: pa.Table) -> pa.Table:
        v = _col_f64(batch, col)
        if len(v) == 0:
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())]),
                         "n": pa.array([len(v)], pa.int64())})

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    n = int(mm["n"].sum())
    if callable(k):
        k = k(n)
    if not 0 <= k < n:
        raise ValueError(f"rank {k} outside [0, {n})")
    lo, hi = float(mm["lo"].min()), float(mm["hi"].max())
    count_below = 0                       # values < current range

    while True:
        if lo == hi:
            return lo                      # degenerate range: one value
        if np.nextafter(lo, hi) >= hi:
            # exactly TWO representable floats remain; the answer is
            # lo only while the rank falls among the lo-values — one
            # counting pass decides (returning lo unconditionally here
            # mismatched DuckDB on near-constant columns, e.g.
            # [1.0 x2, nextafter(1.0) x8] at q=0.9)
            def count_lo(batch: pa.Table, lo=lo) -> pa.Table:
                v = _col_f64(batch, col)
                return pa.table({"c": pa.array([int((v == lo).sum())],
                                               pa.int64())})

            n_lo = int(ds.map_batches(count_lo, batch_format="pyarrow")
                       .to_pandas()["c"].sum())
            return lo if k - count_below < n_lo else hi
        edges = np.linspace(lo, hi, N_BUCKETS + 1)

        def histo(batch: pa.Table, edges=edges, lo=lo, hi=hi) -> pa.Table:
            v = _col_f64(batch, col)
            v = v[(v >= lo) & (v <= hi)]
            idx = np.clip(np.searchsorted(edges, v, side="right") - 1,
                          0, N_BUCKETS - 1)
            return pa.table({
                "b": pa.array(np.arange(N_BUCKETS, dtype=np.int64)),
                "c": pa.array(np.bincount(idx, minlength=N_BUCKETS)
                              .astype(np.int64)),
            })

        h = (ds.map_batches(histo, batch_format="pyarrow").to_pandas()
             .groupby("b")["c"].sum().to_numpy())
        cum = np.cumsum(h)
        target = k - count_below
        bi = int(np.searchsorted(cum, target + 1))
        blo, bhi = float(edges[bi]), float(edges[bi + 1])
        below_bucket = int(cum[bi]) - int(h[bi])
        if int(h[bi]) <= COLLECT_LIMIT:
            last = bi == N_BUCKETS - 1

            def grab(batch: pa.Table, blo=blo, bhi=bhi,
                     last=last) -> pa.Table:
                v = _col_f64(batch, col)
                sel = (v >= blo) & ((v <= bhi) if last else (v < bhi))
                return pa.table({"v": pa.array(v[sel], pa.float64())})

            vals = np.concatenate(
                [b["v"].to_numpy(zero_copy_only=False)
                 for b in ds.map_batches(grab, batch_format="pyarrow")
                            .iter_batches(batch_format="pyarrow")]
                or [np.zeros(0)])
            r = target - below_bucket
            return float(np.partition(vals, r)[r])
        count_below += below_bucket
        lo, hi = blo, bhi


def exact_quantile_disc(ds: "object", col: str, q: float) -> float:
    """DuckDB ``quantile_disc(col, q)``: the element at 0-based rank
    ``ceil(q*n) - 1`` (rank resolved from the min/max pass's count —
    no extra scan)."""
    return exact_kth_value(ds, col,
                           lambda n: max(0, math.ceil(q * n) - 1))
