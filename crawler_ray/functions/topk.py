"""Approximate heavy hitters (bounded-summary top-k) as a Ray-Data
partial/merge pair — the scale path for the global stopword merge.

Why it exists (same argument as :mod:`crawler_ray.functions.hll`): the
exact :func:`analytics.stopwords_global` shuffles one (term,
partial-count) row per DISTINCT term per block — correct, and the
default, but at web scale the vocabulary (typos, ids, hashes) grows
with the corpus, so the shuffle volume is the vocabulary itself. The
bounded summary caps each block's contribution at ``capacity`` rows
plus one tail-bound row, making shuffle volume ``O(blocks ×
capacity)`` — independent of vocabulary size.

Semantics (Berinde et al., "Space-optimal heavy hitters with strong
error bounds", PODS 2009, SpaceSaving-summary family): each block
counts its terms EXACTLY, keeps the ``capacity`` highest counts, and
records the largest dropped count as its tail bound. After the merge,
a term's

- ``count_lo``  = sum of its surviving per-block counts — a LOWER
  bound on (and usually equal to) its true count;
- ``count_hi``  = ``count_lo`` + the sum of the tail bounds of the
  blocks where it did NOT survive — conservatively, the global tail
  bound sum minus the bounds of blocks where it did survive is not
  tracked per term, so the global sum is used: an UPPER bound.

The top-``n`` report is ``stable`` when the n-th ``count_lo`` exceeds
the global tail-bound sum — then NO dropped term can outrank the
report and the ranking by true counts is certified (the usual case
for stopwords, whose counts are orders of magnitude above the tail).

All kernels are numpy/pandas; nothing here touches Ray — the pipeline
composes them into ``map_batches`` partials and a coarse-group merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: per-block summary size; stopword-style heads are handfuls of terms,
#: so 4096 rows/block leaves the tail bound at typo-count magnitude.
TOPK_CAPACITY = 4096

#: the tail-bound pseudo-term: lexically impossible as a real term
#: (the tokenizer splits on non-letters), so it can ride the same
#: (term, count) rows through the shuffle.
TAIL_MARKER = "\x00tail"


def summarize_counts(terms: np.ndarray, counts: np.ndarray,
                     capacity: int = TOPK_CAPACITY
                     ) -> tuple[np.ndarray, np.ndarray, int]:
    """Truncate one block's EXACT (term, count) table to its
    ``capacity`` heaviest rows; returns (terms, counts, tail_bound)
    where ``tail_bound`` is the largest dropped count (0 when nothing
    was dropped — the summary is then exact)."""
    if len(terms) <= capacity:
        return terms, counts, 0
    order = np.argsort(counts, kind="stable")[::-1]
    keep = order[:capacity]
    tail = int(counts[order[capacity]])
    return terms[keep], counts[keep], tail


def merge_summaries(df: pd.DataFrame, top_n: int
                    ) -> tuple[pd.DataFrame, int]:
    """Merge shuffled summary rows (term, term_count; tail rows carry
    ``TAIL_MARKER``) into the top-``n`` report with bounds. Returns
    (report, tail_sum)."""
    is_tail = df["term"].to_numpy() == TAIL_MARKER
    tail_sum = int(df.loc[is_tail, "term_count"].sum())
    m = (df[~is_tail].groupby("term", as_index=False)["term_count"]
         .sum().rename(columns={"term_count": "count_lo"}))
    m = m.sort_values(["count_lo", "term"], ascending=[False, True],
                      kind="mergesort").head(top_n)
    m["count_hi"] = m["count_lo"].astype(np.int64) + tail_sum
    m["count_lo"] = m["count_lo"].astype(np.int64)
    return m.reset_index(drop=True), tail_sum
