"""Distributed TF-IDF + KMeans document clustering (SURVEY A3).

Reference: ``models/gdpr/__init__.py:190-270`` (``classify_docs``)
fits sklearn TF-IDF + KMeans(4) in-process over the whole corpus.
Re-expressed Ray-Data-first and fully deterministic (seeded init, no
library RNG):

1. **Vocabulary / document frequency** — per-batch term→(df, tf)
   partials inside ``map_batches`` (pre-aggregation before any
   shuffle), reduced on the driver to the top ``vocab_size`` terms by
   (df, term) — the vocab is the SMALL side and is broadcast via
   ``ray.put``; the corpus is never collected.
2. **Vectorize** — one ``map_batches`` maps each doc to an L2-normal
   TF-IDF row (numpy, fixed vocab order).
3. **KMeans** — centroids start from the k lexicographically-smallest
   doc ids (seed-free determinism); each iteration is one
   ``map_batches`` producing per-cluster partial sums/counts per
   batch, reduced driver-side into new centroids (classic mini
   combiner → tiny reduce; the all-to-all never moves vectors).
4. Output ``(doc_id, cluster)``.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import ray

__all__ = ["tfidf_kmeans", "build_vocab"]

_WORD_RE = re.compile(r"[a-z]+")


def _doc_terms(text: str | None) -> Counter:
    return Counter(_WORD_RE.findall((text or "").lower()))


def build_vocab(ds: "ray.data.Dataset", vocab_size: int = 256,
                text_col: str = "text") -> tuple[list[str], np.ndarray, int]:
    """Top-``vocab_size`` terms by document frequency (ties: term asc)
    + idf vector + corpus size — fully distributed: per-batch df
    partials → 64-way term-hash groups (each term lives wholly in one
    group, so the global top-``vocab_size`` ⊆ union of per-group
    top-``vocab_size``) → driver folds only ≤ 64·vocab_size candidate
    rows. The corpus doc count rides the same shuffle as a sentinel
    empty-term row (the word regex never yields one), so no second
    pass over the corpus is needed."""
    import zlib

    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        df: Counter = Counter()
        for text in batch[text_col].to_pylist():
            df.update(_doc_terms(text).keys())
        items = sorted(df.items())
        terms = [t for t, _ in items] + [""]
        counts = [c for _, c in items] + [batch.num_rows]
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "df": pa.array(counts, pa.int64()),
            "_c": pa.array([zlib.crc32(t.encode()) % 64 for t in terms],
                           pa.int64()),
        })

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("term", as_index=False)["df"].sum()
        sent = m[m["term"] == ""]
        top = (m[m["term"] != ""]
               .sort_values(["df", "term"], ascending=[False, True],
                            kind="mergesort").head(vocab_size))
        return pd.concat([top, sent])[["term", "df"]]

    cand = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_c")
            .map_groups(per_group, batch_format="pandas")
            .to_pandas())                    # ≤ 64·vocab_size + 1 rows
    n_docs = int(cand.loc[cand["term"] == "", "df"].sum())
    top = (cand[cand["term"] != ""]
           .sort_values(["df", "term"], ascending=[False, True],
                        kind="mergesort").head(vocab_size))
    vocab = list(top["term"])
    dfs = top["df"].to_numpy().astype(np.float64)
    idf = np.log((1.0 + n_docs) / (1.0 + dfs)) + 1.0
    return vocab, idf, n_docs


def tfidf_kmeans(ds: "ray.data.Dataset", k: int = 4, n_iter: int = 10,
                 vocab_size: int = 256, text_col: str = "text",
                 id_col: str = "doc_id") -> "ray.data.Dataset":
    """Cluster documents; returns a Dataset ``(doc_id, cluster)``."""
    vocab, idf, _ = build_vocab(ds, vocab_size, text_col)
    index = {t: i for i, t in enumerate(vocab)}
    vocab_ref = ray.put((index, idf))

    def vectorize(batch: pa.Table) -> pa.Table:
        idx, idf_v = ray.get(vocab_ref)
        n, d = batch.num_rows, len(idf_v)
        mat = np.zeros((n, d), dtype=np.float64)
        for r, text in enumerate(batch[text_col].to_pylist()):
            for term, c in _doc_terms(text).items():
                j = idx.get(term)
                if j is not None:
                    mat[r, j] = c
        mat *= idf_v[None, :]
        norms = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
        norms[norms == 0] = 1.0
        mat /= norms
        return pa.table({
            id_col: batch[id_col],
            "vec": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), pa.float64()), d),
        })

    vecs = ds.map_batches(vectorize, batch_format="pyarrow").materialize()

    # deterministic init: vectors of the k smallest doc ids
    # (distributed sort + limit — only k rows reach the driver)
    dim = len(idf)
    init_rows = vecs.sort(id_col).limit(k).take_all()
    centroids = np.stack([np.asarray(r["vec"], dtype=np.float64)
                          for r in init_rows])
    if len(centroids) < k:                  # fewer docs than clusters
        pad = np.zeros((k - len(centroids), dim))
        centroids = np.vstack([centroids, pad])

    for _ in range(n_iter):
        c_ref = ray.put(centroids)

        def assign_partial(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            m = batch["vec"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False).reshape(batch.num_rows, -1)
            lab = (m @ c.T).argmax(axis=1)       # unit vectors: max cos
            sums = np.zeros_like(c)
            counts = np.zeros(len(c), dtype=np.int64)
            for j in range(len(c)):
                sel = lab == j
                counts[j] = sel.sum()
                if counts[j]:
                    sums[j] = m[sel].sum(axis=0)
            return pa.table({
                "cluster": pa.array(np.arange(len(c), dtype=np.int32)),
                "count": pa.array(counts),
                "sum": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.reshape(-1), pa.float64()), c.shape[1]),
            })

        sums = np.zeros_like(centroids)
        counts = np.zeros(k, dtype=np.int64)
        for ref in vecs.map_batches(assign_partial,
                                    batch_format="pyarrow").to_arrow_refs():
            t = ray.get(ref)
            counts += t["count"].to_numpy(zero_copy_only=False)
            sums += t["sum"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False).reshape(k, -1)
        nz = counts > 0
        centroids[nz] = sums[nz] / counts[nz, None]
        norms = np.sqrt((centroids * centroids).sum(axis=1, keepdims=True))
        norms[norms == 0] = 1.0
        centroids /= norms

    c_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = batch["vec"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).reshape(batch.num_rows, -1)
        return pa.table({
            id_col: batch[id_col],
            "cluster": pa.array((m @ c.T).argmax(axis=1).astype(np.int32)),
        })

    return vecs.map_batches(assign, batch_format="pyarrow")
