"""Deduplication operators for the ``documents`` / ``embeddings``
tables — the large-scale training-data ops the reference only hints at
(its only dedup is the exact seen-set / composite-key rule,
``gdprCrawler.py:111-118`` + ``denmark/__init__.py:135-140``; near-dup
does not exist there).

Five families, each Ray-Data-first:

- **exact**       — content-hash groupby, min doc_id survives.
- **MinHash+LSH** — byte-shingle → 128-perm minhash → banded LSH
                    buckets → in-bucket signature-similarity verify.
- **SimHash**     — 64-bit simhash over word features, 16-bit-chunk
                    bucketing, Hamming verify.
- **n-gram Jaccard** — exact Jaccard over shingle sets for candidate
                    pairs (verification stage after LSH).
- **embedding**   — cosine near-dup over ``list<float>`` vectors.

Scale notes (10^10-doc design point): signatures are computed in a
stateless ``map_batches`` (hash mixers are seeded constants — no model
state needed); candidate generation is a ``groupby`` shuffle keyed by
band/chunk value whose fan-in is bounded by ``max_bucket`` (oversized
buckets are near-identical spam clusters — they are collapsed to a
star around the min id instead of emitting O(g²) pairs); the exact
verify runs inside the bucket group so no second join is needed. The
only broadcast is the embedding matrix in the brute-force variant —
``ray.put`` once, read per task — with the LSH-bucketed variant as the
scale path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from crawler_ray.functions.textops import shingle_hashes_fast

__all__ = [
    "exact_dedup", "MinHashStage", "minhash_lsh_pairs", "SimHashStage",
    "simhash_pairs", "ngram_jaccard_pairs", "embedding_dup_pairs",
]


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def _md5_batch(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    md5s = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in batch[text_col].to_pylist()]
    coarse = np.array([int(m[:4], 16) % _N_COARSE for m in md5s],
                      dtype=np.int64)
    return pa.table({
        "content_md5": pa.array(md5s, pa.string()),
        id_col: batch[id_col],
        "coarse": pa.array(coarse),
    })


def exact_dedup(ds: "ray.data.Dataset", text_col: str = "text",
                id_col: str = "doc_id") -> "ray.data.Dataset":
    """Hash-partitioned exact dedup: per content hash keep the minimum
    id and count the duplicates. The shuffle is keyed by a coarse
    prefix of the content hash (uniform); the per-hash reduce runs as
    one C-speed pandas groupby inside each coarse group instead of a
    per-group Python call (the ds.stats() singleton-group lesson)."""
    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("content_md5", as_index=False).agg(
            keep_id=(id_col, "min"), n_dups=(id_col, "size"))
        out["n_dups"] = out["n_dups"].astype(np.int64)
        return out

    return (ds.map_batches(_md5_batch, batch_format="pyarrow",
                           fn_kwargs={"text_col": text_col, "id_col": id_col})
              .groupby("coarse")
              .map_groups(reduce_group, batch_format="pandas"))


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

_MIX_A = 0x9E3779B97F4A7C15
_MIX_B = 0xBF58476D1CE4E5B9
_N_COARSE = 64      # coarse shuffle groups for bucket/pair stages


def _pair_coarse(df: pd.DataFrame) -> pd.DataFrame:
    """Coarse shuffle key for (a_id, b_id) pair dedup — identical
    pairs always land in the same group."""
    a = df["a_id"].to_numpy().astype(np.uint64)
    b = df["b_id"].to_numpy().astype(np.uint64)
    with np.errstate(over="ignore"):
        h = (a * np.uint64(_MIX_A) ^ b * np.uint64(_MIX_B))
    out = df.copy()
    out["pair_coarse"] = (h % np.uint64(_N_COARSE)).astype(np.int64)
    return out


def _perm_params(n_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=n_perms, dtype=np.uint64) * 2 + 1  # odd
    b = rng.integers(0, 2**63, size=n_perms, dtype=np.uint64)
    return a, b


class MinHashStage:
    """``map_batches`` callable: text → 128-perm minhash signature.

    Permutation constants are derived once per actor in ``__init__``
    (cheap here, but the pattern keeps heavier setup off the per-batch
    path). Signature = per-perm min over the doc's k-byte shingle
    hashes of ``a·h + b (mod 2^64)``. Long docs are chunked so the
    (n_perms × n_shingles) temp stays bounded.
    """

    CHUNK = 1 << 15

    def __init__(self, n_perms: int = 128, k: int = 5, seed: int = 1234,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.a, self.b = _perm_params(n_perms, seed)
        self.n_perms, self.k = n_perms, k
        self.text_col, self.id_col = text_col, id_col

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes_fast(text or "", self.k)
        if len(sh) == 0:
            return np.full(self.n_perms, np.iinfo(np.uint64).max,
                           dtype=np.uint64)
        sh = np.unique(sh)
        sig = np.full(self.n_perms, np.iinfo(np.uint64).max, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for off in range(0, len(sh), self.CHUNK):
                c = sh[off:off + self.CHUNK]
                m = (self.a[:, None] * c[None, :] + self.b[:, None]).min(axis=1)
                np.minimum(sig, m, out=sig)
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sigs = np.stack([self.signature(t) for t in texts]) if texts else \
            np.zeros((0, self.n_perms), dtype=np.uint64)
        return pa.table({
            self.id_col: batch[self.id_col],
            "minhash": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1), pa.uint64()), self.n_perms),
        })


def _band_rows(batch: pa.Table, n_bands: int, rows_per_band: int,
               id_col: str) -> pa.Table:
    """Explode each signature into one (band_key, id) row per band —
    the LSH shuffle key. Signatures do NOT ride along (they would
    multiply the shuffle volume ×n_bands); the verify stage reads them
    from a broadcast instead."""
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    flat = batch["minhash"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False).astype(np.uint64)
    n = len(ids)
    sigs = flat.reshape(n, n_bands * rows_per_band)
    out_key = np.empty(n * n_bands, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for bnd in range(n_bands):
            sl = sigs[:, bnd * rows_per_band:(bnd + 1) * rows_per_band]
            h = np.full(n, np.uint64(_MIX_A) * np.uint64(bnd + 1),
                        dtype=np.uint64)
            for r in range(rows_per_band):
                h = (h ^ sl[:, r]) * np.uint64(_MIX_B)
            out_key[bnd::n_bands] = h
    return pa.table({
        "band_key": pa.array(out_key, pa.uint64()),
        id_col: pa.array(np.repeat(ids, n_bands)),
    })


def _bucket_pairs(g: pd.DataFrame, *, id_col: str,
                  max_bucket: int) -> pd.DataFrame:
    """Candidate pairs within one COARSE group of LSH buckets.

    Grouping by the full band_key would invoke this once per bucket —
    at mostly-singleton buckets the per-group pandas overhead dwarfs
    the work (`ds.stats()` showed 94 s of 0-pair groups at sf0.1).
    Instead the shuffle key is ``band_key % N_COARSE`` and this body
    sorts its group once and walks only the equal-band-key runs
    (collisions — rare) in Python. Oversized buckets collapse to a
    star around the min id instead of O(g²)."""
    keys = g["band_key"].to_numpy()
    ids = g[id_col].to_numpy()
    order = np.lexsort((ids, keys))
    keys, ids = keys[order], ids[order]
    runs = np.flatnonzero(keys[1:] == keys[:-1])
    a_out: list[np.ndarray] = []
    b_out: list[np.ndarray] = []
    i = 0
    n = len(keys)
    # positions where a run of equal keys starts
    starts = np.flatnonzero(np.concatenate(
        ([True], keys[1:] != keys[:-1])))
    stops = np.concatenate((starts[1:], [n]))
    for lo, hi in zip(starts, stops):
        k = hi - lo
        if k < 2:
            continue
        bucket = ids[lo:hi]
        if k > max_bucket:
            a_out.append(np.repeat(bucket[0], k - 1))
            b_out.append(bucket[1:])
        else:
            ii, jj = np.triu_indices(k, k=1)
            a_out.append(bucket[ii])
            b_out.append(bucket[jj])
    if not a_out:
        return pd.DataFrame({"a_id": pd.Series([], dtype="int64"),
                             "b_id": pd.Series([], dtype="int64")})
    return pd.DataFrame({"a_id": np.concatenate(a_out),
                         "b_id": np.concatenate(b_out)})


def minhash_lsh_pairs(ds: "ray.data.Dataset", threshold: float = 0.7,
                      n_bands: int = 16, rows_per_band: int = 8,
                      k: int = 5, seed: int = 1234,
                      text_col: str = "text", id_col: str = "doc_id",
                      max_bucket: int = 512) -> "ray.data.Dataset":
    """Near-duplicate pairs by MinHash+LSH: signature map → (band_key,
    id) explode → ``groupby(band_key)`` shuffle → candidate pairs →
    global pair dedup → signature-similarity verify against the
    broadcast signature matrix (``ray.put`` once; the scale path swaps
    the broadcast for a hash-join of pairs against the signature table
    — pair volume, not corpus volume, bounds this stage)."""
    n_perms = n_bands * rows_per_band
    sig = ds.map_batches(MinHashStage, batch_format="pyarrow",
                         fn_constructor_kwargs={
                             "n_perms": n_perms, "k": k, "seed": seed,
                             "text_col": text_col, "id_col": id_col},
                         concurrency=(1, 8)).materialize()

    def band_rows_coarse(batch: pa.Table) -> pa.Table:
        t = _band_rows(batch, n_bands, rows_per_band, id_col)
        coarse = (t["band_key"].to_numpy(zero_copy_only=False)
                  % np.uint64(_N_COARSE)).astype(np.int64)
        return t.append_column("coarse", pa.array(coarse))

    bands = sig.map_batches(band_rows_coarse, batch_format="pyarrow")
    # shuffle key = coarse bucket-hash group (64 groups), NOT the raw
    # band_key: per-group callable overhead at mostly-singleton
    # buckets dominated the stage otherwise (ds.stats() evidence)
    pairs = bands.groupby("coarse").map_groups(
        _bucket_pairs, batch_format="pandas",
        fn_kwargs={"id_col": id_col, "max_bucket": max_bucket})

    def dedup_pairs_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a_id", "b_id"])[["a_id", "b_id"]]

    uniq = pairs.map_batches(_pair_coarse, batch_format="pandas") \
                .groupby("pair_coarse") \
                .map_groups(dedup_pairs_group, batch_format="pandas")

    # broadcast signatures for the verify stage
    sig_ids, sig_mat = [], []
    for ref in sig.to_arrow_refs():
        t = ray.get(ref)
        sig_ids.append(t[id_col].to_numpy(zero_copy_only=False))
        sig_mat.append(t["minhash"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.uint64).reshape(t.num_rows, -1))
    ids_all = np.concatenate(sig_ids) if sig_ids else np.zeros(0, np.int64)
    mat_all = np.vstack(sig_mat) if sig_mat else \
        np.zeros((0, n_perms), np.uint64)
    order = np.argsort(ids_all, kind="stable")
    sig_ref = ray.put((ids_all[order], mat_all[order]))

    def verify(batch: pa.Table) -> pa.Table:
        ids_s, mat = ray.get(sig_ref)
        a = batch["a_id"].to_numpy(zero_copy_only=False)
        b = batch["b_id"].to_numpy(zero_copy_only=False)
        ia = np.searchsorted(ids_s, a)
        ib = np.searchsorted(ids_s, b)
        est = (mat[ia] == mat[ib]).mean(axis=1)
        keep = est >= threshold
        return pa.table({"a_id": pa.array(a[keep]),
                         "b_id": pa.array(b[keep]),
                         "est_jaccard": pa.array(est[keep])})

    return uniq.map_batches(verify, batch_format="pyarrow")


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

class SimHashStage:
    """``map_batches`` callable: text → 64-bit simhash over word-hash
    features (unweighted; ±1 votes per bit)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        import re
        self.word_re = re.compile(r"[A-Za-z0-9]+")
        self.text_col, self.id_col = text_col, id_col
        self.bit_idx = np.arange(64, dtype=np.uint64)
        # corpus vocabularies repeat heavily across docs: memoize the
        # per-word hash once per actor (the model-state pattern)
        self._word_hash: dict[str, int] = {}

    def _hash_word(self, w: str) -> int:
        h = self._word_hash.get(w)
        if h is None:
            h = int.from_bytes(
                hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
            self._word_hash[w] = h
        return h

    def simhash(self, text: str) -> np.uint64:
        words = self.word_re.findall((text or "").lower())
        if not words:
            return np.uint64(0)
        hs = np.fromiter((self._hash_word(w) for w in set(words)),
                         dtype=np.uint64)
        bits = (hs[:, None] >> self.bit_idx[None, :]) & np.uint64(1)
        votes = bits.astype(np.int64).sum(axis=0) * 2 - len(hs)
        return np.uint64(((votes >= 0).astype(np.uint64)
                          << self.bit_idx).sum(dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = np.array([self.simhash(t)
                         for t in batch[self.text_col].to_pylist()],
                        dtype=np.uint64)
        return pa.table({
            self.id_col: batch[self.id_col],
            "simhash": pa.array(sigs, pa.uint64()),
        })


def simhash_pairs(ds: "ray.data.Dataset", max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id",
                  max_bucket: int = 2048) -> "ray.data.Dataset":
    """Candidate pairs whose simhashes agree on ≥1 of 4 16-bit chunks
    (pigeonhole ⇒ complete for Hamming ≤ 3 when chunks = max_hamming+1),
    verified by exact Hamming distance in the bucket."""

    def chunk_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sig = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(ids)
        keys = np.empty(4 * n, dtype=np.uint64)
        for c in range(4):
            chunk = (sig >> np.uint64(16 * c)) & np.uint64(0xFFFF)
            keys[c::4] = chunk | (np.uint64(c) << np.uint64(16))
        return pa.table({
            "chunk_key": pa.array(keys, pa.uint64()),
            id_col: pa.array(np.repeat(ids, 4)),
            "simhash": pa.array(np.repeat(sig, 4), pa.uint64()),
            "coarse": pa.array((keys % np.uint64(_N_COARSE))
                               .astype(np.int64)),
        })

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        """One coarse group: walk equal-chunk-key runs, exact Hamming
        within each (same singleton-group-overhead fix as MinHash)."""
        empty = pd.DataFrame({"a_id": pd.Series([], dtype="int64"),
                              "b_id": pd.Series([], dtype="int64"),
                              "hamming": pd.Series([], dtype="int64")})
        keys = g["chunk_key"].to_numpy()
        ids = g[id_col].to_numpy()
        sig = g["simhash"].to_numpy().astype(np.uint64)
        order = np.lexsort((ids, keys))
        keys, ids, sig = keys[order], ids[order], sig[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], keys[1:] != keys[:-1])))
        stops = np.concatenate((starts[1:], [len(keys)]))
        a_out, b_out, h_out = [], [], []
        for lo, hi in zip(starts, stops):
            k = min(hi - lo, max_bucket)
            if k < 2:
                continue
            bid, bsig = ids[lo:lo + k], sig[lo:lo + k]
            ii, jj = np.triu_indices(k, k=1)
            x = bsig[ii] ^ bsig[jj]
            ham = np.array([int(v).bit_count() for v in x], dtype=np.int64)
            keep = ham <= max_hamming
            if keep.any():
                a_out.append(bid[ii[keep]])
                b_out.append(bid[jj[keep]])
                h_out.append(ham[keep])
        if not a_out:
            return empty
        return pd.DataFrame({"a_id": np.concatenate(a_out),
                             "b_id": np.concatenate(b_out),
                             "hamming": np.concatenate(h_out)})

    def dedup_pairs_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a_id", "b_id"])[
            ["a_id", "b_id", "hamming"]]

    return (ds.map_batches(SimHashStage, batch_format="pyarrow",
                           fn_constructor_kwargs={"text_col": text_col,
                                                  "id_col": id_col},
                           concurrency=(1, 8))
              .map_batches(chunk_rows, batch_format="pyarrow")
              .groupby("coarse")
              .map_groups(verify, batch_format="pandas")
              .map_batches(_pair_coarse, batch_format="pandas")
              .groupby("pair_coarse")
              .map_groups(dedup_pairs_group, batch_format="pandas"))


# --------------------------------------------------------------------------
# exact n-gram Jaccard (verification-grade)
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(ds: "ray.data.Dataset", threshold: float = 0.5,
                        k: int = 5, text_col: str = "text",
                        id_col: str = "doc_id",
                        lsh_threshold: float | None = None
                        ) -> "ray.data.Dataset":
    """Exact k-byte-shingle Jaccard pairs: LSH candidates (recall
    stage, lower threshold) → exact verify against broadcast shingle
    sets. The broadcast is the candidate docs' *hash sets* (uint64),
    put once via ``ray.put``; the scale path replaces the broadcast
    with a hash-join of pairs against the shingle table on ``a_id`` /
    ``b_id`` — pair volume, not corpus volume, is the bound here."""
    cand = minhash_lsh_pairs(ds, threshold=(lsh_threshold
                                            if lsh_threshold is not None
                                            else max(0.0, threshold - 0.2)),
                             k=k, text_col=text_col, id_col=id_col)

    def shingle_sets(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        return pa.table({
            id_col: pa.array(ids),
            "shingles": pa.array(
                [np.unique(shingle_hashes_fast(t or "", k)).tolist()
                 for t in batch[text_col].to_pylist()],
                pa.list_(pa.uint64())),
        })

    sets_tbl = ds.map_batches(shingle_sets, batch_format="pyarrow") \
                 .to_arrow_refs()
    sets: dict[int, np.ndarray] = {}
    for ref in sets_tbl:
        t = ray.get(ref)
        for i, s in zip(t[id_col].to_pylist(), t["shingles"].to_pylist()):
            sets[i] = np.asarray(s, dtype=np.uint64)
    sets_ref = ray.put(sets)

    def verify(batch: pa.Table) -> pa.Table:
        lookup = ray.get(sets_ref)
        a = batch["a_id"].to_pylist()
        b = batch["b_id"].to_pylist()
        jac = np.zeros(len(a), dtype=np.float64)
        for i, (x, y) in enumerate(zip(a, b)):
            sa, sb = lookup.get(x), lookup.get(y)
            if sa is None or sb is None or (len(sa) == 0 and len(sb) == 0):
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            jac[i] = inter / union if union else 0.0
        out = pa.table({"a_id": batch["a_id"], "b_id": batch["b_id"],
                        "jaccard": pa.array(jac)})
        return out.filter(pa.array(jac >= threshold))

    return cand.map_batches(verify, batch_format="pyarrow")


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------

def _normalized_matrix(ds: "ray.data.Dataset", vec_col: str,
                       id_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Materialize (ids, L2-normalized float64 matrix) — small-side
    collect for the broadcast; the LSH variant avoids it."""
    ids_parts, mat_parts = [], []
    for ref in ds.select_columns([id_col, vec_col]).to_arrow_refs():
        t = ray.get(ref)
        ids_parts.append(t[id_col].to_numpy(zero_copy_only=False))
        flat = t[vec_col].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64)
        mat_parts.append(flat.reshape(t.num_rows, -1))
    ids = np.concatenate(ids_parts)
    mat = np.vstack(mat_parts)
    norms = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    norms[norms == 0] = 1.0
    order = np.argsort(ids, kind="stable")
    return ids[order], (mat / norms)[order]


def embedding_dup_pairs(ds: "ray.data.Dataset", threshold: float = 0.95,
                        vec_col: str = "embedding", id_col: str = "vec_id"
                        ) -> "ray.data.Dataset":
    """Near-duplicate pairs by cosine ≥ threshold: block × broadcast
    matmul inside ``map_batches`` (each task reads the ``ray.put``
    matrix once from the object store — zero-copy numpy)."""
    ids, mat = _normalized_matrix(ds, vec_col, id_col)
    ids_ref, mat_ref = ray.put(ids), ray.put(mat)

    def block_pairs(batch: pa.Table) -> pa.Table:
        all_ids, m = ray.get(ids_ref), ray.get(mat_ref)
        bid = batch[id_col].to_numpy(zero_copy_only=False)
        flat = batch[vec_col].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64)
        q = flat.reshape(len(bid), -1)
        qn = np.sqrt((q * q).sum(axis=1, keepdims=True))
        qn[qn == 0] = 1.0
        sims = (q / qn) @ m.T                      # (block, n_all)
        keep_r, keep_c = np.nonzero(
            (sims >= threshold) & (bid[:, None] < all_ids[None, :]))
        return pa.table({
            "a_id": pa.array(bid[keep_r]),
            "b_id": pa.array(all_ids[keep_c]),
        })

    return ds.map_batches(block_pairs, batch_format="pyarrow")
