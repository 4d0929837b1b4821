"""Vectorized text-analysis kernels for the ``documents`` table.

Ray-Data-native re-expression of the reference's per-document text
metadata services (statistics ``services/metadata/statistics_metadata_
service/__init__.py:4-46``, read-time/length ``services/est_read_time_
meta_service.py:4-9`` / ``char_length_meta_service.py:3-5`` /
``word_length_meta_service.py:4-7``, citations count ``services/
metadata/citations_count_metadata_service/__init__.py:4-13``), plus
the large-scale training-data ops the reference lacks: quality
scoring, BPE-ish token counting, and rolling-hash fingerprinting.

Every kernel is a pure function ``pyarrow.Table -> pyarrow.Table``
meant for ``ds.map_batches(fn, batch_format="pyarrow")`` — regex work
runs on Arrow's RE2 kernels (``pc.count_substring_regex``), numeric
work on numpy; no Python loop over rows in any hot path except the
per-doc fingerprint reduction, which is a numpy dot per document over
a shared precomputed power table.

All regexes are RE2-compatible so the DuckDB oracle SQL in
``__ray_entry__.oracle_sql`` (also RE2) counts the same matches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "WORD_RE", "TOKEN_RE", "SENT_RE", "PUNCT_RE", "DIGIT_RE", "ALPHA_RE",
    "EMAIL_RE", "PHONE_RE", "IPV4_RE",
    "text_stats", "token_counts", "quality_scores", "fingerprints",
    "rolling_hash_many", "shingle_hashes", "pii_redact", "hash_split",
]

# RE2-safe patterns, shared verbatim with the DuckDB oracles.
WORD_RE = r"\S+"                              # whitespace-delimited words
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"  # BPE-ish coarse tokens
SENT_RE = r"[.!?]+"
PUNCT_RE = r"[^A-Za-z0-9\s]"
DIGIT_RE = r"[0-9]"
ALPHA_RE = r"[A-Za-z]"

WORDS_PER_MIN = 265.0     # est_read_time_meta_service.py:7
CHARS_PER_PAGE = 3000.0   # statistics_metadata_service page_count rule

# PII patterns (RE2-safe, shared verbatim with the DuckDB oracle)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9][0-9 ()-]{6,}[0-9]"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def _count(col: pa.ChunkedArray | pa.Array, pattern: str) -> np.ndarray:
    return pc.count_substring_regex(col, pattern=pattern).to_numpy(
        zero_copy_only=False).astype(np.int64)


def text_stats(batch: pa.Table, text_col: str = "text",
               id_col: str = "doc_id") -> pa.Table:
    """Per-document statistics (ref M21/M22): sizes, word/sentence
    counts, page count, estimated read time."""
    text = batch[text_col]
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    n_bytes = pc.binary_length(text.cast(pa.binary())).to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_words = _count(text, WORD_RE)
    n_sentences = _count(text, SENT_RE)
    n_pages = n_chars // np.int64(CHARS_PER_PAGE)
    read_time_min = n_words / WORDS_PER_MIN
    return pa.table({
        id_col: batch[id_col],
        "n_chars": pa.array(n_chars),
        "n_bytes": pa.array(n_bytes),
        "n_words": pa.array(n_words),
        "n_sentences": pa.array(n_sentences),
        "n_pages": pa.array(n_pages),
        "read_time_min": pa.array(read_time_min),
    })


def token_counts(batch: pa.Table, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    """Whitespace + BPE-ish regex token counts (training-data op)."""
    text = batch[text_col]
    return pa.table({
        id_col: batch[id_col],
        "n_ws_tokens": pa.array(_count(text, WORD_RE)),
        "n_bpe_tokens": pa.array(_count(text, TOKEN_RE)),
    })


def quality_scores(batch: pa.Table, text_col: str = "text",
                   id_col: str = "doc_id") -> pa.Table:
    """Heuristic document-quality signals + composite score.

    All component ratios are per-row float expressions with a fixed
    operation tree, so the DuckDB oracle reproduces them bit-exactly.
    """
    text = batch[text_col]
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    n_words = _count(text, WORD_RE)
    n_alpha = _count(text, ALPHA_RE)
    n_digit = _count(text, DIGIT_RE)
    n_punct = _count(text, PUNCT_RE)
    denom_c = np.maximum(n_chars, 1).astype(np.float64)
    denom_w = np.maximum(n_words, 1).astype(np.float64)
    alpha_ratio = n_alpha / denom_c
    digit_ratio = n_digit / denom_c
    punct_ratio = n_punct / denom_c
    mean_word_len = n_alpha / denom_w
    # length score: 1 inside [50, 20000] chars, linear ramp below/above
    length_score = np.minimum(n_chars / 50.0, 1.0)
    quality = alpha_ratio * 0.5 + length_score * 0.3 \
        + (1.0 - punct_ratio) * 0.1 + (1.0 - digit_ratio) * 0.1
    return pa.table({
        id_col: batch[id_col],
        "alpha_ratio": pa.array(alpha_ratio),
        "digit_ratio": pa.array(digit_ratio),
        "punct_ratio": pa.array(punct_ratio),
        "mean_word_len": pa.array(mean_word_len),
        "length_score": pa.array(length_score),
        "quality": pa.array(quality),
    })


# --------------------------------------------------------------------------
# rolling-hash fingerprints (Karp–Rabin over utf-8 bytes, mod 2^64 wrap)
# --------------------------------------------------------------------------

_BASE = np.uint64(1_000_003)
_MAX_POW = 1 << 16          # power table grows on demand past this
_POWS = np.empty(0, dtype=np.uint64)


def _powers(n: int) -> np.ndarray:
    global _POWS
    if len(_POWS) < n:
        size = max(n, _MAX_POW)
        p = np.empty(size, dtype=np.uint64)
        p[0] = 1
        with np.errstate(over="ignore"):
            np.multiply.accumulate(np.full(size - 1, _BASE, dtype=np.uint64),
                                   out=p[1:])
        _POWS = p
    return _POWS


def rolling_hash_many(texts: list[str | None]) -> np.ndarray:
    """Polynomial rolling hash of each string's utf-8 bytes
    (``h = Σ b_i · B^(n-1-i) mod 2^64``), numpy-vectorized per doc."""
    out = np.zeros(len(texts), dtype=np.uint64)
    if not texts:
        return out
    bufs = [t.encode("utf-8") if t else b"" for t in texts]
    pows = _powers(max((len(b) for b in bufs), default=1) + 1)
    with np.errstate(over="ignore"):
        for i, b in enumerate(bufs):
            if b:
                v = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
                out[i] = (v * pows[len(b) - 1::-1][:len(b)]).sum(
                    dtype=np.uint64)
    return out


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """All k-byte shingle hashes of a string via prefix hashes:
    ``H[i..i+k) = P[i+k] − P[i]·B^k`` in mod-2^64 wrap arithmetic.
    O(n) total — reused by MinHash (dedup) below."""
    b = text.encode("utf-8")
    n = len(b)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    if n <= k:
        return rolling_hash_many([text])
    v = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    pref = np.zeros(n + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(n):       # sequential recurrence; see chunked note below
            pref[i + 1] = pref[i] * _BASE + v[i]
        return pref[k:] - pref[:-k] * _powers(k + 1)[k]


def shingle_hashes_fast(text: str, k: int = 5) -> np.ndarray:
    """Vectorized variant of :func:`shingle_hashes`: hash of window i is
    ``Σ_j b[i+j]·B^(k-1-j)`` computed as k shifted vector multiplies —
    O(k) numpy passes instead of an O(n) Python loop."""
    b = text.encode("utf-8")
    n = len(b)
    if n < k:
        return rolling_hash_many([text]) if n else np.zeros(0, dtype=np.uint64)
    v = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    pows = _powers(k + 1)
    out = np.zeros(n - k + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            out += v[j:j + n - k + 1] * pows[k - 1 - j]
    return out


def pii_redact(batch: pa.Table, text_col: str = "text",
               id_col: str = "doc_id") -> pa.Table:
    """PII detection + redaction (training-data cleaning op): emails,
    phone numbers and IPv4 literals are counted and replaced by typed
    placeholders, **sequentially** (emails first, then phones on the
    email-redacted text, then IPs) so the count/replace composition
    is a fixed operation tree the DuckDB oracle reproduces exactly.
    All work on Arrow RE2 kernels; the md5 of the redacted text is
    emitted instead of the text so the result row stays small and the
    oracle can still verify the full redaction byte-for-byte."""
    import hashlib
    text = batch[text_col]
    n_emails = _count(text, EMAIL_RE)
    t1 = pc.replace_substring_regex(text, pattern=EMAIL_RE,
                                    replacement="<EMAIL>")
    n_phones = _count(t1, PHONE_RE)
    t2 = pc.replace_substring_regex(t1, pattern=PHONE_RE,
                                    replacement="<PHONE>")
    n_ipv4 = _count(t2, IPV4_RE)
    t3 = pc.replace_substring_regex(t2, pattern=IPV4_RE,
                                    replacement="<IP>")
    md5s = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in t3.to_pylist()]
    return pa.table({
        id_col: batch[id_col],
        "n_emails": pa.array(n_emails),
        "n_phones": pa.array(n_phones),
        "n_ipv4": pa.array(n_ipv4),
        "redacted_md5": pa.array(md5s, pa.string()),
    })


# train/val/test thresholds on the first md5 hex byte, compared AS
# 2-char lowercase hex strings (lexicographic == numeric for fixed
# width, so the same CASE works in SQL): 'cd' = 205/256 ≈ 80 %,
# 'e6' = 230/256 ≈ 90 %.
SPLIT_TRAIN_HI = "cd"
SPLIT_VAL_HI = "e6"


def hash_split(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic train/val/test assignment by content-independent
    id hash (the standard reproducible-split op for training
    pipelines): bucket = first md5 hex byte of the stringified id —
    stable across runs, engines, and row order."""
    import hashlib
    ids = batch[id_col].to_pylist()
    buckets = [hashlib.md5(str(i).encode()).hexdigest()[:2] for i in ids]
    split = ["train" if b < SPLIT_TRAIN_HI
             else "val" if b < SPLIT_VAL_HI else "test" for b in buckets]
    return pa.table({
        id_col: batch[id_col],
        "bucket_hex": pa.array(buckets, pa.string()),
        "split": pa.array(split, pa.string()),
    })


def fingerprints(batch: pa.Table, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    """Document fingerprints: 64-bit rolling hash (fast identity at
    10^10-doc scale) + md5 hex (cross-checkable by the SQL oracle)."""
    import hashlib
    texts = batch[text_col].to_pylist()
    roll = rolling_hash_many(texts)
    md5s = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return pa.table({
        id_col: batch[id_col],
        "fingerprint": pa.array(roll, pa.uint64()),
        "content_md5": pa.array(md5s, pa.string()),
    })
