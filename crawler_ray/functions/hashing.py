"""Document identity hashing.

The reference keys documents by ``md5(document_title)``
(``pygdpr/models/dpa/austria/__init__.py:99`` and every scraper) and
disambiguates same-title/different-date collisions with a composite
``hash + '-' + date`` key (``denmark/__init__.py:135-140``). Both
rules are reproduced here; frontier identity uses the canonical-URL
hash from :mod:`crawler_ray.urlnorm` instead (north_rule).

``doc_key`` reproduces ``services/document_key_service.py:5-27``'s
``K+YYMMDD-ZZZZ+check-char+CC`` generator, but seeded — the reference
uses unseeded ``random.randint`` (``:23``), which our determinism rule
forbids.
"""

from __future__ import annotations

import hashlib

__all__ = ["md5_hex", "md5_hex_many", "md5_hex_of_ids",
           "md5_hex_of_strings", "composite_doc_key", "doc_key"]

_CHECK = "ABCDEFGHJKLMNPQRSTVWXYZ"   # document_key_service.py check alphabet shape


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def md5_hex_many(strings) -> list[str]:
    md5 = hashlib.md5
    return [md5(s.encode("utf-8")).hexdigest() for s in strings]


_DUCK = None


def md5_hex_of_ids(ids) -> "numpy.ndarray":
    """Vectorized ``md5(str(id))`` hexdigests for an int64 array.

    md5-of-decimal-id is the engine's cross-engine-reproducible
    sampling key (it is exactly what the DuckDB oracles compute with
    ``md5(CAST(doc_id AS VARCHAR))``), so the algorithm is fixed —
    but a Python ``hashlib`` loop per row was the hot cost of the
    sampling stages. DuckDB is a baked-in dependency with the same
    md5 as a C++ table kernel, so the batch is pushed through one
    in-process DuckDB projection (per-worker cached connection);
    ``hashlib`` remains as the fallback path.
    """
    import numpy as np
    import pyarrow as pa

    ids = np.asarray(ids, dtype=np.int64)
    global _DUCK
    try:
        import duckdb
        if _DUCK is None:
            _DUCK = duckdb.connect()
            # Row-alignment of the projection output with the registered
            # table is what makes these hashes usable as per-row keys.
            # DuckDB preserves insertion order by default, but the
            # invariant is load-bearing (sampling + exact-dedup keys
            # silently corrupt if it breaks), so pin it explicitly on
            # this single-threaded, per-worker cached connection.
            _DUCK.execute("SET preserve_insertion_order=true")
        t = pa.table({"i": pa.array(ids, pa.int64())})
        _DUCK.register("_md5_ids", t)
        out = _DUCK.execute(
            "SELECT md5(CAST(i AS VARCHAR)) AS h FROM _md5_ids"
        ).arrow()
        return out["h"].to_numpy(zero_copy_only=False)
    except Exception:
        md5 = hashlib.md5
        return np.array([md5(str(i).encode()).hexdigest() for i in ids],
                        dtype=object)


def md5_hex_of_strings(values) -> "numpy.ndarray":
    """Vectorized md5 hexdigests of a utf8 string column (pyarrow
    Array/ChunkedArray or any sequence of str). Same DuckDB-kernel
    strategy as :func:`md5_hex_of_ids` — DuckDB's ``md5(VARCHAR)``
    hashes the utf-8 bytes exactly like ``hashlib.md5(s.encode())``,
    as one C++ projection instead of a Python loop per row. NULLs
    hash as empty strings (the ``(t or "")`` convention of the exact-
    dedup stage)."""
    import numpy as np
    import pyarrow as pa

    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array(list(values), pa.string())
    global _DUCK
    try:
        import duckdb
        if _DUCK is None:
            _DUCK = duckdb.connect()
        t = pa.table({"v": values})
        _DUCK.register("_md5_strs", t)
        out = _DUCK.execute(
            "SELECT md5(coalesce(v, '')) AS h FROM _md5_strs").arrow()
        return out["h"].to_numpy(zero_copy_only=False)
    except Exception:
        md5 = hashlib.md5
        return np.array([md5(((s if s is not None else "")
                              ).encode("utf-8")).hexdigest()
                         for s in values.to_pylist()], dtype=object)


def composite_doc_key(doc_hash: str, date_iso: str | None) -> str:
    """denmark:135-140 collision rule: same hash + different date →
    key extended with the date."""
    return doc_hash if not date_iso else f"{doc_hash}-{date_iso}"


def doc_key(release_date_iso: str, country_code: str, serial: int) -> str:
    """Deterministic document key ``K<YYMMDD>-<ZZZZ><check><CC>``
    (ref ``services/document_key_service.py:5-27``; ``random.randint``
    replaced by an explicit serial so keys are reproducible)."""
    y, m, d = release_date_iso.split("-")
    body = f"{y[2:]}{m}{d}-{serial % 10000:04d}"
    check = _CHECK[sum(ord(c) for c in body) % len(_CHECK)]
    return f"K{body}{check}{country_code.upper()[:2]}"
