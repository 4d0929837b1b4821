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

__all__ = ["md5_hex", "md5_hex_many", "composite_doc_key", "doc_key"]

_CHECK = "ABCDEFGHJKLMNPQRSTVWXYZ"   # document_key_service.py check alphabet shape


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def md5_hex_many(strings) -> list[str]:
    md5 = hashlib.md5
    return [md5(s.encode("utf-8")).hexdigest() for s in strings]


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
