"""Document-metadata extraction kernels (the reference's metadata
service pipeline, re-expressed as batch column-UDFs).

Reference parity (all under ``/root/reference/pygdpr/services/``):

- M16 keywords   — ``metadata/keywords_metadata_service/__init__.py:15-34``
  (clean → tokenize → n-gram counts → top-20). The reference lemmatizes
  with NLTK; that library is absent here, so the deterministic
  re-expression counts 1..3-grams of lowercased alpha tokens minus a
  built-in English stopword list (same shape, library-free).
- M23 summary    — ``metadata/summary_metadata_service/__init__.py:1-35``:
  word-frequency-scored sentences, top-2 by score.
- M19 citations count — ``metadata/citations_count_metadata_service/
  __init__.py:4-13``: occurrences of {gdpr, rgpd, 2016/679}.
- M18 GDPR article refs — ``metadata/citations_metadata_service/
  __init__.py:39-191`` + validation tree ``gdpr_article_validation_
  tree_service.py:5-140`` + chapter ranges ``gdpr_chapter_section_
  service.py:19-29``: find "article N(P)(L)" spans, validate against
  a built-in article tree, attach the chapter via a range lookup (J4).
- M20 monetary penalties — ``metadata/monetary_penalties_metadata_
  service/__init__.py:6-79``: join split numerals, find fine/penalty
  sentences, match a currency dimension (J3), parse the amount.
- M17 timeline   — ``metadata/timeline_metadata_service/__init__.py:9-39``:
  per-sentence absolute dates → ``list<struct<date, text>>``.

Every kernel is ``pyarrow.Table -> pyarrow.Table`` for
``ds.map_batches(fn, batch_format="pyarrow")``; the per-document token
loops are inherent to the algorithms (regexes precompiled at module
import), everything around them is columnar. ``enrich_documents``
composes any subset as one map_batches stage — the reference's
``extract_metadata(pipeline=[(key, svc), ...])`` hook
(``pygdpr/models/dpa/__init__.py:691-751``) as plain data.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa

__all__ = [
    "keywords_batch", "summary_batch", "citations_count_batch",
    "citation_refs_batch", "penalties_batch", "timeline_batch",
    "enrich_documents", "GDPR_CHAPTERS", "EU_CURRENCIES",
]

# ---------------------------------------------------------------------------
# small dimension data (broadcast inside the closures — J3/J4)
# ---------------------------------------------------------------------------

# chapter -> inclusive article range (gdpr_chapter_section_service.py:19-29)
GDPR_CHAPTERS = [
    (1, 1, 4), (2, 5, 11), (3, 12, 23), (4, 24, 43), (5, 44, 50),
    (6, 51, 59), (7, 60, 76), (8, 77, 84), (9, 85, 91), (10, 92, 93),
    (11, 94, 99),
]
MAX_ARTICLE = 99

# symbol/code -> ISO code (list_eu_currencies_service/__init__.py:4-15)
EU_CURRENCIES = {
    "€": "EUR", "eur": "EUR", "euro": "EUR", "euros": "EUR",
    "kr": "DKK", "dkk": "DKK", "sek": "SEK", "huf": "HUF",
    "pln": "PLN", "czk": "CZK", "ron": "RON", "bgn": "BGN",
    "hrk": "HRK", "£": "GBP", "gbp": "GBP",
}

_STOPWORDS = frozenset(
    "a an and are as at be by for from has he in is it its of on that the "
    "to was were will with this which or not no i you your they them their "
    "we our but if then than so such may shall must can could would "
    "should".split())

_WORD_RE = re.compile(r"[a-z]+")
_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")
_CITE_RE = re.compile(r"\bgdpr\b|\brgpd\b|2016/679")
_ARTICLE_RE = re.compile(
    r"\barticle[s]?\s+(\d{1,3})"          # article number
    r"(?:\s*\((\d{1,2})\))?"              # optional paragraph (N)
    r"(?:\s*\(([a-z])\))?",               # optional letter (l)
    re.IGNORECASE)
_AMOUNT_RE = re.compile(            # "2 500 EUR", "1.000,50 euros"
    r"([0-9][0-9 .,]*[0-9]|[0-9])\s*"
    r"(€|eur|euros?|kr|dkk|sek|huf|pln|czk|ron|bgn|hrk|£|gbp)\b",
    re.IGNORECASE)
_AMOUNT_PRE_RE = re.compile(        # "€2,500", "£ 99"
    r"(€|£)\s*([0-9][0-9 .,]*[0-9]|[0-9])")
_PENALTY_HINT = re.compile(r"\bfine|penalt|sanction", re.IGNORECASE)
_DATE_HINT = re.compile(
    r"\b(\d{1,2}\.\d{1,2}\.\d{4}|\d{1,2}-\d{1,2}-\d{4}|\d{4}-\d{1,2}-\d{1,2})\b")


def _tokens(text: str) -> list[str]:
    return [w for w in _WORD_RE.findall((text or "").lower())
            if w not in _STOPWORDS]


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def keywords_batch(batch: pa.Table, top_k: int = 20, max_n: int = 3,
                   text_col: str = "text", id_col: str = "doc_id"
                   ) -> pa.Table:
    """Top-k 1..max_n-gram keywords per document (M16). Per-doc local
    heap — no shuffle (SURVEY O1)."""
    out: list[list[str]] = []
    for text in batch[text_col].to_pylist():
        toks = _tokens(text)
        counts: Counter = Counter()
        for n in range(1, max_n + 1):
            for i in range(len(toks) - n + 1):
                counts[" ".join(toks[i:i + n])] += 1
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        out.append([t for t, _ in top])
    return pa.table({
        id_col: batch[id_col],
        "keywords": pa.array(out, pa.list_(pa.string())),
    })


def summary_batch(batch: pa.Table, top_k: int = 2,
                  text_col: str = "text", id_col: str = "doc_id"
                  ) -> pa.Table:
    """Word-frequency-scored extractive summary: top-k sentences in
    original order (M23)."""
    out: list[str] = []
    for text in batch[text_col].to_pylist():
        sents = _SENT_SPLIT.split(text or "")
        freq = Counter(_tokens(text))
        scored = [(sum(freq[w] for w in _tokens(s)), -i, s)
                  for i, s in enumerate(sents) if s.strip()]
        best = sorted(scored, reverse=True)[:top_k]
        best.sort(key=lambda t: -t[1])          # restore document order
        out.append(" ".join(s for _, _, s in best))
    return pa.table({
        id_col: batch[id_col],
        "summary": pa.array(out, pa.string()),
    })


def citations_count_batch(batch: pa.Table, text_col: str = "text",
                          id_col: str = "doc_id") -> pa.Table:
    """Count GDPR mentions (M19): tokens in {gdpr, rgpd, 2016/679}."""
    counts = [len(_CITE_RE.findall((t or "").lower()))
              for t in batch[text_col].to_pylist()]
    return pa.table({
        id_col: batch[id_col],
        "gdpr_mentions": pa.array(counts, pa.int64()),
    })


def _chapter_of(article: int) -> int | None:
    for ch, lo, hi in GDPR_CHAPTERS:
        if lo <= article <= hi:
            return ch
    return None


def citation_refs_batch(batch: pa.Table, text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """GDPR article references (M18): ``list<struct<article, paragraph,
    letter, chapter, valid>>`` — validated against the article range
    (the full per-paragraph tree in the reference collapses to a range
    check plus the chapter lookup here)."""
    ref_type = pa.struct([
        ("article", pa.int32()), ("paragraph", pa.int32()),
        ("letter", pa.string()), ("chapter", pa.int32()),
        ("valid", pa.bool_()),
    ])
    out = []
    for text in batch[text_col].to_pylist():
        refs = []
        for m in _ARTICLE_RE.finditer(text or ""):
            art = int(m.group(1))
            par = int(m.group(2)) if m.group(2) else None
            let = m.group(3)
            valid = 1 <= art <= MAX_ARTICLE
            refs.append({"article": art, "paragraph": par, "letter": let,
                         "chapter": _chapter_of(art) if valid else None,
                         "valid": valid})
        out.append(refs)
    return pa.table({
        id_col: batch[id_col],
        "gdpr_refs": pa.array(out, pa.list_(ref_type)),
    })


def _parse_amount(num: str) -> float | None:
    cleaned = num.replace(" ", "")
    # "1.000.000,50" (EU) vs "1,000,000.50" (EN) vs plain
    if "," in cleaned and "." in cleaned:
        if cleaned.rfind(",") > cleaned.rfind("."):
            cleaned = cleaned.replace(".", "").replace(",", ".")
        else:
            cleaned = cleaned.replace(",", "")
    elif "," in cleaned:
        head, _, tail = cleaned.rpartition(",")
        cleaned = head.replace(",", "") + "." + tail if len(tail) == 2 \
            else cleaned.replace(",", "")
    try:
        return float(cleaned)
    except ValueError:
        return None


def penalties_batch(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """Monetary penalties (M20): amounts with a currency token inside
    fine/penalty sentences → ``list<struct<amount, currency>>``."""
    pen_type = pa.struct([("amount", pa.float64()), ("currency", pa.string())])
    out = []
    for text in batch[text_col].to_pylist():
        pens = []
        for sent in _SENT_SPLIT.split(text or ""):
            if not _PENALTY_HINT.search(sent):
                continue
            spans: list[tuple[int, str, str]] = []
            for m in _AMOUNT_RE.finditer(sent):
                spans.append((m.start(), m.group(1), m.group(2)))
            covered = {s for s, _, _ in spans}
            for m in _AMOUNT_PRE_RE.finditer(sent):
                if m.start(2) - 2 not in covered and m.start() not in covered:
                    spans.append((m.start(), m.group(2), m.group(1)))
            for _pos, num, cur_tok in sorted(spans):
                amount = _parse_amount(num)
                cur = EU_CURRENCIES.get(cur_tok.lower())
                if amount is not None and cur:
                    pens.append({"amount": amount, "currency": cur})
        out.append(pens)
    return pa.table({
        id_col: batch[id_col],
        "penalties": pa.array(out, pa.list_(pen_type)),
    })


def timeline_batch(batch: pa.Table, text_col: str = "text",
                   id_col: str = "doc_id") -> pa.Table:
    """Timeline events (M17): absolute dates found per sentence →
    ``list<struct<date, text>>`` (the reference's fuzzy
    ``dateparser.search_dates`` becomes the engine's three explicit
    formats — determinism rule)."""
    from crawler_ray.functions.dates import parse_date_multi
    ev_type = pa.struct([("date", pa.date32()), ("text", pa.string())])
    out = []
    for text in batch[text_col].to_pylist():
        events = []
        for sent in _SENT_SPLIT.split(text or ""):
            for m in _DATE_HINT.finditer(sent):
                d = parse_date_multi(m.group(1))
                if d is not None:
                    events.append({"date": d, "text": sent.strip()})
        out.append(events)
    return pa.table({
        id_col: batch[id_col],
        "timeline": pa.array(out, pa.list_(ev_type)),
    })


# ---------------------------------------------------------------------------
# composition — the extract_metadata pipeline hook
# ---------------------------------------------------------------------------

_KERNELS = {
    "keywords": keywords_batch,
    "summary": summary_batch,
    "gdpr_mentions": citations_count_batch,
    "gdpr_refs": citation_refs_batch,
    "penalties": penalties_batch,
    "timeline": timeline_batch,
}


def enrich_documents(ds, keys: list[str] | None = None,
                     text_col: str = "text", id_col: str = "doc_id"):
    """Apply the named metadata kernels in ONE ``map_batches`` stage
    (each contributes one column, like the reference's ``(key,
    service)`` pairs)."""
    keys = keys or list(_KERNELS)

    def fn(batch: pa.Table) -> pa.Table:
        out = batch
        for k in keys:
            col = _KERNELS[k](batch, text_col=text_col, id_col=id_col)
            out = out.append_column(col.schema.field(1).name, col.column(1))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")
