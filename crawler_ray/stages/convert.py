"""Content-type dispatch + binary-document text converters (M8-M13).

The reference routes fetched payloads to per-format extractors:
pdfminer (``services/pdf_to_text_service.py:63-88``), OCR fallback
(``:26-61``), textract (``austria/__init__.py:136-138``), docx2txt
(``slovakia/__init__.py:229-251``), striprtf (``france/__init__.py:16``),
and zip-of-HTML concat (``belgium/__init__.py:655-690``). This module
implements the converters with the **stdlib only**:

- **dispatch** — magic-byte sniffing; **batch plumbing** — actor-pool
  ``map_batches`` over ``binary`` payloads, small batches (M9 is the
  classic skew source, SURVEY §4);
- **DOCX** (M11) — a docx is a zip whose text lives in
  ``word/document.xml``: ``<w:t>`` runs per ``<w:p>`` paragraph,
  tabs/breaks mapped (``zipfile`` + ``xml.etree``);
- **RTF** (M12) — group-aware control-word scan (destination groups
  skipped, ``\\par``/``\\line`` → newline, ``\\'hh`` / ``\\uN``
  escapes decoded) — striprtf semantics without the dependency;
- **PDF** (M8) — a minimal text-stream extractor for the common case:
  raw or FlateDecode content streams, string literals of ``Tj`` /
  ``TJ`` operators in stream order (escape/octal decoding). PDFs
  whose text hides in object streams or exotic encodings fall back
  to the deterministic placeholder (``sniff + payload sha1``), or
  raise under ``strict=True``; OCR (M9) stays placeholder-only (no
  raster stack in this container);
- **zip-of-HTML** (M13) — stdlib zip walk, members sorted, text via
  the engine's own extractor.

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
import zlib

import pyarrow as pa

__all__ = ["sniff_type", "join_broken_lines", "docx_to_text",
           "rtf_to_text", "pdf_to_text_min", "ConvertStage",
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


# --------------------------------------------------------------------------
# stdlib format converters
# --------------------------------------------------------------------------

_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def docx_to_text(payload: bytes) -> str:
    """M11 (``slovakia/__init__.py:229-251``): extract the text runs
    of ``word/document.xml`` — one line per ``<w:p>`` paragraph,
    ``<w:tab>`` → tab, ``<w:br>``/``<w:cr>`` → newline."""
    import xml.etree.ElementTree as ET
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        root = ET.fromstring(zf.read("word/document.xml"))
    paras = []
    for p in root.iter(_W_NS + "p"):
        parts = []
        for el in p.iter():
            if el.tag == _W_NS + "t":
                parts.append(el.text or "")
            elif el.tag == _W_NS + "tab":
                parts.append("\t")
            elif el.tag in (_W_NS + "br", _W_NS + "cr"):
                parts.append("\n")
        paras.append("".join(parts))
    return "\n".join(paras)


_RTF_TOKEN = re.compile(
    rb"\\([a-zA-Z]+)(-?\d+)? ?|\\'([0-9a-fA-F]{2})|\\([^a-zA-Z])"
    rb"|([{}])|([^\\{}]+)", re.DOTALL)
_RTF_DESTINATIONS = frozenset((
    b"fonttbl", b"colortbl", b"stylesheet", b"listtable",
    b"listoverridetable", b"info", b"header", b"footer", b"headerl",
    b"headerr", b"footerl", b"footerr", b"pict", b"object", b"field",
    b"themedata", b"generator", b"xmlnstbl", b"footnote",
))
_RTF_SPECIALS = {b"par": "\n", b"line": "\n", b"sect": "\n",
                 b"page": "\n", b"tab": "\t", b"emdash": "\u2014",
                 b"endash": "\u2013", b"bullet": "\u2022",
                 b"lquote": "\u2018", b"rquote": "\u2019",
                 b"ldblquote": "\u201c", b"rdblquote": "\u201d",
                 b"emspace": " ", b"enspace": " "}


def rtf_to_text(payload: bytes) -> str:
    """M12 (``france/__init__.py:16``, striprtf semantics): strip
    control words with a group-aware scan — destination groups and
    ``\\*`` ignorables are dropped, paragraph/line/tab controls map to
    whitespace, ``\\'hh`` and ``\\uN`` escapes decode (honoring
    ``\\ucN`` skip counts)."""
    stack: list[tuple[int, bool]] = []
    ignorable = False
    ucskip = 1
    curskip = 0
    out: list[str] = []
    for m in _RTF_TOKEN.finditer(payload):
        word, arg, hexc, char, brace, tdata = m.groups()
        if brace == b"{":
            stack.append((ucskip, ignorable))
            curskip = 0
        elif brace == b"}":
            if stack:
                ucskip, ignorable = stack.pop()
            curskip = 0
        elif char is not None:
            curskip = 0
            if char == b"~":
                if not ignorable:
                    out.append("\xa0")
            elif char in (b"{", b"}", b"\\"):
                if not ignorable:
                    out.append(char.decode())
            elif char == b"*":
                ignorable = True
        elif word is not None:
            curskip = 0
            if word in _RTF_DESTINATIONS:
                ignorable = True
            elif ignorable:
                pass
            elif word in _RTF_SPECIALS:
                out.append(_RTF_SPECIALS[word])
            elif word == b"uc":
                ucskip = int(arg or 1)
            elif word == b"u":
                c = int(arg or 0)
                if c < 0:
                    c += 0x10000
                out.append(chr(c))
                curskip = ucskip
        elif hexc is not None:
            if curskip > 0:
                curskip -= 1
            elif not ignorable:
                out.append(chr(int(hexc, 16)))
        elif tdata is not None:
            if curskip > 0:
                tdata = tdata[curskip:]
                curskip = 0
            if not ignorable:
                out.append(tdata.replace(b"\r", b"").replace(b"\n", b"")
                           .decode("latin-1"))
    return "".join(out)


_PDF_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
# content-stream tokens walked in order: font select (Tf) + the three
# show-text forms — the Tf alternative keeps the active ToUnicode CMap
# in sync with the strings it governs
_PDF_TEXT_OP_RE = re.compile(
    rb"/([^\s/<>\[\]()]+)\s+[\d.+-]+\s+Tf"
    rb"|\(((?:\\.|[^()\\])*)\)\s*Tj"
    rb"|<([0-9A-Fa-f\s]*)>\s*Tj"
    rb"|\[((?:\\.|[^\]\\])*?)\]\s*TJ", re.DOTALL)
# string elements inside a TJ array: literal OR hex form
_PDF_STR_EL_RE = re.compile(rb"\(((?:\\.|[^()\\])*)\)|<([0-9A-Fa-f\s]*)>")
_PDF_ESC_RE = re.compile(rb"\\(n|r|t|b|f|\(|\)|\\|[0-7]{1,3})")
_PDF_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\x08",
            b"f": b"\x0c", b"(": b"(", b")": b")", b"\\": b"\\"}

# object graph + ToUnicode CMap syntax (PDF 32000-1 §9.10.3 / Adobe
# CMap spec): enough to resolve  page resources /Font << /F1 N 0 R >>
# → font obj /ToUnicode M 0 R → CMap stream bfchar/bfrange sections
_PDF_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)\bendobj", re.DOTALL)
_PDF_FONTDICT_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.DOTALL)
_PDF_NAMEREF_RE = re.compile(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R")
_PDF_TOUNI_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_CMAP_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_CMAP_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_CMAP_PAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_CMAP_RANGE_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
    rb"(?:<([0-9A-Fa-f]+)>|\[(.*?)\])", re.DOTALL)
_CMAP_DST_RE = re.compile(rb"<([0-9A-Fa-f]+)>")


def _pdf_unescape_bytes(raw: bytes) -> bytes:
    def sub(m):
        g = m.group(1)
        return _PDF_ESC.get(g) or bytes([int(g, 8) & 0xFF])
    return _PDF_ESC_RE.sub(sub, raw)


def _pdf_unescape(raw: bytes) -> str:
    return _pdf_unescape_bytes(raw).decode("latin-1")


def _pdf_unhex_bytes(raw: bytes) -> bytes:
    """PDF hex string ``<48656c6c6f>`` → bytes. Whitespace is ignored,
    an odd final digit is zero-padded (PDF 32000-1 §7.3.4.3)."""
    h = b"".join(raw.split())
    if len(h) % 2:
        h += b"0"
    try:
        return bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return b""


def _pdf_unhex(raw: bytes) -> str:
    """Decode a PDF hex string (the common show-text operand of
    font-subset PDFs; ``pdf_to_text_service.py:63-88`` parity via
    pdfminer). Bytes decode as latin-1 when no ToUnicode CMap governs
    the string (see :func:`_pdf_apply_cmap` for the CID remap)."""
    return _pdf_unhex_bytes(raw).decode("latin-1")


def _cmap_utf16(h: bytes) -> str:
    """A CMap dst hex token → text (UTF-16BE per the spec; a 1-byte
    dst — seen in Type1 subsets — is a direct char code)."""
    if len(h) % 2:
        h += b"0"
    b = bytes.fromhex(h.decode("ascii"))
    if len(b) % 2:
        return b.decode("latin-1")
    return b.decode("utf-16-be", "surrogatepass")


def _parse_tounicode(data: bytes) -> tuple[int, dict[int, str]] | None:
    """Parse a ToUnicode CMap stream into (code byte-width,
    code → unicode). Handles ``bfchar`` pairs and both ``bfrange``
    forms (incrementing dst and explicit dst array)."""
    codes: dict[int, str] = {}
    width = 0
    for m in _CMAP_BFCHAR_RE.finditer(data):
        for pm in _CMAP_PAIR_RE.finditer(m.group(1)):
            src, dst = pm.groups()
            width = max(width, len(src) // 2)
            codes[int(src, 16)] = _cmap_utf16(dst)
    for m in _CMAP_BFRANGE_RE.finditer(data):
        for rm in _CMAP_RANGE_RE.finditer(m.group(1)):
            lo, hi, dst, arr = rm.groups()
            width = max(width, len(lo) // 2)
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            if hi_i < lo_i or hi_i - lo_i > 0xFFFF:   # malformed guard
                continue
            if dst is not None:
                base, dlen = int(dst, 16), len(dst)
                for i in range(hi_i - lo_i + 1):
                    codes[lo_i + i] = _cmap_utf16(
                        ("%0*X" % (dlen, base + i)).encode("ascii"))
            elif arr is not None:
                for i, dm in enumerate(_CMAP_DST_RE.finditer(arr)):
                    if lo_i + i > hi_i:
                        break
                    codes[lo_i + i] = _cmap_utf16(dm.group(1))
    return (max(width, 1), codes) if codes else None


def _pdf_font_cmaps(payload: bytes) -> dict[bytes, tuple[int, dict]]:
    """Resource font name (``F1``) → parsed ToUnicode CMap, resolved
    through the object graph: every ``/Font << /Fx N 0 R >>`` resource
    dict, each font object's ``/ToUnicode M 0 R``, the CMap stream in
    object M (raw or FlateDecode). Fonts without ToUnicode simply
    don't appear (their strings keep the latin-1 fallback)."""
    objs: dict[int, bytes] = {
        int(om.group(1)): om.group(2)
        for om in _PDF_OBJ_RE.finditer(payload)}
    cmap_by_obj: dict[int, tuple[int, dict] | None] = {}

    def cmap_of(font_obj: int):
        if font_obj in cmap_by_obj:
            return cmap_by_obj[font_obj]
        out = None
        body = objs.get(font_obj, b"")
        tu = _PDF_TOUNI_RE.search(body)
        if tu:
            sm = _PDF_STREAM_RE.search(objs.get(int(tu.group(1)), b""))
            if sm:
                data = sm.group(1)
                try:
                    data = zlib.decompress(data)
                except zlib.error:
                    pass
                out = _parse_tounicode(data)
        cmap_by_obj[font_obj] = out
        return out

    by_name: dict[bytes, tuple[int, dict]] = {}
    for body in objs.values():
        for fm in _PDF_FONTDICT_RE.finditer(body):
            for nm in _PDF_NAMEREF_RE.finditer(fm.group(1)):
                cm = cmap_of(int(nm.group(2)))
                if cm is not None:
                    by_name.setdefault(nm.group(1), cm)
    return by_name


def _pdf_apply_cmap(bs: bytes, cmap: tuple[int, dict] | None) -> str:
    """String bytes → text under the active font's ToUnicode CMap
    (codes of the CMap's byte-width looked up individually). When no
    CMap governs the string, or most codes miss (a string shown in a
    different font than the tracked one), fall back to latin-1 — the
    pre-CMap behavior."""
    if cmap is None or not bs:
        return bs.decode("latin-1")
    width, codes = cmap
    n = len(bs) - len(bs) % width
    if n == 0:
        # string shorter than the CMap code width (a 1-byte literal in
        # a 2-byte-code font scope): no code to look up — latin-1, not
        # the empty string
        return bs.decode("latin-1")
    toks = [codes.get(int.from_bytes(bs[i:i + width], "big"))
            for i in range(0, n, width)]
    misses = sum(t is None for t in toks)
    if 2 * misses > max(1, len(toks)):
        return bs.decode("latin-1")
    return "".join(t for t in toks if t is not None)


def pdf_to_text_min(payload: bytes) -> str:
    """M8 minimal path (vs ``services/pdf_to_text_service.py:63-88``):
    walk content streams (raw or FlateDecode), emit the string
    operands of ``Tj``/``TJ`` show-text operators in stream order —
    both ``(literal)`` and ``<hex>`` forms — one line per operator.
    ``Tf`` font selects are tracked so strings shown in a CID font
    with a ToUnicode CMap (the standard font-subset layout) decode
    through the CMap instead of as latin-1 garbage. Returns "" when
    no text operator is found (caller falls back / flags)."""
    cmaps = _pdf_font_cmaps(payload) if b"/ToUnicode" in payload else {}
    lines: list[str] = []
    for m in _PDF_STREAM_RE.finditer(payload):
        data = m.group(1)
        try:
            data = zlib.decompress(data)
        except zlib.error:
            pass
        if b"Tj" not in data and b"TJ" not in data:
            continue
        cur: tuple[int, dict] | None = None
        for tm in _PDF_TEXT_OP_RE.finditer(data):
            if tm.group(1) is not None:          # /Fx size Tf
                cur = cmaps.get(tm.group(1))
            elif tm.group(2) is not None:        # (literal) Tj
                lines.append(_pdf_apply_cmap(
                    _pdf_unescape_bytes(tm.group(2)), cur))
            elif tm.group(3) is not None:        # <hex> Tj
                lines.append(_pdf_apply_cmap(
                    _pdf_unhex_bytes(tm.group(3)), cur))
            else:                                # [...] TJ
                lines.append("".join(
                    _pdf_apply_cmap(_pdf_unescape_bytes(x.group(1)), cur)
                    if x.group(1) is not None
                    else _pdf_apply_cmap(_pdf_unhex_bytes(x.group(2)), cur)
                    for x in _PDF_STR_EL_RE.finditer(tm.group(4))))
    return "\n".join(ln for ln in lines if ln.strip())


def _ocr_raster(payload: bytes) -> str:     # pragma: no cover (libs absent)
    """Default ``ocr_fn`` when pdf2image + pytesseract exist in the
    deployment (``pdf_to_text_service.py:26-61`` parity): rasterize
    each page, OCR, join. Never reachable in this container."""
    import pdf2image
    import pytesseract
    pages = pdf2image.convert_from_bytes(payload)
    return "\n".join(pytesseract.image_to_string(p) for p in pages)


class ConvertStage:
    """Actor-pool converter: ``ds.map_batches(ConvertStage,
    batch_size=32, concurrency=(2, 8), batch_format="pyarrow")``.

    Backends resolved ONCE per actor in ``__init__`` (the model-load
    pattern); ``__call__`` sniffs each payload and dispatches. Output:
    ``(id, content_type, text, converter)``."""

    def __init__(self, payload_col: str = "body", id_col: str = "url",
                 strict: bool = False, ocr_fn=None):
        """``ocr_fn`` is the M9 OCR seam (reference routing rule
        ``pdf_to_text_service.py:84-88``: empty extracted text →
        rasterize + OCR). Same injection pattern as
        ``RenderStage(browser_factory=)`` / ``TokenBroker(mint_fn=)``:
        a deployment with a raster stack passes
        ``ocr_fn=lambda payload: tesseract_text(payload)``; when None
        and pytesseract/pdf2image are importable they are auto-wired,
        else the placeholder/strict behavior stands."""
        self.payload_col, self.id_col = payload_col, id_col
        self.strict = strict
        # richer external backends used when present (absent in this
        # container); the stdlib converters below are the default
        self.pdfminer = _try_import("pdfminer")
        if ocr_fn is None and _try_import("pytesseract") is not None \
                and _try_import("pdf2image") is not None:
            ocr_fn = _ocr_raster           # pragma: no cover (libs absent)
        self.ocr_fn = ocr_fn

    # -- converters -------------------------------------------------------
    def _placeholder(self, kind: str, payload: bytes) -> tuple[str, str]:
        if self.strict:
            raise NotImplementedError(
                f"no {kind} text-extraction backend in this environment")
        return (f"[{kind}:{hashlib.sha1(payload).hexdigest()}]",
                f"stub:{kind}")

    def _pdf(self, payload: bytes) -> tuple[str, str]:
        if self.pdfminer is not None:        # pragma: no cover (lib absent)
            from pdfminer.high_level import extract_text as pm_extract
            return pm_extract(io.BytesIO(payload)), "pdfminer"
        text = pdf_to_text_min(payload)
        if text:
            return text, "pdf-min"
        # no extractable text stream (scanned/object-stream PDF): the
        # reference OCRs here (M9, pdf_to_text_service.py:84-88) —
        # route through the injected backend when one exists, else
        # placeholder (or strict raise). An EMPTY OCR result keeps the
        # placeholder/strict contract (downstream quality gates key on
        # it) instead of silently accepting an empty document.
        if self.ocr_fn is not None:
            ocr_text = self.ocr_fn(payload)
            if ocr_text:
                return ocr_text, "ocr"
        return self._placeholder("pdf", payload)

    def _docx(self, payload: bytes) -> tuple[str, str]:
        try:
            return docx_to_text(payload), "docx-xml"
        except (zipfile.BadZipFile, KeyError, SyntaxError, ValueError):
            return self._placeholder("docx", payload)

    def _rtf(self, payload: bytes) -> tuple[str, str]:
        try:
            return rtf_to_text(payload), "rtf-scan"
        except (ValueError, UnicodeDecodeError):
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
