"""Reference-structure SourceSpecs: real per-DPA page shapes.

The registry (``registry.py``) is the plugin surface; this module
proves it carries the reference's actual listing structures by
implementing three of the hand-written scrapers as ``page_parser``
callables over their real DOM shapes:

- **Austria / RIS** (``pygdpr/models/dpa/austria/__init__.py:79-113``):
  results live in ``<table class="bocListTable"><tbody
  class="bocListTableBody">`` rows ``<tr class="bocListDataRow">`` of
  ``<td class="bocListDataCell">`` cells — title = the ``title``
  attribute of the ``<a>`` in cell index 2, date = text of cell index
  4 (``%d.%m.%Y``), document href = first ``.pdf`` link among the
  ``<a>``s of cell index 8. Pagination (``austria:41-53``): the
  ``<ul class="Pages">`` nav's li[1] link is the next page.

- **Italy / Garante** (``pygdpr/models/dpa/italy/__init__.py:63-96``
  backwards pager + ``:122-141`` listing): result links are the
  ``<li><a>`` items of the top-level ``<ul>``s inside ``<div
  class="testo">`` (title = link text, no per-row date); the
  ``<ul class="pagination justify-content-center mt-3">`` nav's
  ``li.page-item`` entries enumerate every results page, and the
  reference walks them **last → first**
  (``update_pagination_backwards``, ``italy:63-96``) — realized here
  by emitting the page hrefs in reverse order, so the priority
  frontier (ordered by discovery index ``dom_idx``) fetches them
  backwards.

- **EDPB** (``pygdpr/models/dpa/edpb/__init__.py:217-266``): Drupal
  view rows — ``div.view-content`` → ``div.views-row``, date in
  ``span.news-date``, doc link in ``h4.node__title > a`` with the
  title in its inner ``span``.

All parsers fall back to the engine's default contract
(:func:`crawler_ray.extract.parse_page`) when the page does not
contain their listing structure, so detail pages on the same hosts
keep the byte-identical text invariant.
"""

from __future__ import annotations

from html.parser import HTMLParser

from crawler_ray.extract import ParsedPage, parse_page
from crawler_ray.sources.registry import SourceSpec, register

__all__ = ["austria_page_parser", "italy_page_parser", "edpb_page_parser",
           "AUSTRIA_SPEC", "ITALY_SPEC", "EDPB_SPEC",
           "register_reference_specs"]


def _classes(attrs) -> list[str]:
    for k, v in attrs:
        if k == "class" and v:
            return v.split()
    return []


def _attr(attrs, name: str) -> str | None:
    for k, v in attrs:
        if k == name:
            return v
    return None


class _AustriaListing(HTMLParser):
    """``bocListTable`` row scanner (austria:84-113 semantics)."""

    RESULT_CELL, DATE_CELL, DOCLINKS_CELL = 2, 4, 8

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.results: list[tuple[str, str, str]] = []
        self.next_href: str | None = None
        self._in_table = self._in_row = False
        self._cell = -1                       # bocListDataCell index in row
        self._in_cell = False
        self._row_title: str | None = None
        self._row_date: list[str] = []
        self._row_href: str | None = None
        self._in_pages = False
        self._pages_li = -1
        self._capture_date = False

    def handle_starttag(self, tag, attrs):
        cls = _classes(attrs)
        if tag == "table" and "bocListTable" in cls:
            self._in_table = True
        elif tag == "tr" and self._in_table and "bocListDataRow" in cls:
            self._in_row, self._cell = True, -1
            self._row_title, self._row_date, self._row_href = None, [], None
        elif tag == "td" and self._in_row and "bocListDataCell" in cls:
            self._cell += 1
            self._in_cell = True
            self._capture_date = self._cell == self.DATE_CELL
        elif tag == "a" and self._in_cell:
            if self._cell == self.RESULT_CELL and self._row_title is None:
                self._row_title = _attr(attrs, "title") or ""
            elif self._cell == self.DOCLINKS_CELL and self._row_href is None:
                href = _attr(attrs, "href")
                if href and href.endswith(".pdf"):      # austria:104-108
                    self._row_href = href
        elif tag == "ul" and "Pages" in cls:
            self._in_pages, self._pages_li = True, -1
        elif tag == "li" and self._in_pages:
            self._pages_li += 1
        elif tag == "a" and self._in_pages and self._pages_li == 1:
            href = _attr(attrs, "href")                 # austria:43-52
            if href and self.next_href is None:
                self.next_href = href

    def handle_endtag(self, tag):
        if tag == "td":
            self._in_cell = self._capture_date = False
        elif tag == "tr" and self._in_row:
            if self._row_title and self._row_href:
                date = " ".join("".join(self._row_date).split())
                self.results.append((self._row_title, date, self._row_href))
            self._in_row = False
        elif tag == "table":
            self._in_table = False
        elif tag == "ul":
            self._in_pages = False

    def handle_data(self, data):
        if self._capture_date:
            self._row_date.append(data)


def austria_page_parser(html: bytes | None) -> ParsedPage:
    """RIS decision-listing parser; non-listing payloads take the
    default contract path (detail text stays byte-identical)."""
    if html and b"bocListTable" in html:
        p = _AustriaListing()
        p.feed(html.decode("utf-8", errors="replace"))
        if p.results or p.next_href:
            return ParsedPage(kind="listing", results=p.results,
                              next_href=p.next_href)
    return parse_page(html)


class _ItalyListing(HTMLParser):
    """``div.testo`` doc links + bootstrap pagination scanner."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.results: list[tuple[str, str, str]] = []
        self.page_hrefs: list[str] = []
        self._depth = 0
        self._testo_depth: int | None = None
        self._ul_depth: int | None = None     # top-level ul inside testo
        self._li_href: str | None = None
        self._li_text: list[str] | None = None
        self._in_pagination = False
        self._in_page_item = False

    def handle_starttag(self, tag, attrs):
        self._depth += 1
        cls = _classes(attrs)
        if tag == "div" and "testo" in cls and self._testo_depth is None:
            self._testo_depth = self._depth
        elif tag == "ul":
            if {"pagination", "justify-content-center",
                    "mt-3"} <= set(cls):                 # italy:75-78
                self._in_pagination = True
            elif (self._testo_depth is not None
                    and self._depth == self._testo_depth + 1
                    and self._ul_depth is None):         # recursive=False
                self._ul_depth = self._depth
        elif tag == "li":
            if self._in_pagination and "page-item" in cls:
                self._in_page_item = True
            elif self._ul_depth is not None:
                self._li_href, self._li_text = None, []
        elif tag == "a":
            href = _attr(attrs, "href")
            if self._in_page_item and href is not None:
                self.page_hrefs.append(href)
            elif self._li_text is not None and self._li_href is None:
                self._li_href = href

    def handle_endtag(self, tag):
        if tag == "li":
            if self._li_text is not None:
                title = " ".join("".join(self._li_text).split())
                if title and self._li_href:              # italy:130-141
                    self.results.append((title, "", self._li_href))
                self._li_href, self._li_text = None, None
            self._in_page_item = False
        elif tag == "ul":
            if self._in_pagination:
                self._in_pagination = False
            elif self._ul_depth == self._depth:
                self._ul_depth = None
        elif tag == "div" and self._testo_depth == self._depth:
            self._testo_depth = None
        self._depth -= 1

    def handle_data(self, data):
        if self._li_text is not None:
            self._li_text.append(data)


def italy_page_parser(html: bytes | None) -> ParsedPage:
    """Garante listing parser with **backwards** page enumeration:
    the interior ``page-item`` hrefs (prev/next arrows at the ends are
    dropped, matching ``li_page_list[-2]`` = the last numbered page,
    italy:85-89) are emitted in reverse order as out-links, so the
    dom_idx-ordered frontier walks last page → first page exactly like
    ``update_pagination_backwards`` (italy:86-91)."""
    if html and (b"testo" in html or b"pagination" in html):
        p = _ItalyListing()
        p.feed(html.decode("utf-8", errors="replace"))
        pages = p.page_hrefs[1:-1] if len(p.page_hrefs) >= 3 else []
        if p.results or pages:
            return ParsedPage(kind="listing", results=p.results,
                              out_links=list(reversed(pages)))
    return parse_page(html)


class _EdpbListing(HTMLParser):
    """EDPB guideline-listing scanner (edpb:217-260 semantics):
    ``div.view-content`` → ``div.views-row`` rows, each with a
    ``span.news-date`` date and an ``h4.node__title > a`` doc link
    whose inner ``span`` is the title."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.results: list[tuple[str, str, str]] = []
        self._depth = 0
        self._in_content = False
        self._row_depth: int | None = None
        self._row_date: list[str] | None = None
        self._row_href: str | None = None
        self._row_title: list[str] | None = None
        self._capture: list[str] | None = None
        self._in_title_h4 = False
        self._in_title_a = False

    def handle_starttag(self, tag, attrs):
        self._depth += 1
        cls = _classes(attrs)
        if tag == "div" and "view-content" in cls:
            self._in_content = True
        elif tag == "div" and self._in_content and "views-row" in cls:
            self._row_depth = self._depth
            self._row_date, self._row_href, self._row_title = [], None, []
        elif self._row_depth is not None:
            if tag == "span" and "news-date" in cls:
                self._capture = self._row_date       # edpb:236-240
            elif tag == "h4" and "node__title" in cls:
                self._in_title_h4 = True
            elif tag == "a" and self._in_title_h4 and self._row_href is None:
                self._row_href = _attr(attrs, "href")  # edpb:248-252
                self._in_title_a = True
            elif tag == "span" and self._in_title_a:
                self._capture = self._row_title      # edpb:262-266

    def handle_endtag(self, tag):
        if tag in ("span",):
            self._capture = None
        elif tag == "a":
            self._in_title_a = False
        elif tag == "h4":
            self._in_title_h4 = False
        elif tag == "div":
            if self._row_depth == self._depth:
                title = " ".join("".join(self._row_title or []).split())
                date = " ".join("".join(self._row_date or []).split())
                if title and self._row_href:
                    self.results.append((title, date, self._row_href))
                self._row_depth = None
        self._depth -= 1

    def handle_data(self, data):
        if self._capture is not None:
            self._capture.append(data)


def edpb_page_parser(html: bytes | None) -> ParsedPage:
    """EDPB listing parser; the date-string rides into the engine's
    standard window filter (the reference hand-checks ``year < 2018``
    in-loop, edpb:241-243 — the engine's GDPR window subsumes it)."""
    if html and b"views-row" in html:
        p = _EdpbListing()
        p.feed(html.decode("utf-8", errors="replace"))
        if p.results:
            return ParsedPage(kind="listing", results=p.results)
    return parse_page(html)


AUSTRIA_SPEC = SourceSpec(
    source_id="austria-ris",
    hosts=("www.ris.bka.gv.at", "ris.bka.gv.at"),
    seed_urls=("https://www.ris.bka.gv.at/Ergebnis.wxe?Abfrage=Dsk",),
    doc_types=("Decisions",),
    pagination="forward",
    page_parser=austria_page_parser,
)

ITALY_SPEC = SourceSpec(
    source_id="italy-garante",
    hosts=("www.garanteprivacy.it", "garanteprivacy.it"),
    seed_urls=(
        "https://www.garanteprivacy.it/home/stampa-comunicazione/interviste",),
    doc_types=("Interviews", "Publications", "Injunctions"),
    pagination="backward",
    page_parser=italy_page_parser,
)


EDPB_SPEC = SourceSpec(
    source_id="edpb",
    hosts=("edpb.europa.eu", "www.edpb.europa.eu"),
    seed_urls=("https://edpb.europa.eu/our-work-tools/general-guidance/"
               "guidelines-recommendations-best-practices_en",),
    doc_types=("Guidelines", "Recommendations", "Best Practices"),
    pagination="forward",
    page_parser=edpb_page_parser,
)


def register_reference_specs() -> list[SourceSpec]:
    """Register the reference-parity specs (call before building the
    pipeline, or pass the returned specs via an explicit registry)."""
    return [register(AUSTRIA_SPEC), register(ITALY_SPEC),
            register(EDPB_SPEC)]
