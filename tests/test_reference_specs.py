"""Reference-structure SourceSpecs driven through the real engine:
the austria RIS bocListTable listing (austria:79-113) and the italy
Garante backwards pager (italy:63-96) as registry plugins over fixture
pages mimicking those DOMs."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _pages_table(rows):
    return pa.table({
        "url": pa.array([u for u, _ in rows], pa.string()),
        "html": pa.array([h for _, h in rows], pa.binary()),
        "lang": pa.array(["de"] * len(rows), pa.string()),
        "warc_ts": pa.array([0] * len(rows), pa.timestamp("us")),
    })


def _write(tmp, name, table):
    p = str(tmp / name)
    pq.write_table(table, p)
    return p


def _seeds(tmp, urls):
    return _write(tmp, "seeds.parquet", pa.table({
        "url": pa.array(urls, pa.string()),
        "seed_rank": pa.array(range(len(urls)), pa.int32()),
    }))


def _robots(tmp, hosts):
    return _write(tmp, "robots.parquet", pa.table({
        "host": pa.array(hosts, pa.string()),
        "disallow_prefixes": pa.array([[] for _ in hosts],
                                      pa.list_(pa.string())),
        "crawl_delay_ms": pa.array([0] * len(hosts), pa.int64()),
    }))


AT = "https://www.ris.bka.gv.at"


def _boc_row(title, date, links):
    cells = [f'<td class="bocListDataCell">c{i}</td>' for i in range(9)]
    cells[2] = (f'<td class="bocListDataCell">'
                f'<a title="{title}" href="#r">{title}</a></td>')
    cells[4] = f'<td class="bocListDataCell">{date}</td>'
    cells[8] = ('<td class="bocListDataCell">'
                + "".join(f'<a href="{h}">doc</a>' for h in links) + "</td>")
    return '<tr class="bocListDataRow">' + "".join(cells) + "</tr>"


def _boc_page(rows, next_href=None):
    pages = ""
    if next_href:
        pages = ('<ul class="Pages"><li>pos</li>'
                 f'<li><a href="{next_href}">&gt;</a></li></ul>')
    return (
        '<html><body><table class="bocListTable">'
        '<tbody class="bocListTableBody">' + "".join(rows)
        + "</tbody></table>" + pages + "</body></html>").encode()


def test_austria_listing_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the RIS structure: pdf doc links from cell
    8 (decoys skipped), dd.mm.yyyy dates window-filtered at the
    listing (pre-GDPR row never fetched), ul.Pages forward pager."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             run_crawl)
    from crawler_ray.sources.specs import AUSTRIA_SPEC

    p1 = _boc_page([
        _boc_row("Bescheid A", "15.03.2021",
                 ["/Dokumente/decoy.html", "/Dokumente/docA.pdf"]),
        _boc_row("Bescheid B", "01.01.2017", ["/Dokumente/docB.pdf"]),
        _boc_row("Bescheid C", "10.06.2020", ["/Dokumente/docC.pdf"]),
    ], next_href="/list?p=2")
    p2 = _boc_page([
        _boc_row("Bescheid D", "05.05.2019", ["/Dokumente/docD.pdf"]),
    ], next_href="/list?p=1")                    # back-link: seen-dedup kills it
    pdf = b"%PDF-1.4 stub"
    pages = _pages_table([
        (f"{AT}/list?p=1", p1), (f"{AT}/list?p=2", p2),
        (f"{AT}/Dokumente/docA.pdf", pdf), (f"{AT}/Dokumente/docB.pdf", pdf),
        (f"{AT}/Dokumente/docC.pdf", pdf), (f"{AT}/Dokumente/docD.pdf", pdf),
        (f"{AT}/Dokumente/decoy.html", b"<html><body>x</body></html>"),
    ])
    out = str(tmp_path / "out")
    summary = run_crawl(
        _write(tmp_path, "pages.parquet", pages), _seeds(tmp_path, [f"{AT}/list?p=1"]),
        _robots(tmp_path, ["www.ris.bka.gv.at"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: AUSTRIA_SPEC for h in AUSTRIA_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert fetched == {
        f"{AT}/list?p=1", f"{AT}/list?p=2", f"{AT}/Dokumente/docA.pdf",
        f"{AT}/Dokumente/docC.pdf", f"{AT}/Dokumente/docD.pdf",
    }  # no docB (pre-GDPR date filtered at the listing), no decoy (non-pdf)
    assert summary["urls_fetched"] == 5
    assert (log.set_index("url").loc[f"{AT}/Dokumente/docA.pdf", "kind"]
            == "binary")


IT = "https://www.garanteprivacy.it"


def _garante_listing(doc_items, page_hrefs=None):
    uls = "".join(
        "<ul>" + "".join(
            f'<li><a href="{h}">{t}</a></li>' for t, h in group)
        + "</ul>"
        for group in doc_items)
    pag = ""
    if page_hrefs:
        items = (['<li class="page-item"><a href="#prev">&laquo;</a></li>']
                 + [f'<li class="page-item"><a href="{h}">{i + 1}</a></li>'
                    for i, h in enumerate(page_hrefs)]
                 + ['<li class="page-item"><a href="#next">&raquo;</a></li>'])
        pag = ('<ul class="pagination justify-content-center mt-3">'
               + "".join(items) + "</ul>")
    return (f'<html><body><div class="testo">{uls}</div>{pag}'
            "</body></html>").encode()


def _garante_doc(title):
    return (f'<div class="content"><h1>{title}</h1>'
            f"<p>Released 2021-03-15</p><p>testo del documento</p>"
            "</div>").encode()


def test_italy_backwards_pager_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the Garante structure: the pagination nav
    is enumerated LAST page first (update_pagination_backwards), doc
    links come from div.testo top-level uls, detail pages emit docs
    via the default contract."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             finalize_docs, run_crawl)
    from crawler_ray.sources.specs import ITALY_SPEC

    base = _garante_listing(
        [[("Intervista Uno", "/docs/d1")]],
        page_hrefs=["/interviste?p=1", "/interviste?p=2", "/interviste?p=3"])
    p1 = _garante_listing([[("Intervista Uno", "/docs/d1")]])
    p2 = _garante_listing([[("Intervista Due", "/docs/d2")]])
    p3 = _garante_listing([[("Intervista Tre", "/docs/d3"),
                            ("Intervista Quattro", "/docs/d4")]])
    pages = _pages_table([
        (f"{IT}/interviste", base),
        (f"{IT}/interviste?p=1", p1), (f"{IT}/interviste?p=2", p2),
        (f"{IT}/interviste?p=3", p3),
        (f"{IT}/docs/d1", _garante_doc("Intervista Uno")),
        (f"{IT}/docs/d2", _garante_doc("Intervista Due")),
        (f"{IT}/docs/d3", _garante_doc("Intervista Tre")),
        (f"{IT}/docs/d4", _garante_doc("Intervista Quattro")),
    ])
    out = str(tmp_path / "out")
    run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{IT}/interviste"]),
        _robots(tmp_path, ["www.garanteprivacy.it"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: ITALY_SPEC for h in ITALY_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas().set_index("url")
    ranks = log["pop_rank"]
    # backwards enumeration: page 3 fetched before 2 before 1
    assert ranks[f"{IT}/interviste?p=3"] < ranks[f"{IT}/interviste?p=2"] \
        < ranks[f"{IT}/interviste?p=1"]
    # the seed's doc link outranks the pager (results before out_links)
    assert ranks[f"{IT}/docs/d1"] < ranks[f"{IT}/interviste?p=3"]
    docs = finalize_docs(out).to_pandas()
    assert set(docs["title"]) == {"Intervista Uno", "Intervista Due",
                                  "Intervista Tre", "Intervista Quattro"}
    # detail text via the default contract (byte-stable invariant)
    assert docs.set_index("title").loc["Intervista Due", "text"] \
        == "Intervista Due\nReleased 2021-03-15\ntesto del documento"


EB = "https://edpb.europa.eu"


def _edpb_listing(rows):
    divs = "".join(
        '<div class="views-row">'
        f'<span class="news-date">{date}</span>'
        f'<h4 class="node__title"><a href="{href}"><span>{title}</span></a>'
        "</h4></div>"
        for title, date, href in rows)
    return (f'<html><body><div class="view-content">'
            f'<div class="view-row-content">{divs}</div></div>'
            "</body></html>").encode()


def test_edpb_listing_through_engine(ray_session, tmp_path):
    """Drupal view rows through the real engine: dated rows window-
    filtered (the reference's year<2018 in-loop skip, subsumed by the
    engine's GDPR window), doc pages fetched and emitted as docs."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             finalize_docs, run_crawl)
    from crawler_ray.sources.specs import EDPB_SPEC

    listing = _edpb_listing([
        ("Guidelines 01/2021", "2021-03-15", "/g1"),
        ("Old Guidance", "2016-01-01", "/g-old"),      # pre-GDPR: skipped
        ("Recommendations 02/2020", "2020-06-10", "/g2"),
    ])
    doc = (b'<div class="content"><h1>Guidelines 01/2021</h1>'
           b"<p>Released 2021-03-15</p><p>body</p></div>")
    doc2 = (b'<div class="content"><h1>Recommendations 02/2020</h1>'
            b"<p>Released 2020-06-10</p><p>body</p></div>")
    pages = _pages_table([
        (f"{EB}/list", listing), (f"{EB}/g1", doc), (f"{EB}/g2", doc2),
        (f"{EB}/g-old", doc),
    ])
    out = str(tmp_path / "out")
    run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{EB}/list"]),
        _robots(tmp_path, ["edpb.europa.eu"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: EDPB_SPEC for h in EDPB_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    assert set(log["url"]) == {f"{EB}/list", f"{EB}/g1", f"{EB}/g2"}
    docs = finalize_docs(out).to_pandas()
    assert set(docs["title"]) == {"Guidelines 01/2021",
                                  "Recommendations 02/2020"}


def test_parsers_standalone():
    """Unit: DOM → ParsedPage without the engine."""
    from crawler_ray.sources.specs import austria_page_parser, italy_page_parser
    ap = austria_page_parser(_boc_page(
        [_boc_row("T1", "15.03.2021", ["/a.pdf"])], next_href="/p2"))
    assert ap.kind == "listing"
    assert ap.results == [("T1", "15.03.2021", "/a.pdf")]
    assert ap.next_href == "/p2"
    ip = italy_page_parser(_garante_listing(
        [[("D1", "/d1")], [("D2", "/d2")]], page_hrefs=["/p1", "/p2"]))
    assert ip.results == [("D1", "", "/d1"), ("D2", "", "/d2")]
    assert ip.out_links == ["/p2", "/p1"]
    # non-listing payloads take the default contract path
    det = austria_page_parser(b'<div class="content"><p>hi</p></div>')
    assert det.kind == "detail" and det.text == "hi"


# --------------------------------------------------------------------------
# Denmark: Selenium-per-document source → warm render pool + composite key
# --------------------------------------------------------------------------

DK = "https://www.datatilsynet.dk"


def _dk_item(title, date, href):
    return ('<div class="item">'
            f'<h2><a href="{href}">{title}</a></h2>'
            f"<span>Dato: {date}</span></div>")


def _dk_listing(items, page_hrefs=()):
    pag = ""
    if page_hrefs:
        pag = ('<ul class="pagination">'
               + "".join(f'<li><a href="{h}">p</a></li>'
                         for h in page_hrefs) + "</ul>")
    ajax = ('<div class="ajaxhost"><div class="items">'
            + "".join(items) + "</div></div>" + pag)
    # the RAW fetch carries the post-JS DOM only inside the fixture
    # ajax script — parseable ONLY after the render pool splices it
    return ('<html><body><div id="shell">loading…</div>'
            f'<script type="application/x-fixture-ajax">{ajax}</script>'
            "</body></html>").encode()


def _dk_doc(title, date_iso):
    return (f'<div class="content"><h1>{title}</h1>'
            f"<p>Released {date_iso}</p><p>afgørelsens tekst</p>"
            "</div>").encode()


def _dk_fixture(tmp_path):
    p1 = _dk_listing([
        _dk_item("Afgørelse Alpha", "15-03-2021", "/docs/alpha"),
        _dk_item("Gammel Sag", "01-01-2017", "/docs/old"),   # pre-GDPR
        _dk_item("Afgørelse Dup", "15-03-2021", "/docs/dup-a"),
    ], page_hrefs=["/afgoerelser?p=1", "/afgoerelser?p=2"])
    p2 = _dk_listing([
        _dk_item("Afgørelse Dup", "10-06-2020", "/docs/dup-b"),
        _dk_item("Afgørelse Dup", "15-03-2021", "/docs/dup-c"),
    ])
    pages = _pages_table([
        (f"{DK}/afgoerelser", p1), (f"{DK}/afgoerelser?p=2", p2),
        (f"{DK}/docs/alpha", _dk_doc("Afgørelse Alpha", "2021-03-15")),
        (f"{DK}/docs/old", _dk_doc("Gammel Sag", "2017-01-01")),
        (f"{DK}/docs/dup-a", _dk_doc("Afgørelse Dup", "2021-03-15")),
        (f"{DK}/docs/dup-b", _dk_doc("Afgørelse Dup", "2020-06-10")),
        (f"{DK}/docs/dup-c", _dk_doc("Afgørelse Dup", "2021-03-15")),
    ])
    return (_write(tmp_path, "pages.parquet", pages),
            _seeds(tmp_path, [f"{DK}/afgoerelser"]),
            _robots(tmp_path, ["www.datatilsynet.dk"]))


def test_denmark_render_pool_and_composite_key(ray_session, tmp_path):
    """Real-engine crawl of the Datatilsynet structure: the AJAX
    listing is only parseable through the warm render-actor pool
    (S3/ST3 vs denmark:104-118's Chrome-per-document), pre-GDPR rows
    are window-filtered at the listing, and the composite-key rule
    (denmark:135-140) keeps same-title/DIFFERENT-date docs distinct
    while collapsing the same-title/same-date true duplicate."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             finalize_docs, run_crawl)
    from crawler_ray.sources.specs import DENMARK_SPEC

    pages, seeds, robots = _dk_fixture(tmp_path)
    out = str(tmp_path / "out")
    run_crawl(pages, seeds, robots, out,
              CrawlConfig(n_frontier_shards=2, n_seen_shards=2,
                          n_page_shards=2, render_pool=2,
                          registry={h: DENMARK_SPEC
                                    for h in DENMARK_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert f"{DK}/afgoerelser?p=2" in fetched          # pager followed
    assert f"{DK}/docs/old" not in fetched             # date-filtered
    assert {f"{DK}/docs/alpha", f"{DK}/docs/dup-a",
            f"{DK}/docs/dup-b", f"{DK}/docs/dup-c"} <= fetched
    docs = finalize_docs(out).to_pandas()
    dup = docs[docs["title"] == "Afgørelse Dup"]
    # same md5(title) for all three, but dup-a/dup-c (same date)
    # collapse while dup-b (different date) stays: 2 rows, 1 hash
    assert len(dup) == 2 and dup["doc_hash"].nunique() == 1
    assert sorted(dup["doc_key"].str.split("-", n=1).str[1]) \
        == ["2020-06-10", "2021-03-15"]
    assert set(docs["title"]) == {"Afgørelse Alpha", "Afgørelse Dup"}


def test_denmark_unrendered_is_blind(ray_session, tmp_path):
    """render_pool=0 ⇒ the raw (script-only) DOM reaches the parser
    and no listing/docs are discovered — rendering is load-bearing,
    exactly like the reference's webdriver dependence."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, finalize_docs,
                                             run_crawl)
    from crawler_ray.sources.specs import DENMARK_SPEC

    pages, seeds, robots = _dk_fixture(tmp_path)
    out = str(tmp_path / "out0")
    s = run_crawl(pages, seeds, robots, out,
                  CrawlConfig(n_frontier_shards=2, n_seen_shards=2,
                              n_page_shards=2, render_pool=0,
                              registry={h: DENMARK_SPEC
                                        for h in DENMARK_SPEC.hosts}))
    assert s["urls_fetched"] == 1                      # just the seed
    assert len(finalize_docs(out).to_pandas()) == 0


# --------------------------------------------------------------------------
# France: authenticated API documents via TokenBroker + BearerFetchStage
# --------------------------------------------------------------------------

FR = "https://www.cnil.fr"

_FR_MS = {"2021-03-15": 1615766400000, "2020-06-10": 1591747200000}

_FR_PAYLOADS = {
    "CNILTEXT000001": (
        '{"text": {"titre": "Délibération SAN-2021-001",'
        f' "datePubli": {_FR_MS["2021-03-15"]},'
        ' "texteHtml": "<div class=\\"content\\"><p>Corps un</p></div>"}}'),
    "CNILTEXT000002": (
        '{"text": {"titre": "Délibération SAN-2020-002",'
        f' "datePubli": {_FR_MS["2020-06-10"]},'
        ' "texteHtml": "<div class=\\"content\\"><p>Corps deux</p></div>"}}'),
    "CNILTEXT000003": '{"error": "not found"}',        # no text key: dropped
}


def _make_fr_api_fetch(payloads):
    """Fixture stand-in for the authenticated consult POST: REFUSES
    unauthenticated calls (the assertion IS the wiring proof).
    Returned as a CLOSURE so cloudpickle ships it by value — a
    module-level function in tests/ is unimportable in Ray workers."""
    def fetch(url, headers):
        auth = headers.get("Authorization", "")
        assert auth.startswith("Bearer token-"), \
            f"unauthenticated call: {url}"
        return payloads[url.split("=")[-1]]
    return fetch


def _fr_listing(rows):
    divs = "".join('<div class="views-row">'
                   f'<a href="{href}">{text}</a></div>'
                   for text, href in rows)
    return (f'<html><body><div class="view-content">{divs}</div>'
            "</body></html>").encode()


def test_france_bearer_fetch_through_engine(ray_session, tmp_path):
    """End-to-end France shape: the crawl discovers consult-API URLs
    from the Drupal listing (plain GET), then fetch_api_documents
    pulls them through a BearerFetchStage ACTOR POOL — every fetch
    carries a broker-issued bearer token, the broker mints exactly
    ONCE for the whole pool (ST5), payloads without a text key are
    dropped (france:114-115), and the JSON parses into the engine's
    document contract with the composite key."""
    import ray as _ray

    from crawler_ray.pipelines.apidocs import fetch_api_documents
    from crawler_ray.pipelines.crawl import (CrawlConfig, parsed_dataset,
                                             run_crawl)
    from crawler_ray.sources.specs import FRANCE_API, FRANCE_SPEC
    from crawler_ray.sources.tokens import make_token_broker

    listing = _fr_listing([
        ("Délibération SAN-2021-001", "/fr/cnil?text=CNILTEXT000001"),
        ("Délibération SAN-2020-002", "/fr/cnil?text=CNILTEXT000002"),
        ("Délibération retirée", "/fr/cnil?text=CNILTEXT000003"),
    ])
    pages = _pages_table([(f"{FR}/fr/deliberations", listing)])
    out = str(tmp_path / "out")
    run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{FR}/fr/deliberations"]),
        _robots(tmp_path, ["www.cnil.fr", "sandbox-api.piste.gouv.fr"]),
        out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: FRANCE_SPEC for h in FRANCE_SPEC.hosts}))
    # the listing rewrote every views-row to a consult-API URL
    parsed = parsed_dataset(out).to_pandas()
    api_urls = sorted(u for u in parsed["url"]
                      if u.startswith(FRANCE_API))
    assert [u.split("=")[-1] for u in api_urls] == [
        "CNILTEXT000001", "CNILTEXT000002", "CNILTEXT000003"]

    broker = make_token_broker()
    urls_ds = _ray.data.from_arrow(
        pa.table({"url": pa.array(api_urls, pa.string())}))
    docs = fetch_api_documents(urls_ds, FRANCE_SPEC, broker,
                               fetch_fn=_make_fr_api_fetch(_FR_PAYLOADS),
                               concurrency=3, batch_size=1).to_pandas()
    assert set(docs["title"]) == {"Délibération SAN-2021-001",
                                  "Délibération SAN-2020-002"}
    d = docs.set_index("title")
    assert str(d.loc["Délibération SAN-2021-001", "release_date"]) \
        == "2021-03-15"
    assert d.loc["Délibération SAN-2020-002", "text"] == "Corps deux"
    assert d["doc_key"].str.split("-", n=1).str[1].tolist() \
        == d.index.to_series().map({
            "Délibération SAN-2021-001": "2021-03-15",
            "Délibération SAN-2020-002": "2020-06-10"}).tolist()
    assert _ray.get(broker.stats.remote())["mints"] == 1   # single mint


# --------------------------------------------------------------------------
# Belgium: PDF documents straight from the listing + French dates
# --------------------------------------------------------------------------

BE = "https://www.autoriteprotectiondonnees.be"


def _be_media(title, href):
    return ('<div class="media"><h3 class="media-title">'
            f'<a href="{href}">{title}</a></h3>'
            '<span class="media-date">x</span></div>')


def _be_listing(rows, page_hrefs=()):
    pag = ""
    if page_hrefs:
        pag = ('<ul class="pagination">'
               + "".join(f'<li class="page-item"><a href="{h}">p</a></li>'
                         for h in page_hrefs) + "</ul>")
    return ('<html><body><div id="search-result">'
            + "".join(rows) + "</div>" + pag + "</body></html>").encode()


def _be_html_doc(title, fr_date, body="corps de la decision"):
    return (f'<html><body><div class="date">Publié le {fr_date}</div>'
            f'<div class="page-body"><h1>{title}</h1><p>{body}</p></div>'
            "</body></html>").encode()


def _be_pdf_doc(title, body):
    stream = f"BT ({title}) Tj ({body}) Tj ET".encode("ascii")
    return (b"%PDF-1.4\n1 0 obj\n<< /Length 99 >>\nstream\n" + stream
            + b"\nendstream\nendobj\n%%EOF")


def test_belgium_parsers_standalone():
    from crawler_ray.sources.specs import belgium_page_parser, french_date_iso

    assert french_date_iso("6 mai 2021") == "2021-05-06"
    assert french_date_iso("1er juillet 2020") == "2020-07-01"
    assert french_date_iso("pas une date") is None

    pdf = _be_pdf_doc("Decision quant au fond 63/2021 du 6 mai 2021",
                      "texte de la decision")
    det = belgium_page_parser(pdf)
    lines = det.text.split("\n")
    assert det.kind == "detail"
    assert lines[0].endswith("du 6 mai 2021")
    assert lines[1] == "Released 2021-05-06"          # belgium:158-166
    assert "texte de la decision" in det.text

    listing = belgium_page_parser(_be_listing(
        [_be_media("Decision 15/2021", "/publications/d15")],
        page_hrefs=["/chercher?page=2"]))
    assert listing.kind == "listing"
    assert listing.results == [("Decision 15/2021", "", "/publications/d15")]
    assert listing.out_links == ["/chercher?page=2"]

    # annual-report collapse shape (belgium:593-600)
    annual = belgium_page_parser(
        (b'<html><body><section id="page-content"><div class="page-body">'
         b'<div class="collapse"><a href="/publications/rapport-2020">'
         b'Rapport annuel 2020</a></div></div></section></body></html>'))
    assert annual.kind == "listing"
    assert annual.results == [
        ("Rapport annuel 2020", "", "/publications/rapport-2020")]


def test_belgium_pdf_docs_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the APD structure: pagination pages all
    enqueue (forward), PDF decisions extract INSIDE the crawl parse
    via pdf_to_text_min with the date recovered from the French
    ``' du '`` title clause, HTML decisions read ``div.date``, and
    the pre-GDPR decision is window-filtered at the detail."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             finalize_docs, run_crawl)
    from crawler_ray.sources.specs import BELGIUM_SPEC

    p1 = _be_listing(
        [_be_media("Decision 15/2021", "/publications/d15"),
         _be_media("Decision 63/2021 (PDF)", "/publications/d63.pdf"),
         _be_media("Vieille decision", "/publications/old")],
        page_hrefs=["/citoyen/chercher?l=25", "/citoyen/chercher?page=2"])
    p2 = _be_listing([_be_media("Avis 22/2020", "/publications/a22")])
    pages = _pages_table([
        (f"{BE}/citoyen/chercher?l=25", p1),
        (f"{BE}/citoyen/chercher?page=2", p2),
        (f"{BE}/publications/d15",
         _be_html_doc("Decision 15/2021", "15 mars 2021")),
        (f"{BE}/publications/d63.pdf",
         _be_pdf_doc("Decision quant au fond 63/2021 du 6 mai 2021",
                     "texte de la decision")),
        (f"{BE}/publications/old",
         _be_html_doc("Vieille decision", "10 janvier 2017")),
        (f"{BE}/publications/a22",
         _be_html_doc("Avis 22/2020", "9 juin 2020")),
    ])
    out = str(tmp_path / "out")
    run_crawl(_write(tmp_path, "pages.parquet", pages),
              _seeds(tmp_path, [f"{BE}/citoyen/chercher?l=25"]),
              _robots(tmp_path, ["www.autoriteprotectiondonnees.be"]),
              out,
              CrawlConfig(n_frontier_shards=2, n_seen_shards=2,
                          n_page_shards=2,
                          registry={h: BELGIUM_SPEC
                                    for h in BELGIUM_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert f"{BE}/citoyen/chercher?page=2" in fetched   # pagination walked
    assert f"{BE}/publications/old" in fetched          # fetched, then
    docs = finalize_docs(out).to_pandas()               # ...date-filtered
    assert set(docs["title"]) == {
        "Decision 15/2021",
        "Decision quant au fond 63/2021 du 6 mai 2021",
        "Avis 22/2020"}
    d = docs.set_index("title")
    assert str(d.loc["Decision quant au fond 63/2021 du 6 mai 2021",
                     "release_date"]) == "2021-05-06"
    assert str(d.loc["Decision 15/2021", "release_date"]) == "2021-03-15"


# --------------------------------------------------------------------------
# Finland: year-bucketed single-page archive + attachment PDFs
# --------------------------------------------------------------------------

FI = "https://tietosuoja.fi"


def _fi_item(title, date, href):
    return ('<li class="list__item">'
            f'<span class="date">{date}</span>'
            f'<a href="{href}">{title}</a></li>')


def _fi_archive(buckets):
    uls = "".join(
        f'<ul class="results" id="{year}">' + "".join(items) + "</ul>"
        for year, items in buckets)
    return f"<html><body>{uls}</body></html>".encode()


def _fi_doc(title, date, body="artikkelin teksti", pdfs=()):
    links = "".join(f'<p><a href="{h}">liite</a></p>' for h in pdfs)
    return (f'<html><body><div class="news-page">'
            f'<span class="date">{date}</span><h1>{title}</h1>'
            f"<p>{body}</p>{links}</div></body></html>").encode()


def test_finland_year_buckets_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the tietosuoja.fi structure: every year
    bucket lives on ONE page (no pagination), d.m.Y dates window-
    filter pre-GDPR rows at the listing, and detail articles surface
    their attachment PDFs as frontier links fetched as binary."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             finalize_docs, run_crawl)
    from crawler_ray.sources.specs import FINLAND_SPEC

    archive = _fi_archive([
        ("2021", [_fi_item("Päätös Yksi", "15.3.2021", "/en/d1")]),
        ("2020", [_fi_item("Päätös Kaksi", "2.6.2020", "/en/d2")]),
        ("2017", [_fi_item("Vanha Päätös", "1.1.2017", "/en/old")]),
    ])
    pages = _pages_table([
        (f"{FI}/en/current-issues", archive),
        (f"{FI}/en/d1", _fi_doc("Päätös Yksi", "15.3.2021",
                                pdfs=["/files/liite1.pdf"])),
        (f"{FI}/en/d2", _fi_doc("Päätös Kaksi", "2.6.2020")),
        (f"{FI}/en/old", _fi_doc("Vanha Päätös", "1.1.2017")),
        (f"{FI}/files/liite1.pdf", b"%PDF-1.4 stub"),
    ])
    out = str(tmp_path / "out")
    run_crawl(_write(tmp_path, "pages.parquet", pages),
              _seeds(tmp_path, [f"{FI}/en/current-issues"]),
              _robots(tmp_path, ["tietosuoja.fi"]), out,
              CrawlConfig(n_frontier_shards=2, n_seen_shards=2,
                          n_page_shards=2,
                          registry={h: FINLAND_SPEC
                                    for h in FINLAND_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert f"{FI}/en/old" not in fetched          # listing date filter
    assert f"{FI}/files/liite1.pdf" in fetched    # attachment followed
    assert log.set_index("url").loc[f"{FI}/files/liite1.pdf", "kind"] \
        == "binary"
    docs = finalize_docs(out).to_pandas().set_index("title")
    assert set(docs.index) == {"Päätös Yksi", "Päätös Kaksi"}
    assert str(docs.loc["Päätös Yksi", "release_date"]) == "2021-03-15"


# --------------------------------------------------------------------------
# Netherlands: div.pager numbered pagination + Dutch dates in row text
# --------------------------------------------------------------------------

NL = "https://autoriteitpersoonsgegevens.nl"


def _nl_listing(rows, pager_hrefs=()):
    lis = "".join(
        f'<li><a href="{href}">{title}</a> ({date})</li>'
        for title, date, href in rows)
    pager = ""
    if pager_hrefs:
        pager = ('<div class="pager"><ul>' + "".join(
            f'<li><a href="{h}">{i + 1}</a></li>'
            for i, h in enumerate(pager_hrefs)) + "</ul></div>")
    return (f'<html><body><div class="main-content-article">'
            f"<ul>{lis}</ul></div>{pager}</body></html>").encode()


def _nl_doc(title, nl_date, body="tekst van het besluit"):
    return (f'<html><body><div class="main-content-article">'
            f"<h1>{title}</h1><p>Gepubliceerd {nl_date}</p><p>{body}</p>"
            "</div></body></html>").encode()


def test_netherlands_pager_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the AP structure: numbered pager pages all
    enqueue, Dutch trailing dates window-filter at the listing, and
    the SAME container class parses as detail on article pages (shape
    decided by content)."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             finalize_docs, run_crawl)
    from crawler_ray.sources.specs import NETHERLANDS_SPEC

    p1 = _nl_listing(
        [("Boete Alpha", "3 oktober 2019", "/nl/b1"),
         ("Oud Besluit", "10 januari 2017", "/nl/old")],
        pager_hrefs=["/nl/publicaties/boetes-en-sancties",
                     "/nl/publicaties/boetes-en-sancties?page=2"])
    p2 = _nl_listing([("Boete Beta", "6 mei 2021", "/nl/b2")])
    pages = _pages_table([
        (f"{NL}/nl/publicaties/boetes-en-sancties", p1),
        (f"{NL}/nl/publicaties/boetes-en-sancties?page=2", p2),
        (f"{NL}/nl/b1", _nl_doc("Boete Alpha", "3 oktober 2019")),
        (f"{NL}/nl/old", _nl_doc("Oud Besluit", "10 januari 2017")),
        (f"{NL}/nl/b2", _nl_doc("Boete Beta", "6 mei 2021")),
    ])
    out = str(tmp_path / "out")
    run_crawl(_write(tmp_path, "pages.parquet", pages),
              _seeds(tmp_path,
                     [f"{NL}/nl/publicaties/boetes-en-sancties"]),
              _robots(tmp_path, ["autoriteitpersoonsgegevens.nl"]), out,
              CrawlConfig(n_frontier_shards=2, n_seen_shards=2,
                          n_page_shards=2,
                          registry={h: NETHERLANDS_SPEC
                                    for h in NETHERLANDS_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert f"{NL}/nl/publicaties/boetes-en-sancties?page=2" in fetched
    assert f"{NL}/nl/old" not in fetched          # Dutch date filtered
    docs = finalize_docs(out).to_pandas().set_index("title")
    assert set(docs.index) == {"Boete Alpha", "Boete Beta"}
    assert str(docs.loc["Boete Alpha", "release_date"]) == "2019-10-03"
    assert str(docs.loc["Boete Beta", "release_date"]) == "2021-05-06"


# --------------------------------------------------------------------------
# Spain: Drupal time[datetime] rows linking straight to PDFs
# --------------------------------------------------------------------------

ES = "https://www.aepd.es"


def _es_row(title, iso_dt, href):
    return ('<div class="views-row">'
            '<div class="views-field-title">'
            f'<a href="{href}">{title}</a></div>'
            '<div class="views-field-field-advertise-on">'
            f'<time datetime="{iso_dt}">x</time></div></div>')


def _es_listing(rows, pager_hrefs=()):
    pager = ""
    if pager_hrefs:
        pager = ('<nav class="pager"><ul class="pager__items">'
                 + "".join(f'<li class="pager__item"><a href="{h}">p</a>'
                           "</li>" for h in pager_hrefs)
                 + "</ul></nav>")
    return (f'<html><body><div class="view-content">'
            + "".join(rows) + "</div>" + pager + "</body></html>").encode()


def test_spain_pdf_listing_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the AEPD structure: time[datetime] ISO
    dates window-filter at the listing (subsuming the reference's
    sequential year<2017 sys.exit), non-PDF rows never enqueue, the
    pager__items links follow with the page-0 decoy skipped."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             run_crawl)
    from crawler_ray.sources.specs import SPAIN_SPEC

    p1 = _es_listing(
        [_es_row("Resolución PS-2021-001", "2021-03-15T09:00:00Z",
                 "/docs/ps1.pdf"),
         _es_row("Nota informativa", "2021-04-01T09:00:00Z",
                 "/docs/nota.html"),                  # non-PDF: skipped
         _es_row("Resolución antigua", "2016-05-01T09:00:00Z",
                 "/docs/old.pdf")],                   # pre-GDPR: filtered
        pager_hrefs=["?page=0", "?page=1"])
    p2 = _es_listing(
        [_es_row("Resolución PS-2020-044", "2020-06-10T09:00:00Z",
                 "/docs/ps44.pdf")])
    pdf = b"%PDF-1.4 stub"
    pages = _pages_table([
        (f"{ES}/es/resoluciones", p1),
        (f"{ES}/es/resoluciones?page=1", p2),
        (f"{ES}/docs/ps1.pdf", pdf), (f"{ES}/docs/old.pdf", pdf),
        (f"{ES}/docs/ps44.pdf", pdf),
        (f"{ES}/docs/nota.html", b"<html><body>x</body></html>"),
    ])
    out = str(tmp_path / "out")
    summary = run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{ES}/es/resoluciones"]),
        _robots(tmp_path, ["www.aepd.es"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: SPAIN_SPEC for h in SPAIN_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert fetched == {
        f"{ES}/es/resoluciones", f"{ES}/es/resoluciones?page=1",
        f"{ES}/docs/ps1.pdf", f"{ES}/docs/ps44.pdf",
    }  # no old.pdf (window), no nota.html (non-PDF), no ?page=0 decoy
    assert summary["urls_fetched"] == 4
    assert log.set_index("url").loc[f"{ES}/docs/ps1.pdf", "kind"] \
        == "binary"


def test_new_parsers_standalone():
    """Unit: the three new DOM shapes → ParsedPage without the engine."""
    from crawler_ray.sources.specs import (dutch_date_iso,
                                           finland_page_parser,
                                           netherlands_page_parser,
                                           spain_page_parser)

    assert dutch_date_iso("(3 oktober 2019)") == "2019-10-03"
    assert dutch_date_iso("Gepubliceerd 6 mei 2021.") == "2021-05-06"
    assert dutch_date_iso("geen datum hier") is None

    fi = finland_page_parser(_fi_archive(
        [("2021", [_fi_item("T1", "15.3.2021", "/d1")])]))
    assert fi.kind == "listing"
    assert fi.results == [("T1", "15.3.2021", "/d1")]
    fid = finland_page_parser(_fi_doc("T1", "15.3.2021",
                                      pdfs=["/a.pdf"]))
    assert fid.kind == "detail"
    assert fid.text.split("\n")[:2] == ["T1", "Released 2021-03-15"]
    assert fid.out_links == ["/a.pdf"]

    nl = netherlands_page_parser(_nl_listing(
        [("B1", "3 oktober 2019", "/b1")], pager_hrefs=["/p2"]))
    assert nl.kind == "listing"
    assert nl.results == [("B1", "2019-10-03", "/b1")]
    assert nl.out_links == ["/p2"]
    nld = netherlands_page_parser(_nl_doc("B1", "3 oktober 2019"))
    assert nld.kind == "detail"
    assert nld.text.split("\n")[:2] == ["B1", "Released 2019-10-03"]

    es = spain_page_parser(_es_listing(
        [_es_row("R1", "2021-03-15T09:00:00Z", "/r1.pdf"),
         _es_row("R2", "2021-03-15T09:00:00Z", "/r2.html")],
        pager_hrefs=["?page=0", "?page=1"]))
    assert es.kind == "listing"
    assert es.results == [("R1", "2021-03-15", "/r1.pdf")]
    assert es.out_links == ["?page=1"]


# --------------------------------------------------------------------------
# Ireland: ordinal English dates + pager__items with the page=0 skip
# --------------------------------------------------------------------------

IE = "https://www.dataprotection.ie"


def _ie_listing(rows, pager_hrefs=()):
    lis = "".join(
        f'<li><article><p class="date">Published: {date}</p>'
        f'<h2><a href="{href}">{title}</a></h2></article></li>'
        for title, date, href in rows)
    pager = ""
    if pager_hrefs:
        pager = ('<nav class="pager"><ul class="pager__items">' + "".join(
            f'<li class="pager__item"><a href="{h}">{i}</a></li>'
            for i, h in enumerate(pager_hrefs)) + "</ul></nav>")
    return ('<html><body><div class="view-content"><div class="item-list">'
            f"<ul>{lis}</ul></div></div>{pager}</body></html>").encode()


def _ie_doc(title, date, body="guidance body text"):
    return (f'<html><body><h1>{title}</h1><p class="date">{date}</p>'
            f'<div class="field--name-body"><p>{body}</p></div>'
            "</body></html>").encode()


def test_ireland_ordinal_dates_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the DPC structure: ordinal English dates
    ('21st May 2021') normalize to ISO and window-filter at the
    listing, the pager follows ?page=N links (page=0 skipped), and
    field--name-body details become the documents."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             finalize_docs, run_crawl)
    from crawler_ray.sources.specs import IRELAND_SPEC

    news = f"{IE}/en/news-media/latest-news"
    p1 = _ie_listing(
        [("Guidance on CCTV", "21st May 2021", "/en/a"),
         ("Old statement", "3rd January 2017", "/en/old")],
        pager_hrefs=["?page=0", "?page=1"])
    p2 = _ie_listing([("Blog on cookies", "2nd June 2020", "/en/b")])
    pages = _pages_table([
        (news, p1), (f"{news}?page=1", p2),
        (f"{IE}/en/a", _ie_doc("Guidance on CCTV", "21st May 2021")),
        (f"{IE}/en/b", _ie_doc("Blog on cookies", "2nd June 2020")),
        (f"{IE}/en/old", _ie_doc("Old statement", "3rd January 2017")),
    ])
    out = str(tmp_path / "out")
    summary = run_crawl(
        _write(tmp_path, "pages.parquet", pages), _seeds(tmp_path, [news]),
        _robots(tmp_path, ["www.dataprotection.ie"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: IRELAND_SPEC for h in IRELAND_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert fetched == {news, f"{news}?page=1", f"{IE}/en/a", f"{IE}/en/b"}
    assert summary["urls_fetched"] == 4    # no /en/old, no ?page=0 decoy
    docs = finalize_docs(out).to_pandas().set_index("title")
    assert set(docs.index) == {"Guidance on CCTV", "Blog on cookies"}
    assert str(docs.loc["Guidance on CCTV", "release_date"]) == "2021-05-21"


# --------------------------------------------------------------------------
# Greece: two-hop listing -> decision page -> span.file-link PDF
# --------------------------------------------------------------------------

GR = "https://www.dpa.gr"


def _gr_listing(rows, li_hrefs=None):
    trs = "".join(
        f'<tr><td><time datetime="00Z">{date}</time></td>'
        f'<td><a href="{href}">{title}</a></td></tr>'
        for title, date, href in rows)
    pag = ""
    if li_hrefs is not None:
        items = "".join(
            ("<li>" + (f'<a href="{h}">x</a>' if h else "&#8230;") + "</li>")
            for h in li_hrefs)
        pag = f'<ul class="pagination js-pager__items">{items}</ul>'
    return (f"<html><body><table><tbody>{trs}</tbody></table>{pag}"
            "</body></html>").encode()


def _gr_doc(title, date, pdf_href, body="Perilipsi apofasis"):
    return (f'<html><body><h1>{title}</h1>'
            f'<time datetime="00Z">{date}</time><p>{body}</p>'
            f'<span class="file-link"><a href="{pdf_href}">PDF</a></span>'
            "</body></html>").encode()


def test_greece_two_hop_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the HDPA structure: table rows with
    dd/mm/yyyy <time> dates window-filter at the listing, the
    li_list[-2] 'next' link pages forward (the last page's next
    points at itself and dies in seen-dedup), and each decision page
    emits its text as the document while surfacing the file-link PDF
    as a binary frontier fetch."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             finalize_docs, run_crawl)
    from crawler_ray.sources.specs import GREECE_SPEC

    base = f"{GR}/el/enimerwtiko/prakseisArxis"
    p1 = _gr_listing(
        [("Apofasi 26/2021", "16/06/2021", "/el/d26"),
         ("Apofasi 1/2016", "05/02/2016", "/el/dold")],
        li_hrefs=[None, "?page=1", "?page=1"])     # [prev, next, end]
    p2 = _gr_listing(
        [("Apofasi 11/2020", "03/04/2020", "/el/d11")],
        li_hrefs=[None, "?page=1", "?page=1"])     # next == itself: stop
    pages = _pages_table([
        (f"{base}?page=0", p1), (f"{base}?page=1", p2),
        (f"{GR}/el/d26", _gr_doc("Apofasi 26/2021", "16/06/2021",
                                 "/files/26_2021.pdf")),
        (f"{GR}/el/d11", _gr_doc("Apofasi 11/2020", "03/04/2020",
                                 "/files/11_2020.pdf")),
        (f"{GR}/el/dold", _gr_doc("Apofasi 1/2016", "05/02/2016",
                                  "/files/old.pdf")),
        (f"{GR}/files/26_2021.pdf", b"%PDF-1.4 stub"),
        (f"{GR}/files/11_2020.pdf", b"%PDF-1.4 stub"),
        (f"{GR}/files/old.pdf", b"%PDF-1.4 stub"),
    ])
    out = str(tmp_path / "out")
    run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{base}?page=0"]),
        _robots(tmp_path, ["www.dpa.gr"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: GREECE_SPEC for h in GREECE_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert fetched == {
        f"{base}?page=0", f"{base}?page=1",
        f"{GR}/el/d26", f"{GR}/el/d11",
        f"{GR}/files/26_2021.pdf", f"{GR}/files/11_2020.pdf",
    }  # no dold / old.pdf (window filter at the listing)
    assert log.set_index("url").loc[f"{GR}/files/26_2021.pdf", "kind"] \
        == "binary"
    docs = finalize_docs(out).to_pandas().set_index("title")
    assert set(docs.index) == {"Apofasi 26/2021", "Apofasi 11/2020"}
    assert str(docs.loc["Apofasi 26/2021", "release_date"]) == "2021-06-16"


def test_ireland_greece_parsers_standalone():
    """Unit: the two new DOM shapes -> ParsedPage without the engine."""
    from crawler_ray.sources.specs import (english_date_iso,
                                           greece_page_parser,
                                           ireland_page_parser)

    assert english_date_iso("21st May 2021") == "2021-05-21"
    assert english_date_iso("Published: 2nd June 2020") == "2020-06-02"
    assert english_date_iso("3 March 2019") == "2019-03-03"
    assert english_date_iso("no date here") is None

    ie = ireland_page_parser(_ie_listing(
        [("T1", "21st May 2021", "/en/a")],
        pager_hrefs=["?page=0", "?page=1"]))
    assert ie.kind == "listing"
    assert ie.results == [("T1", "2021-05-21", "/en/a")]
    assert ie.out_links == ["?page=1"]        # ireland:128-131 page=0 skip
    ied = ireland_page_parser(_ie_doc("T1", "21st May 2021"))
    assert ied.kind == "detail"
    assert ied.text.split("\n")[:2] == ["T1", "Released 2021-05-21"]

    gr = greece_page_parser(_gr_listing(
        [("A1", "16/06/2021", "/el/d1")],
        li_hrefs=[None, "?page=1", "?page=2"]))
    assert gr.kind == "listing"
    assert gr.results == [("A1", "16/06/2021", "/el/d1")]
    assert gr.next_href == "?page=1"          # greece:196-201 li_list[-2]
    grd = greece_page_parser(_gr_doc("A1", "16/06/2021", "/f/a1.pdf"))
    assert grd.kind == "detail"
    assert grd.text.split("\n")[:2] == ["A1", "Released 2021-06-16"]
    assert grd.out_links == ["/f/a1.pdf"]


# --------------------------------------------------------------------------
# United Kingdom: itemlink rows, "date, type" meta, hash+type+date key
# --------------------------------------------------------------------------

UK = "https://ico.org.uk"
UKS = "https://icosearch.ico.org.uk"


def _uk_item(title, meta, href=None, pdf_title=None):
    t = f' title="{pdf_title}"' if pdf_title else ""
    h = f' href="{href}"' if href else ' href="#"'
    return ('<div class="itemlink">'
            f'<a{h}{t}><h2 class="h3">{title}</h2></a>'
            f'<p class="text-small">{meta}</p></div>')


def _uk_listing(items, next_href=None):
    nav = ""
    if next_href:
        nav = ('<nav class="article-navigation">'
               f'<a class="button button-top" href="{next_href}">Next</a>'
               "</nav>")
    return ('<html><body><div class="maincolumn">'
            '<div class="resultlist">' + "".join(items)
            + "</div></div>" + nav + "</body></html>").encode()


def _uk_doc(title, meta, body="decision details", files=()):
    aside = ""
    if files:
        aside = ('<aside class="aside-further"><ul>' + "".join(
            f'<li><h3>f</h3><a href="{h}">file</a></li>' for h in files)
            + "</ul></aside>")
    return (f"<html><body><h1>{title}</h1>"
            f'<p class="text-small">{meta}</p>'
            f'<div class="article-content"><p>{body}</p></div>'
            f"{aside}</body></html>").encode()


def test_uk_composite_key_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the ICO structure: next-button pagination,
    direct-PDF Notices via the link title attribute (non-pdf skipped),
    listing window filter on the "date, type" meta, aside-further
    files followed, and the hash+noticeType+date composite key keeping
    two same-title/same-date notices of DIFFERENT types as two docs
    (uk:386-390)."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             finalize_docs, run_crawl)
    from crawler_ray.sources.specs import UK_SPEC

    notices = _uk_listing([
        _uk_item("Acme fine", "12 June 2021, Monetary penalties",
                 href="/d/ignored", pdf_title=f"{UK}/files/n1.pdf"),
        _uk_item("Beta note", "1 June 2021, Monetary penalties",
                 href="/d/beta", pdf_title=f"{UK}/pages/beta.html"),
    ])  # beta: non-pdf title attr -> row skipped entirely (uk:135-137)
    enf1 = _uk_listing([
        _uk_item("Enforcement: ACME Ltd", "9 March 2021, "
                 "Enforcement notices", href="/enf/e1/"),
        _uk_item("Old case", "1 April 2017, Enforcement notices",
                 href="/enf/old/"),
    ], next_href="/action-weve-taken/enforcement/?page=2")
    enf2 = _uk_listing([
        _uk_item("Enforcement: ACME Ltd", "9 March 2021, "
                 "Monetary penalties", href="/enf/e2/"),
    ])
    pages = _pages_table([
        (f"{UKS}/s/search.html?query=GDPR", notices),
        (f"{UK}/action-weve-taken/enforcement/", enf1),
        (f"{UK}/action-weve-taken/enforcement/?page=2", enf2),
        (f"{UK}/enf/e1/", _uk_doc("Enforcement: ACME Ltd",
                                  "9 March 2021, Enforcement notices",
                                  files=["/files/e1.pdf"])),
        (f"{UK}/enf/e2/", _uk_doc("Enforcement: ACME Ltd",
                                  "9 March 2021, Monetary penalties")),
        (f"{UK}/files/n1.pdf", b"%PDF-1.4 stub"),
        (f"{UK}/files/e1.pdf", b"%PDF-1.4 stub"),
    ])
    out = str(tmp_path / "out")
    run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{UKS}/s/search.html?query=GDPR",
                          f"{UK}/action-weve-taken/enforcement/"]),
        _robots(tmp_path, ["ico.org.uk", "icosearch.ico.org.uk"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: UK_SPEC for h in UK_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert f"{UK}/action-weve-taken/enforcement?page=2" in fetched
    assert f"{UK}/files/n1.pdf" in fetched        # notice PDF (title attr)
    assert f"{UK}/files/e1.pdf" in fetched        # aside-further file
    assert f"{UK}/enf/old" not in fetched        # 2017: window-filtered
    assert f"{UK}/d/beta" not in fetched          # non-pdf notice skipped
    docs = finalize_docs(out).to_pandas()
    same_title = docs[docs["title"] == "Enforcement: ACME Ltd"]
    # same md5(title) and date, DIFFERENT notice type -> two documents
    assert len(same_title) == 2
    assert set(same_title["doc_key"].str.split("-2021").str[0]
               .str.split("-", n=1).str[1]) == {
        "Enforcement_notices", "Monetary_penalties"}


# --------------------------------------------------------------------------
# Sweden: incremental ?page=N walk, Beslut-gated rows, last-token dates
# --------------------------------------------------------------------------

SE = "https://www.imy.se"


def _se_item(title, body, href):
    return ('<li class="imy-search__results-item">'
            f'<a href="{href}"><h2 class="imy-search-hit__heading">{title}'
            f"</h2></a><p class=\"imy-search-hit__body\">{body}</p></li>")


def _se_listing(items, page_no):
    return ('<html><body><form>'
            f'<input type="hidden" name="page" value="{page_no}"/></form>'
            '<ul class="imy-search__results-list">' + "".join(items)
            + "</ul></body></html>").encode()


def _se_doc(title, first_line, body="beslutets skäl", pdfs=()):
    links = "".join(f'<p><a href="{h}">bilaga</a></p>' for h in pdfs)
    return (f"<html><body><h1>{title}</h1>"
            '<div class="imy-body imy-contentpage__main-content">'
            f"<p>{first_line}</p><p>{body}</p>{links}"
            "</div></body></html>").encode()


def test_sweden_incremental_pages_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the IMY structure: the speculative
    ?query=&page=N enumeration realized incrementally (next page
    scheduled only while the current one has results; the first
    list-less page drains the frontier), ongoing rows without
    'Beslut' skipped, year-only dates defaulting to -01-01, body PDF
    attachments followed."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             finalize_docs, run_crawl)
    from crawler_ray.sources.specs import SWEDEN_SPEC

    base = f"{SE}/tillsyner/"
    p1 = _se_listing([
        _se_item("Tillsyn Alpha", "Beslut meddelat 2021-06-09", "/t/a"),
        _se_item("Tillsyn Ongoing", "Ärendet pågår fortfarande", "/t/x"),
        _se_item("Tillsyn Old", "Beslut meddelat 2017-02-01", "/t/old"),
    ], 1)
    p2 = _se_listing([
        _se_item("Tillsyn Beta", "Beslut fattades under 2019", "/t/b"),
    ], 2)
    shell = b"<html><body><p>Inga resultat</p></body></html>"
    pages = _pages_table([
        (f"{base}?query=&page=1", p1),
        (f"{base}?query=&page=2", p2),
        (f"{base}?query=&page=3", shell),      # empty page: walk stops
        (f"{SE}/t/a", _se_doc("Tillsyn Alpha", "Beslut meddelat 2021-06-09",
                              pdfs=["/f/a.pdf"])),
        (f"{SE}/t/b", _se_doc("Tillsyn Beta", "Beslut 2019-01-01")),
        (f"{SE}/t/old", _se_doc("Tillsyn Old",
                                "Beslut meddelat 2017-02-01")),
        (f"{SE}/f/a.pdf", b"%PDF-1.4 stub"),
    ])
    out = str(tmp_path / "out")
    run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{base}?query=&page=1"]),
        _robots(tmp_path, ["www.imy.se"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: SWEDEN_SPEC for h in SWEDEN_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    cbase = f"{SE}/tillsyner"                     # canonical: no slash
    assert f"{cbase}?query=&page=2" in fetched    # incremental walk
    assert f"{cbase}?query=&page=3" in fetched    # probed, found empty
    assert f"{cbase}?query=&page=4" not in fetched  # ...and stopped
    assert f"{SE}/t/x" not in fetched             # no 'Beslut': ongoing
    assert f"{SE}/t/old" not in fetched           # window-filtered
    assert f"{SE}/f/a.pdf" in fetched             # body attachment
    docs = finalize_docs(out).to_pandas().set_index("title")
    assert set(docs.index) == {"Tillsyn Alpha", "Tillsyn Beta"}
    assert str(docs.loc["Tillsyn Alpha", "release_date"]) == "2021-06-09"
    assert str(docs.loc["Tillsyn Beta", "release_date"]) == "2019-01-01"


# --------------------------------------------------------------------------
# Portugal: c-pagination enumerated pager, c-card direct-PDF rows
# --------------------------------------------------------------------------

PT = "https://www.cnpd.pt"


def _pt_card(title, href):
    return (f'<div class="c-card"><a href="{href}">'
            f'<div class="c-card-header-medium">{title}</div>'
            "</a></div>")


def _pt_listing(cards, pager_hrefs=()):
    pager = ""
    if pager_hrefs:
        pager = ('<div class="c-pagination">' + "".join(
            f'<a href="{h}">{i + 1}</a>' for i, h in enumerate(pager_hrefs))
            + "</div>")
    return ('<html><body><div class="layout">' + "".join(cards)
            + pager + "</div></body></html>").encode()


def test_portugal_card_listing_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the CNPD structure: every c-pagination
    link enqueues (seen-dedup collapses the self-link), card rows link
    straight to PDFs fetched as binary, and the title-suffix year gate
    drops pre-2018 rows at the listing (portugal:115-120)."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             run_crawl)
    from crawler_ray.sources.specs import PORTUGAL_SPEC

    base = f"{PT}/decisoes/historico-de-decisoes/"
    p1 = _pt_listing(
        [_pt_card("Deliberação 2021/622 - 2021", "/docs/d622.pdf"),
         _pt_card("Deliberação antiga - 2016", "/docs/old.pdf")],
        pager_hrefs=[f"{base}?year=2021&pgd=1", f"{base}?year=2021&pgd=2"])
    p2 = _pt_listing(
        [_pt_card("Decisão 43 - 2020", "/docs/d43.pdf")],
        pager_hrefs=[f"{base}?year=2021&pgd=1", f"{base}?year=2021&pgd=2"])
    pdf = b"%PDF-1.4 stub"
    pages = _pages_table([
        (f"{base}?year=2021&pgd=1", p1),
        (f"{base}?year=2021&pgd=2", p2),
        (f"{PT}/docs/d622.pdf", pdf), (f"{PT}/docs/old.pdf", pdf),
        (f"{PT}/docs/d43.pdf", pdf),
    ])
    out = str(tmp_path / "out")
    summary = run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{base}?year=2021&pgd=1"]),
        _robots(tmp_path, ["www.cnpd.pt"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: PORTUGAL_SPEC
                              for h in PORTUGAL_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    cbase = f"{PT}/decisoes/historico-de-decisoes"   # canonical form
    assert fetched == {
        f"{cbase}?year=2021&pgd=1", f"{cbase}?year=2021&pgd=2",
        f"{PT}/docs/d622.pdf", f"{PT}/docs/d43.pdf",
    }  # old.pdf gated by the title year; pgd=1 self-link seen-deduped
    assert summary["urls_fetched"] == 4
    assert log.set_index("url").loc[f"{PT}/docs/d622.pdf", "kind"] \
        == "binary"


def test_uk_sweden_portugal_parsers_standalone():
    from crawler_ray.sources.specs import (portugal_page_parser,
                                           swedish_date_iso,
                                           sweden_page_parser,
                                           uk_page_parser)

    uk = uk_page_parser(_uk_listing(
        [_uk_item("T", "12 June 2021, Monetary penalties", href="/d/t")],
        next_href="/enf/?page=2"))
    assert uk.kind == "listing"
    assert uk.results == [("T", "2021-06-12", "/d/t")]
    assert uk.next_href == "/enf/?page=2"
    ukd = uk_page_parser(_uk_doc("T", "12 June 2021, Enforcement notices",
                                 files=["/f/x.pdf"]))
    assert ukd.kind == "detail"
    assert ukd.text.split("\n")[:2] == ["T", "Released 2021-06-12"]
    assert ukd.key_extra == "Enforcement_notices"   # uk:386-390
    assert ukd.out_links == ["/f/x.pdf"]

    assert swedish_date_iso("Beslut meddelat 2021-06-09") == "2021-06-09"
    assert swedish_date_iso("Beslut fattades under 2019") == "2019-01-01"
    assert swedish_date_iso("Beslut den 9 juni 2021") == "2021-06-09"
    se = sweden_page_parser(_se_listing(
        [_se_item("T", "Beslut 2021-06-09", "/t/1")], 4))
    assert se.kind == "listing"
    assert se.results == [("T", "2021-06-09", "/t/1")]
    assert se.next_href == "?query=&page=5"         # sweden:44-49
    se_empty = sweden_page_parser(
        b'<html><body><ul class="imy-search__results-list"></ul>'
        b"</body></html>")
    assert se_empty.kind == "listing"
    assert se_empty.results == [] and se_empty.next_href is None

    pt = portugal_page_parser(_pt_listing(
        [_pt_card("Deliberação X - 2020", "/d/x.pdf"),
         _pt_card("Deliberação Y - 2017", "/d/y.pdf")],
        pager_hrefs=["?pgd=2"]))
    assert pt.kind == "listing"
    assert pt.results == [("Deliberação X - 2020", "", "/d/x.pdf")]
    assert pt.out_links == ["?pgd=2"]


# --------------------------------------------------------------------------
# Hungary: phocadownload fileboxes, Hungarian dates, pagination-next
# --------------------------------------------------------------------------

HU = "https://www.naih.hu"


def _hu_box(title, date, href):
    return ('<div class="pd-filebox"><div class="pd-filenamebox">'
            '<div class="pd-filename"><div class="pd-float">'
            f'<a href="{href}">{title}</a></div></div></div>'
            f'<div class="pd-fl-m">{date}</div></div>')


def _hu_listing(boxes, next_href=None):
    footer = ""
    if next_href:
        footer = ('<div class="sectiontablefooter"><ul>'
                  '<li class="pagination-next">'
                  f'<a class="hasTooltip pagenav" href="{next_href}">'
                  "Köv.</a></li></ul></div>")
    return ('<html><body><div class="pd-category">' + "".join(boxes)
            + "</div>" + footer + "</body></html>").encode()


def test_hungary_fileboxes_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the NAIH structure: filebox hrefs fetch as
    binary documents, Hungarian textual dates window-filter at the
    listing, pagenav pagination walks forward."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             run_crawl)
    from crawler_ray.sources.specs import HUNGARY_SPEC

    p1 = _hu_listing([
        _hu_box("NAIH-2021-1234 határozat", "2021. május 10.",
                "files/h1.pdf"),
        _hu_box("Régi határozat", "2016. március 1.", "files/old.pdf"),
    ], next_href="/hatarozatok-vegzesek?start=20")
    p2 = _hu_listing([
        _hu_box("NAIH-2020-77 végzés", "2020-11-03", "files/h2.pdf"),
    ])
    pdf = b"%PDF-1.4 stub"
    pages = _pages_table([
        (f"{HU}/hatarozatok-vegzesek?start=0", p1),
        (f"{HU}/hatarozatok-vegzesek?start=20", p2),
        (f"{HU}/files/h1.pdf", pdf),
        (f"{HU}/files/old.pdf", pdf),
        (f"{HU}/files/h2.pdf", pdf),
    ])
    out = str(tmp_path / "out")
    run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{HU}/hatarozatok-vegzesek?start=0"]),
        _robots(tmp_path, ["www.naih.hu"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: HUNGARY_SPEC
                              for h in HUNGARY_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert f"{HU}/hatarozatok-vegzesek?start=20" in fetched  # pagenav
    # hungary:125-126 — document_url = host + '/' + href; the engine's
    # url join against the query-only listing base lands the same place
    assert f"{HU}/files/h1.pdf" in fetched
    assert f"{HU}/files/h2.pdf" in fetched
    assert f"{HU}/files/old.pdf" not in fetched
    assert log.set_index("url").loc[f"{HU}/files/h1.pdf", "kind"] \
        == "binary"


# --------------------------------------------------------------------------
# Poland: decision rows + artLevel0 tutorials, render-pool details
# --------------------------------------------------------------------------

PL = "https://uodo.gov.pl"


def _pl_decisions(rows):
    divs = "".join(
        f'<div class="decision"><div class="float-sm-right">{date}</div>'
        f'<a href="{href}">{title}</a></div>'
        for title, date, href in rows)
    return (f'<html><body><div id="decisions-container">{divs}</div>'
            "</body></html>").encode()


def _pl_tutorials(rows):
    divs = "".join(
        f'<div class="artLevel0"><a href="{href}">{title}</a></div>'
        for title, href in rows)
    return (f'<html><body><div class="body-content">{divs}</div>'
            "</body></html>").encode()


def _pl_doc(title, date, body="treść decyzji", rendered=False):
    inner = (f"<h1>{title}</h1>"
             f'<span class="article-metric-button">{date}</span>'
             f'<div id="article-content"><p>{body}</p></div>')
    if not rendered:
        return f"<html><body>{inner}</body></html>".encode()
    # tutorial detail: content arrives via script (poland:177-190)
    return ('<html><body><div id="shell">loading…</div>'
            f'<script type="application/x-fixture-ajax">{inner}</script>'
            "</body></html>").encode()


def test_poland_decisions_and_rendered_tutorials(ray_session, tmp_path):
    """Real-engine crawl of the UODO structure: decision rows carry
    Polish genitive dates (window filter at the listing); tutorial
    detail pages only expose article-content after the render pool
    splices the scripted payload (the reference's Chrome-per-document,
    poland:177-190), and their article-metric-button date gates the
    document at the detail."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             finalize_docs, run_crawl)
    from crawler_ray.sources.specs import POLAND_SPEC

    dec = _pl_decisions([
        ("Decyzja ZSPR.421.2.2019", "28 maja 2019", "/pl/d1"),
        ("Stara decyzja", "10 stycznia 2017", "/pl/old"),
    ])
    tut = _pl_tutorials([("Poradnik RODO", "/pl/t1")])
    pages = _pages_table([
        (f"{PL}/pl/p/decyzje", dec),
        (f"{PL}/pl/p/poradniki", tut),
        (f"{PL}/pl/d1", _pl_doc("Decyzja ZSPR.421.2.2019",
                                "28 maja 2019")),
        (f"{PL}/pl/old", _pl_doc("Stara decyzja", "10 stycznia 2017")),
        (f"{PL}/pl/t1", _pl_doc("Poradnik RODO", "3 czerwca 2020",
                                rendered=True)),
    ])
    out = str(tmp_path / "out")
    run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{PL}/pl/p/decyzje", f"{PL}/pl/p/poradniki"]),
        _robots(tmp_path, ["uodo.gov.pl"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    render_pool=2,
                    registry={h: POLAND_SPEC for h in POLAND_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert f"{PL}/pl/old" not in fetched          # Polish date filtered
    docs = finalize_docs(out).to_pandas().set_index("title")
    assert set(docs.index) == {"Decyzja ZSPR.421.2.2019", "Poradnik RODO"}
    assert str(docs.loc["Decyzja ZSPR.421.2.2019", "release_date"]) \
        == "2019-05-28"
    # tutorial date came from the RENDERED article-metric-button
    assert str(docs.loc["Poradnik RODO", "release_date"]) == "2020-06-03"


# --------------------------------------------------------------------------
# Estonia: sidebar year-menu fan-out + p/a and tbody document lists
# --------------------------------------------------------------------------

EE = "https://www.aki.ee"


def _ee_root(year_links):
    lis = "".join(
        f'<li><a href="{href}">{text}</a></li>'
        for text, href in year_links)
    return ('<html><body><div class="region-sidebar-first-inner">'
            f'<ul class="menu">{lis}</ul></div></body></html>').encode()


def _ee_year_page(doc_links):
    ps = "".join(
        f'<p><a href="{href}">{title}</a></p>'
        for title, href in doc_links)
    return ('<html><body><div class="region-content-inner">'
            '<div class="block-system">'
            f'<div class="field-item even">{ps}</div>'
            "</div></div></body></html>").encode()


def _ee_instructions(rows):
    trs = ""
    for cells in rows:
        tds = ""
        for c in cells:
            if isinstance(c, tuple):
                tds += f'<td><a href="{c[1]}">{c[0]}</a></td>'
            else:
                tds += f"<td>{c}</td>"
        trs += f"<tr>{tds}</tr>"
    return ('<html><body><div class="block-system-main">'
            '<div class="content clearfix">'
            '<div class="field-name-body">'
            f'<div class="field-item even"><table><tbody>{trs}</tbody>'
            "</table></div></div></div></body></html>").encode()


def test_estonia_menu_fanout_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the AKI structure: the sidebar menu fans
    out ONLY to >=2018 year pages, prescriptions date from the
    dd.mm.yyyy title token (href fallback), and the instructions
    table gates on its year cell with the cooperation sentinel row
    skipped."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             run_crawl)
    from crawler_ray.sources.specs import ESTONIA_SPEC

    root = _ee_root([
        ("Ettekirjutused 2021", "/et/menetlusotsused/2021"),
        ("Ettekirjutused 2017", "/et/menetlusotsused/2017"),
    ])
    y2021 = _ee_year_page([
        ("Ettekirjutus 12.05.2021 nr 2.1-6/21/11", "/files/e1.pdf"),
        ("Ettekirjutus hoiatus nr 7", "/files/e2_03.06.2021_nr7.pdf"),
        ("Dateerimata dokument", "/files/nodate.pdf"),
    ])
    instr = _ee_instructions([
        [("Juhend isikuandmete töötlejale", "/files/j1.pdf"), "2020"],
        [("Vana juhend", "/files/jold.pdf"), "2016"],
        ["Teiste asutustega koostöös loodud juhendid"],
    ])
    pdf = b"%PDF-1.4 stub"
    pages = _pages_table([
        (f"{EE}/et/ettekirjutused", root),
        (f"{EE}/et/menetlusotsused/2021", y2021),
        (f"{EE}/et/koik-juhised-loetelus", instr),
        (f"{EE}/files/e1.pdf", pdf),
        (f"{EE}/files/e2_03.06.2021_nr7.pdf", pdf),
        (f"{EE}/files/nodate.pdf", pdf),
        (f"{EE}/files/j1.pdf", pdf), (f"{EE}/files/jold.pdf", pdf),
    ])
    out = str(tmp_path / "out")
    run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{EE}/et/ettekirjutused",
                          f"{EE}/et/koik-juhised-loetelus"]),
        _robots(tmp_path, ["www.aki.ee"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: ESTONIA_SPEC
                              for h in ESTONIA_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert f"{EE}/et/menetlusotsused/2021" in fetched   # menu fan-out
    assert f"{EE}/et/menetlusotsused/2017" not in fetched  # year gate
    assert f"{EE}/files/e1.pdf" in fetched              # title date
    assert f"{EE}/files/e2_03.06.2021_nr7.pdf" in fetched  # href date
    assert f"{EE}/files/nodate.pdf" not in fetched      # estonia:97-98
    assert f"{EE}/files/j1.pdf" in fetched              # year cell 2020
    assert f"{EE}/files/jold.pdf" not in fetched        # year cell 2016


def test_hungary_poland_estonia_parsers_standalone():
    from crawler_ray.sources.specs import (estonia_page_parser,
                                           estonian_doc_date_iso,
                                           hungarian_date_iso,
                                           hungary_page_parser,
                                           poland_page_parser,
                                           polish_date_iso)

    assert hungarian_date_iso("2021. május 10.") == "2021-05-10"
    assert hungarian_date_iso("2020-11-03") == "2020-11-03"
    hu = hungary_page_parser(_hu_listing(
        [_hu_box("T", "2021. május 10.", "files/x.pdf")],
        next_href="/p?start=20"))
    assert hu.kind == "listing"
    assert hu.results == [("T", "2021-05-10", "files/x.pdf")]
    assert hu.next_href == "/p?start=20"

    assert polish_date_iso("28 maja 2019") == "2019-05-28"
    assert polish_date_iso("3 czerwca 2020") == "2020-06-03"
    pl = poland_page_parser(_pl_decisions(
        [("D1", "28 maja 2019", "/pl/d1")]))
    assert pl.kind == "listing"
    assert pl.results == [("D1", "2019-05-28", "/pl/d1")]
    pld = poland_page_parser(_pl_doc("D1", "28 maja 2019"))
    assert pld.kind == "detail"
    assert pld.text.split("\n")[:2] == ["D1", "Released 2019-05-28"]

    assert estonian_doc_date_iso(
        "Ettekirjutus 12.05.2021 nr 2", "/f/x.pdf") == "2021-05-12"
    assert estonian_doc_date_iso(
        "Ettekirjutus hoiatus nr 7", "/f/e2_03.06.2021_nr7.pdf") \
        == "2021-06-03"
    assert estonian_doc_date_iso("Dateerimata", "/f/n.pdf") is None
    ee = estonia_page_parser(_ee_root(
        [("E 2021", "/y/2021"), ("E 2016", "/y/2016")]))
    assert ee.kind == "listing" and ee.out_links == ["/y/2021"]
    eey = estonia_page_parser(_ee_instructions(
        [[("J", "/f/j.pdf"), "2020"]]))
    assert eey.results == [("J", "", "/f/j.pdf")]


# --------------------------------------------------------------------------
# Croatia: WordPress posts + wp-pagenavi, rendered Divi details
# --------------------------------------------------------------------------

HR = "https://azop.hr"


def _hr_post(title, date, href):
    return ('<article class="post">'
            f'<p class="post-meta"><span class="published">{date}</span>'
            f'</p><h2 class="entry-title"><a href="{href}">{title}</a>'
            "</h2></article>")


def _hr_listing(posts, page_hrefs=()):
    navi = ""
    if page_hrefs:
        navi = ('<div class="wp-pagenavi">' + "".join(
            f'<a class="page" href="{h}">{i + 1}</a>'
            for i, h in enumerate(page_hrefs)) + "</div>")
    return ("<html><body>" + "".join(posts) + navi
            + "</body></html>").encode()


def _hr_doc(title, date, body="tekst odluke"):
    inner = (f"<h1>{title}</h1>"
             f'<span class="published">{date}</span>'
             f'<div class="et_pb_post_content"><p>{body}</p></div>')
    # detail content arrives via script (croatia:110-115 Chrome)
    return ('<html><body><div id="shell">loading…</div>'
            f'<script type="application/x-fixture-ajax">{inner}</script>'
            "</body></html>").encode()


def test_croatia_rendered_posts_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the AZOP structure: wp-pagenavi pages all
    enqueue, Croatian genitive dates window-filter at the listing,
    and Divi detail posts parse only after the render pool splices
    the scripted payload (croatia:110-115)."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             finalize_docs, run_crawl)
    from crawler_ray.sources.specs import CROATIA_SPEC

    p1 = _hr_listing([
        _hr_post("Odluka o kazni", "15. svibnja 2021.", "/hr/o1"),
        _hr_post("Stara odluka", "10. siječnja 2017.", "/hr/old"),
    ], page_hrefs=[f"{HR}/novosti", f"{HR}/novosti/page/2"])
    p2 = _hr_listing([
        _hr_post("Odluka druga", "3.6.2020", "/hr/o2"),
    ])
    pages = _pages_table([
        (f"{HR}/novosti", p1),
        (f"{HR}/novosti/page/2", p2),
        (f"{HR}/hr/o1", _hr_doc("Odluka o kazni", "15. svibnja 2021.")),
        (f"{HR}/hr/old", _hr_doc("Stara odluka", "10. siječnja 2017.")),
        (f"{HR}/hr/o2", _hr_doc("Odluka druga", "3.6.2020")),
    ])
    out = str(tmp_path / "out")
    run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{HR}/novosti"]),
        _robots(tmp_path, ["azop.hr"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    render_pool=2,
                    registry={h: CROATIA_SPEC
                              for h in CROATIA_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert f"{HR}/novosti/page/2" in fetched      # wp-pagenavi walked
    assert f"{HR}/hr/old" not in fetched          # Croatian date filtered
    docs = finalize_docs(out).to_pandas().set_index("title")
    assert set(docs.index) == {"Odluka o kazni", "Odluka druga"}
    assert str(docs.loc["Odluka o kazni", "release_date"]) == "2021-05-15"


# --------------------------------------------------------------------------
# Romania: flat <p> sequence scanned positionally
# --------------------------------------------------------------------------

RO = "https://www.dataprotection.ro"


def _ro_scroll(paras):
    body = "".join(f"<p>{p}</p>" for p in paras)
    return (f'<html><body><div id="rectangle_scroll">{body}</div>'
            "</body></html>").encode()


def test_romania_flat_paragraphs_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the ANSPDCP structure: the flat paragraph
    sequence yields (date, title, link-within-4) records
    (romania:64-99), pre-GDPR dates filter at the listing, detail
    pages re-use rectangle_scroll as the document body."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             finalize_docs, run_crawl)
    from crawler_ray.sources.specs import ROMANIA_SPEC

    listing = _ro_scroll([
        "Comunicate de presă",                       # header para
        "28/05/2021",
        "Amendă pentru operator",
        'detalii <a href="/n1">aici</a>',
        "10/01/2017",
        "Comunicat vechi",
        'detalii <a href="/old">aici</a>',
    ])
    d1 = _ro_scroll(["Amendă pentru operator", "28/05/2021",
                     "textul comunicatului de presă"])
    old = _ro_scroll(["Comunicat vechi", "10/01/2017", "text vechi"])
    pages = _pages_table([
        (f"{RO}/?page=allnews&lang=ro", listing),
        (f"{RO}/n1", d1), (f"{RO}/old", old),
    ])
    out = str(tmp_path / "out")
    run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{RO}/?page=allnews&lang=ro"]),
        _robots(tmp_path, ["www.dataprotection.ro"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: ROMANIA_SPEC
                              for h in ROMANIA_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert f"{RO}/n1" in fetched
    assert f"{RO}/old" not in fetched             # dd/mm/yyyy filtered
    docs = finalize_docs(out).to_pandas().set_index("title")
    assert set(docs.index) == {"Amendă pentru operator"}
    assert str(docs.loc["Amendă pentru operator", "release_date"]) \
        == "2021-05-28"


# --------------------------------------------------------------------------
# Cyprus: NSF li.photos rows, content-block details
# --------------------------------------------------------------------------

CY = "http://www.dataprotection.gov.cy"


def _cy_listing(rows):
    lis = "".join(
        f'<li class="photos"><span class="date">{date}</span>'
        f'<a href="{href}">{title}</a></li>'
        for title, date, href in rows)
    return (f'<html><body><div class="content-block"><ul>{lis}</ul>'
            "</div></body></html>").encode()


def _cy_doc(title, date, body="κείμενο απόφασης"):
    return (f"<html><body><h1>{title}</h1>"
            f'<div class="content-block">'
            f'<span class="date">{date}</span><p>{body}</p>'
            "</div></body></html>").encode()


def test_cyprus_nsf_listing_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the Cyprus structure: li.photos rows with
    dd/mm/yyyy dates window-filter at the listing; detail pages emit
    their content-block as the document."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             finalize_docs, run_crawl)
    from crawler_ray.sources.specs import CYPRUS_SPEC

    listing = _cy_listing([
        ("Απόφαση 17/2021", "16/06/2021", "/dp/a17"),
        ("Παλιά απόφαση", "01/02/2017", "/dp/old"),
    ])
    pages = _pages_table([
        (f"{CY}/DATAPROTECTION/DATAPROTECTION.NSF/dp06/dp06?opendocument",
         listing),
        (f"{CY}/dp/a17", _cy_doc("Απόφαση 17/2021", "16/06/2021")),
        (f"{CY}/dp/old", _cy_doc("Παλιά απόφαση", "01/02/2017")),
    ])
    out = str(tmp_path / "out")
    run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{CY}/DATAPROTECTION/DATAPROTECTION.NSF/dp06/"
                          "dp06?opendocument"]),
        _robots(tmp_path, ["www.dataprotection.gov.cy"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: CYPRUS_SPEC for h in CYPRUS_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert f"{CY}/dp/a17" in fetched
    assert f"{CY}/dp/old" not in fetched
    docs = finalize_docs(out).to_pandas().set_index("title")
    assert set(docs.index) == {"Απόφαση 17/2021"}
    assert str(docs.loc["Απόφαση 17/2021", "release_date"]) == "2021-06-16"


# --------------------------------------------------------------------------
# Luxembourg: search-results rows, time[datetime], aside-pdf two-hop
# --------------------------------------------------------------------------

LU = "https://cnpd.public.lu"


def _lu_listing(rows, page_hrefs=()):
    lis = "".join(
        f'<li><time class="article-published" datetime="{d}">{d}</time>'
        f'<h2 class="article-title"><a href="{href}">{title}</a></h2></li>'
        for title, d, href in rows)
    pager = ""
    if page_hrefs:
        pager = ('<ol class="pagination">' + "".join(
            f'<li class="pagination-page"><a href="{h}">{i + 1}</a></li>'
            for i, h in enumerate(page_hrefs)) + "</ol>")
    return (f'<html><body><ol class="search-results">{lis}</ol>{pager}'
            "</body></html>").encode()


def _lu_doc(title, iso, pdf=None, body="texte de la décision"):
    # the page-more aside is part of the article template; the pdf
    # link is optional (luxembourg:151-160 scans for the first .pdf)
    pdf_a = f'<a href="{pdf}">pdf</a>' if pdf else ""
    aside = ('<aside class="page-more">'
             f'<a href="/docs/ignore.html">autre</a>{pdf_a}</aside>')
    return (f"<html><body><h1>{title}</h1>"
            f'<time datetime="{iso}">{iso}</time>'
            f"<p>{body}</p>{aside}</body></html>").encode()


def test_luxembourg_aside_pdf_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the CNPD (LU) structure: pagination-page
    links walk, the listing's time[datetime] year gate skips <2018
    rows, and the article's aside.page-more PDF fetches as binary
    (the two-hop pattern, luxembourg:148-160)."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             finalize_docs, run_crawl)
    from crawler_ray.sources.specs import LUXEMBOURG_SPEC

    p1 = _lu_listing(
        [("Décision 15FR/2021", "2021-06-09", "/fr/d15.html"),
         ("Vieille décision", "2016-03-01", "/fr/old.html")],
        page_hrefs=["/fr/decisions-avis.html?b=0",
                    "/fr/decisions-avis.html?b=10"])
    p2 = _lu_listing(
        [("Avis 3/2020", "2020-02-20", "/fr/a3.html")])
    pages = _pages_table([
        (f"{LU}/fr/decisions-avis.html?b=0", p1),
        (f"{LU}/fr/decisions-avis.html?b=10", p2),
        (f"{LU}/fr/d15.html", _lu_doc("Décision 15FR/2021", "2021-06-09",
                                      pdf="/docs/d15.pdf")),
        (f"{LU}/fr/a3.html", _lu_doc("Avis 3/2020", "2020-02-20")),
        (f"{LU}/docs/d15.pdf", b"%PDF-1.4 stub"),
    ])
    out = str(tmp_path / "out")
    run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{LU}/fr/decisions-avis.html?b=0"]),
        _robots(tmp_path, ["cnpd.public.lu"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: LUXEMBOURG_SPEC
                              for h in LUXEMBOURG_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert f"{LU}/fr/decisions-avis.html?b=10" in fetched
    assert f"{LU}/fr/old.html" not in fetched     # year gate at listing
    assert f"{LU}/docs/d15.pdf" in fetched        # aside two-hop
    assert log.set_index("url").loc[f"{LU}/docs/d15.pdf", "kind"] \
        == "binary"
    docs = finalize_docs(out).to_pandas().set_index("title")
    assert set(docs.index) == {"Décision 15FR/2021", "Avis 3/2020"}


def test_croatia_romania_cyprus_luxembourg_parsers_standalone():
    from crawler_ray.sources.specs import (croatia_page_parser,
                                           croatian_date_iso,
                                           cyprus_page_parser,
                                           luxembourg_page_parser,
                                           romania_page_parser)

    assert croatian_date_iso("15. svibnja 2021.") == "2021-05-15"
    assert croatian_date_iso("3.6.2020") == "2020-06-03"
    hr = croatia_page_parser(_hr_listing(
        [_hr_post("T", "15. svibnja 2021.", "/hr/t")],
        page_hrefs=["/novosti/page/2"]))
    assert hr.kind == "listing"
    assert hr.results == [("T", "2021-05-15", "/hr/t")]
    assert hr.out_links == ["/novosti/page/2"]

    ro = romania_page_parser(_ro_scroll([
        "header", "28/05/2021", "Titlu",
        'x <a href="/n1">aici</a>']))
    assert ro.kind == "listing"
    assert ro.results == [("Titlu", "28/05/2021", "/n1")]
    rod = romania_page_parser(_ro_scroll(["Titlu", "28/05/2021", "corp"]))
    assert rod.kind == "detail"
    assert rod.text.split("\n")[:2] == ["Titlu", "Released 2021-05-28"]

    cy = cyprus_page_parser(_cy_listing([("A", "16/06/2021", "/dp/a")]))
    assert cy.kind == "listing"
    assert cy.results == [("A", "16/06/2021", "/dp/a")]
    cyd = cyprus_page_parser(_cy_doc("A", "16/06/2021"))
    assert cyd.kind == "detail"
    assert cyd.text.split("\n")[:2] == ["A", "Released 2021-06-16"]

    lu = luxembourg_page_parser(_lu_listing(
        [("T", "2021-06-09", "/fr/t.html"),
         ("Old", "2016-01-01", "/fr/old.html")],
        page_hrefs=["?b=10"]))
    assert lu.kind == "listing"
    assert lu.results == [("T", "2021-06-09", "/fr/t.html")]
    assert lu.out_links == ["?b=10"]
    lud = luxembourg_page_parser(_lu_doc("T", "2021-06-09",
                                         pdf="/docs/t.pdf"))
    assert lud.kind == "detail"
    assert lud.out_links == ["/docs/t.pdf"]      # non-pdf aside skipped


# --------------------------------------------------------------------------
# Bulgaria: rubric fan-out, three row shapes, undated documents
# --------------------------------------------------------------------------

BG = "https://www.cpdp.bg"


def _bg_rubric(menu):
    lis = "".join(
        f'<li><a href="{href}">{text}</a></li>' for text, href in menu)
    return (f'<html><body><div class="center-part"><ul>{lis}</ul></div>'
            "</body></html>").encode()


def _bg_sublisting(links, news=(), page_hrefs=()):
    body = "".join(f'<a href="{h}">{t}</a>' for t, h in links)
    body += "".join(
        '<div class="news-home"><div class="news-content">'
        f'<h6><a href="{h}">{t}</a></h6></div></div>' for t, h in news)
    pager = ""
    if page_hrefs:
        pager = ('<div class="pages">' + "".join(
            f'<a href="{h}">{i + 1}</a>' for i, h in enumerate(page_hrefs))
            + "</div>")
    return (f'<html><body><div class="center-part">{body}{pager}</div>'
            "</body></html>").encode()


def _bg_frame_doc(title, body="текст на решението"):
    return (f'<html><body><div class="center-part">'
            f'<div class="document-frame"><p>{title}</p><p>{body}</p>'
            "</div></div></body></html>").encode()


def test_bulgaria_rubric_fanout_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the CPDP structure: the rubric menu fans
    out only to >=2018 sub-rubrics, pdf rows fetch as binary, the
    news rows' detail pages parse as UNDATED details (the reference
    writes releaseDate 'Need to add') counted by the NoDate metric
    with their text kept in the parsed corpus."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             finalize_docs, run_crawl)
    from crawler_ray.sources.specs import BULGARIA_SPEC

    rubric = _bg_rubric([
        ("Решения на КЗЛД за 2021", "?p=sub&y=2021"),
        ("Решения на КЗЛД за 2016", "?p=sub&y=2016"),
    ])
    sub = _bg_sublisting(
        links=[("Решение ППН-01-2021", "/docs/r1.pdf")],
        news=[("Становище относно жалба", "?p=news&aid=77")],
        page_hrefs=["?p=sub&y=2021&page=2"])
    sub2 = _bg_sublisting(links=[("Решение второ", "/docs/r2.pdf")])
    pdf = b"%PDF-1.4 stub"
    pages = _pages_table([
        (f"{BG}/index.php?p=rubric&aid=3", rubric),
        (f"{BG}/index.php?p=sub&y=2021", sub),
        (f"{BG}/index.php?p=sub&y=2021&page=2", sub2),
        (f"{BG}/docs/r1.pdf", pdf), (f"{BG}/docs/r2.pdf", pdf),
        (f"{BG}/index.php?p=news&aid=77",
         _bg_frame_doc("Становище относно жалба")),
    ])
    out = str(tmp_path / "out")
    summary = run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{BG}/index.php?p=rubric&aid=3"]),
        _robots(tmp_path, ["www.cpdp.bg"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: BULGARIA_SPEC
                              for h in BULGARIA_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert f"{BG}/index.php?p=sub&y=2021" in fetched   # rubric fan-out
    assert f"{BG}/index.php?p=sub&y=2016" not in fetched  # year gate
    assert f"{BG}/index.php?p=sub&y=2021&page=2" in fetched  # div.pages
    assert f"{BG}/docs/r1.pdf" in fetched
    assert f"{BG}/docs/r2.pdf" in fetched
    assert f"{BG}/index.php?p=news&aid=77" in fetched
    # undated detail: text extracted, excluded from dated docs by the
    # engine's NoDate contract (reference: releaseDate 'Need to add')
    row = log.set_index("url").loc[f"{BG}/index.php?p=news&aid=77"]
    assert row["kind"] == "detail"
    docs = finalize_docs(out).to_pandas()
    assert docs.empty or \
        "Становище относно жалба" not in set(docs["title"])


# --------------------------------------------------------------------------
# Latvia: accordion year tables with drifting columns + news rows
# --------------------------------------------------------------------------

LV = "https://www.dvi.gov.lv"


def _lv_decisions(rows_2021, rows_2020):
    def table(rows, with_remedy):
        trs = "<tr><th>h</th></tr>"
        for manager, date, href in rows:
            cells = [f"<td>{manager}</td>"]
            if with_remedy:
                cells.append("<td>remedy</td>")
            cells.append(f'<td><a href="{href}">pdf</a></td>')
            cells.append(f"<td>{date}</td>")
            if not with_remedy:
                # 2020 layout: date in col 2, extra status cols after
                cells = [f"<td>{manager}</td>",
                         f'<td><a href="{href}">pdf</a></td>',
                         f"<td>{date}</td>", "<td>st</td>", "<td>cj</td>"]
            trs += "<tr>" + "".join(cells) + "</tr>"
        return f"<table><tbody>{trs}</tbody></table>"

    acc = ('<div class="accordion"><button class="btn btn-link">2021'
           f'</button><div class="card-body">{table(rows_2021, True)}'
           "</div></div>"
           '<div class="accordion"><button class="btn btn-link">2020'
           f'</button><div class="card-body">{table(rows_2020, False)}'
           "</div></div>")
    return ('<html><body><div class="block-ministry-content">'
            f'<div class="node"><div class="content">{acc}</div></div>'
            "</div></body></html>").encode()


def _lv_news(rows, page_hrefs=()):
    arts = "".join(
        '<div class="articles-wrapper"><div class="article-details">'
        f'<div class="date">{date}</div></div>'
        f'<div class="title"><a href="{href}">{title}</a></div></div>'
        for title, date, href in rows)
    pager = ""
    if page_hrefs:
        pager = ('<ul class="pagination">' + "".join(
            f'<li class="page-item"><a href="{h}">{i + 1}</a></li>'
            for i, h in enumerate(page_hrefs)) + "</ul>")
    return f"<html><body>{arts}{pager}</body></html>".encode()


def test_latvia_year_tables_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the DVI structure: BOTH year-table column
    layouts resolve (the date cell is found, not indexed), titles
    synthesize manager-date, news rows window-filter on dd.mm.yyyy.
    dates, page-item pagination walks."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             run_crawl)
    from crawler_ray.sources.specs import LATVIA_SPEC

    dec = _lv_decisions(
        rows_2021=[("SIA Alpha", "15.03.2021.", "/media/a.pdf")],
        rows_2020=[("SIA Beta", "10.06.2020.", "/media/b.pdf"),
                   ("SIA Old", "01.01.2017.", "/media/old.pdf")])
    news = _lv_news(
        [("Jaunums par datiem", "09.06.2021.", "/lv/jaunums-1")],
        page_hrefs=["/lv/jaunumi?page=2"])
    news2 = _lv_news([])
    pages = _pages_table([
        (f"{LV}/lv/lemumi", dec),
        (f"{LV}/lv/jaunumi", news),
        (f"{LV}/lv/jaunumi?page=2", news2),
        (f"{LV}/media/a.pdf", b"%PDF-1.4 stub"),
        (f"{LV}/media/b.pdf", b"%PDF-1.4 stub"),
        (f"{LV}/media/old.pdf", b"%PDF-1.4 stub"),
        (f"{LV}/lv/jaunums-1",
         b"<html><body><h1>Jaunums par datiem</h1><p>teksts</p></body>"
         b"</html>"),
    ])
    out = str(tmp_path / "out")
    run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{LV}/lv/jaunumi", f"{LV}/lv/lemumi"]),
        _robots(tmp_path, ["www.dvi.gov.lv"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: LATVIA_SPEC for h in LATVIA_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert f"{LV}/media/a.pdf" in fetched        # 2021 layout resolved
    assert f"{LV}/media/b.pdf" in fetched        # 2020 layout resolved
    assert f"{LV}/media/old.pdf" not in fetched  # dd.mm.yyyy. filtered
    assert f"{LV}/lv/jaunumi?page=2" in fetched  # page-item pager
    assert f"{LV}/lv/jaunums-1" in fetched       # news detail followed


# --------------------------------------------------------------------------
# Lithuania: running-year paragraph lists of direct PDF links
# --------------------------------------------------------------------------

LT = "https://vdai.lrv.lt"


def _lt_listing(parts):
    body = "".join(parts)
    return (f'<html><body><div class="content text">{body}</div>'
            "</body></html>").encode()


def test_lithuania_running_year_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the VDAI structure: title-trailing ISO
    dates window-filter at the listing; undated titles inherit the
    RUNNING year paragraph's year-01-01 default (lithuania:100-106)."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             run_crawl)
    from crawler_ray.sources.specs import LITHUANIA_SPEC

    listing = _lt_listing([
        "<p>2021</p>",
        '<p><a href="/docs/s1.pdf">Sprendimas del baudos 2021-06-09</a>'
        "</p>",
        '<p><a href="/docs/s2.pdf">Nurodymas be datos</a></p>',
        "<p>2016</p>",
        '<p><a href="/docs/old.pdf">Senas sprendimas</a></p>',
    ])
    pdf = b"%PDF-1.4 stub"
    pages = _pages_table([
        (f"{LT}/lt/naudinga-informacija/vdai-sprendimai-baudos-nurodymai-"
         "ir-kt", listing),
        (f"{LT}/docs/s1.pdf", pdf), (f"{LT}/docs/s2.pdf", pdf),
        (f"{LT}/docs/old.pdf", pdf),
    ])
    out = str(tmp_path / "out")
    run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{LT}/lt/naudinga-informacija/vdai-sprendimai-"
                          "baudos-nurodymai-ir-kt"]),
        _robots(tmp_path, ["vdai.lrv.lt"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: LITHUANIA_SPEC
                              for h in LITHUANIA_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert f"{LT}/docs/s1.pdf" in fetched        # trailing ISO token
    assert f"{LT}/docs/s2.pdf" in fetched        # running-year default
    assert f"{LT}/docs/old.pdf" not in fetched   # 2016-01-01 filtered


def test_bulgaria_latvia_lithuania_parsers_standalone():
    from crawler_ray.sources.specs import (bulgaria_page_parser,
                                           latvia_page_parser,
                                           latvian_date_iso,
                                           lithuania_page_parser)

    bg = bulgaria_page_parser(_bg_rubric([
        ("Решения за 2021", "?p=s&y=2021"),
        ("Решения за 2016", "?p=s&y=2016")]))
    assert bg.kind == "listing"
    assert bg.out_links == ["?p=s&y=2021"] and bg.results == []
    bgs = bulgaria_page_parser(_bg_sublisting(
        links=[("R1", "/d/r1.pdf")], news=[("N1", "?p=n&aid=1")],
        page_hrefs=["?page=2"]))
    assert ("R1", "", "/d/r1.pdf") in bgs.results
    assert ("N1", "", "?p=n&aid=1") in bgs.results
    assert bgs.out_links == ["?page=2"]
    bgd = bulgaria_page_parser(_bg_frame_doc("T"))
    assert bgd.kind == "detail"
    assert bgd.text.split("\n")[:2] == ["T", "Released "]

    assert latvian_date_iso("15.03.2021.") == "2021-03-15"
    lv = latvia_page_parser(_lv_decisions(
        rows_2021=[("SIA A", "15.03.2021.", "/m/a.pdf")], rows_2020=[]))
    assert lv.results == [("SIA A-15.03.2021.", "2021-03-15", "/m/a.pdf")]

    lt = lithuania_page_parser(_lt_listing([
        "<p>2020</p>", '<p><a href="/d/x.pdf">Be datos</a></p>']))
    assert lt.results == [("Be datos", "2020-01-01", "/d/x.pdf")]


# --------------------------------------------------------------------------
# Slovakia: filefield-file rows, any-token year gate, pager-item pager
# --------------------------------------------------------------------------

SK = "https://dataprotection.gov.sk"


def _sk_listing(rows, page_hrefs=()):
    files = "".join(
        f'<div class="filefield-file"><a href="{href}">{title}</a></div>'
        for title, href in rows)
    pager = ""
    if page_hrefs:
        pager = ('<ul class="pager">' + "".join(
            f'<li class="pager-item"><a href="{h}">{i + 1}</a></li>'
            for i, h in enumerate(page_hrefs)) + "</ul>")
    return ('<html><body><div class="content clearfix">' + files
            + "</div>" + pager + "</body></html>").encode()


def test_slovakia_filefields_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the UOOU-SK structure: direct downloads
    fetch as binary, the any-title-token year gate drops pre-2018
    rows at the listing, pager-item pagination walks."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             run_crawl)
    from crawler_ray.sources.specs import SLOVAKIA_SPEC

    p1 = _sk_listing(
        [("Metodika spracúvania 2021", "/files/m1.pdf"),
         ("Stará správa 2016", "/files/old.pdf")],
        page_hrefs=["/uoou/sk/main-content/metodiky-uradu?page=1"])
    p2 = _sk_listing([("Vyročná správa 2020", "/files/v2.pdf")])
    pdf = b"%PDF-1.4 stub"
    pages = _pages_table([
        (f"{SK}/uoou/sk/main-content/metodiky-uradu", p1),
        (f"{SK}/uoou/sk/main-content/metodiky-uradu?page=1", p2),
        (f"{SK}/files/m1.pdf", pdf), (f"{SK}/files/old.pdf", pdf),
        (f"{SK}/files/v2.pdf", pdf),
    ])
    out = str(tmp_path / "out")
    run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{SK}/uoou/sk/main-content/metodiky-uradu"]),
        _robots(tmp_path, ["dataprotection.gov.sk"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: SLOVAKIA_SPEC
                              for h in SLOVAKIA_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert f"{SK}/uoou/sk/main-content/metodiky-uradu?page=1" in fetched
    assert f"{SK}/files/m1.pdf" in fetched
    assert f"{SK}/files/v2.pdf" in fetched
    assert f"{SK}/files/old.pdf" not in fetched   # any-token year gate


# --------------------------------------------------------------------------
# Slovenia: advsea table rows, align-keyed cells, advsea-next pager
# --------------------------------------------------------------------------

SI = "https://www.ip-rs.si"


def _si_listing(rows, next_href=None):
    trs = "<tr><th>Datum</th><th>Naslov</th></tr>"
    for title, date, href in rows:
        trs += (f'<tr><td align="center">{date}</td>'
                f'<td align="left"><a href="{href}">{title}</a></td></tr>')
    nxt = ""
    if next_href:
        nxt = (f'<span class="advsea-next"><a href="{next_href}">»</a>'
               "</span>")
    return ('<html><body><div class="page pr"><article class="c9">'
            f'<div class="advsea-results-list"><table>{trs}</table></div>'
            f"{nxt}</article></div></body></html>").encode()


def _si_doc(title, date, body="besedilo mnenja"):
    return ('<html><body><div class="page pr"><article class="c9">'
            f"<header><h1>{title}</h1></header>"
            f"<p>Datum: {date}</p><p>{body}</p>"
            "</article></div></body></html>").encode()


def test_slovenia_advsea_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the IP-RS structure: align-keyed cells
    resolve date and link, hrefs MISSING the leading slash join to
    the site root (slovenia:139-141), d.m.yyyy dates window-filter,
    advsea-next pagination walks."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             finalize_docs, run_crawl)
    from crawler_ray.sources.specs import SLOVENIA_SPEC

    p1 = _si_listing(
        [("Mnenje 07121-1/2021", "9.6.2021", "mnenja/m1"),
         ("Staro mnenje", "1.1.2016", "mnenja/old")],
        next_href="/mnenja-gdpr/?page=2")
    p2 = _si_listing([("Mnenje drugo", "20.2.2020", "mnenja/m2")])
    pages = _pages_table([
        (f"{SI}/mnenja-gdpr/", p1),
        (f"{SI}/mnenja-gdpr/?page=2", p2),
        (f"{SI}/mnenja/m1", _si_doc("Mnenje 07121-1/2021", "9.6.2021")),
        (f"{SI}/mnenja/old", _si_doc("Staro mnenje", "1.1.2016")),
        (f"{SI}/mnenja/m2", _si_doc("Mnenje drugo", "20.2.2020")),
    ])
    out = str(tmp_path / "out")
    run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{SI}/mnenja-gdpr/"]),
        _robots(tmp_path, ["www.ip-rs.si"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: SLOVENIA_SPEC
                              for h in SLOVENIA_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert f"{SI}/mnenja-gdpr?page=2" in fetched   # advsea-next
    # slash-less hrefs rooted at the site root (slovenia:139-141)
    assert f"{SI}/mnenja/m1" in fetched
    assert f"{SI}/mnenja/old" not in fetched
    docs = finalize_docs(out).to_pandas().set_index("title")
    assert "Mnenje 07121-1/2021" in set(docs.index)
    assert str(docs.loc["Mnenje 07121-1/2021", "release_date"]) \
        == "2021-06-09"


# --------------------------------------------------------------------------
# Malta: vce-text guideline paragraphs + rendered news grid
# --------------------------------------------------------------------------

MT = "https://idpc.org.mt"


def _mt_guidelines(rows):
    ps = "".join(
        f'<p>{title} <a href="{href}">download</a></p>'
        for title, href in rows)
    return ('<html><body><div class="vce-text-block-wrapper" '
            f'id="el-88463f26">{ps}</div></body></html>').encode()


def _mt_news(hrefs):
    tiles = "".join(
        f'<div class="tile"><a class="link" href="{h}">more</a></div>'
        for h in hrefs)
    inner = f'<div class="news-list-container">{tiles}</div>'
    # the grid appears only after the show-more click (malta:200-204)
    return ('<html><body><div id="shell">loading…</div>'
            f'<script type="application/x-fixture-ajax">{inner}</script>'
            "</body></html>").encode()


def _mt_doc(title, iso, body="article text"):
    return (f'<html><body><div class="content"><h1>{title}</h1>'
            f"<p>Released {iso}</p><p>{body}</p></div></body></html>"
            ).encode()


def test_malta_rendered_news_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the IDPC structure: guideline paragraphs
    (whole-paragraph titles) link straight to files; the news grid is
    only parseable after the render pool splices the post-click DOM;
    news details parse through the default contract."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             finalize_docs, run_crawl)
    from crawler_ray.sources.specs import MALTA_SPEC

    pages = _pages_table([
        (f"{MT}/for-organisations/guidelines/", _mt_guidelines(
            [("Guidelines on CCTV", "/files/cctv.pdf")])),
        (f"{MT}/news/", _mt_news(["/news/article-1/"])),
        (f"{MT}/news/article-1/", _mt_doc("IDPC fines controller",
                                          "2021-04-12")),
        (f"{MT}/files/cctv.pdf", b"%PDF-1.4 stub"),
    ])
    out = str(tmp_path / "out")
    run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{MT}/for-organisations/guidelines/",
                          f"{MT}/news/"]),
        _robots(tmp_path, ["idpc.org.mt"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    render_pool=2,
                    registry={h: MALTA_SPEC for h in MALTA_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert f"{MT}/files/cctv.pdf" in fetched      # guideline file
    assert f"{MT}/news/article-1" in fetched      # rendered grid tile
    docs = finalize_docs(out).to_pandas().set_index("title")
    assert "IDPC fines controller" in set(docs.index)


# --------------------------------------------------------------------------
# Czech Republic: vismo ul.ui rows, strlistovani pager, File.ashx
# --------------------------------------------------------------------------

CZ = "https://www.uoou.cz"


def _cz_listing(rows, page_hrefs=()):
    lis = "".join(
        f'<li><a href="{href}">{title}</a><div>{date} - anotace</div></li>'
        for title, date, href in rows)
    pager = ""
    if page_hrefs:
        pager = ('<div class="strlistovani">' + "".join(
            f'<a href="{h}">{i + 1}</a>' for i, h in enumerate(page_hrefs))
            + "</div>")
    return (f'<html><body><div class="obsah"><ul class="ui">{lis}</ul>'
            f"{pager}</div></body></html>").encode()


def _cz_doc(title, date, files=(), body="text zprávy"):
    links = "".join(
        f'<a href="{h}">příloha</a>' for h in files)
    return (f'<html><body><div id="obalcelek"><h1>{title}</h1>'
            f'<div class="obsah"><p>{date} - zveřejněno</p><p>{body}</p>'
            f"</div>{links}</div></body></html>").encode()


def test_czech_vismo_through_engine(ray_session, tmp_path):
    """Real-engine crawl of the UOOU-CZ structure: ul.ui rows carry
    d. m. yyyy dates (window filter with FULL dates where the
    reference truncated to years), strlistovani pagination walks,
    detail articles surface File.ashx downloads as binary fetches."""
    from crawler_ray.pipelines.crawl import (CrawlConfig, crawl_log_dataset,
                                             finalize_docs, run_crawl)
    from crawler_ray.sources.specs import CZECH_SPEC

    p1 = _cz_listing(
        [("Tisková zpráva o pokutě", "15. 3. 2021", "/tz/1"),
         ("Stará zpráva", "1. 1. 2017", "/tz/old")],
        page_hrefs=["/tiskove-zpravy/ds-1017/stranka=2"])
    p2 = _cz_listing([("Druhá zpráva", "9. 6. 2020", "/tz/2")])
    pages = _pages_table([
        (f"{CZ}/tiskove-zpravy/ds-1017/stranka=1", p1),
        (f"{CZ}/tiskove-zpravy/ds-1017/stranka=2", p2),
        (f"{CZ}/tz/1", _cz_doc("Tisková zpráva o pokutě", "15. 3. 2021",
                               files=["/assets/File.ashx?id=31695"])),
        (f"{CZ}/tz/old", _cz_doc("Stará zpráva", "1. 1. 2017")),
        (f"{CZ}/tz/2", _cz_doc("Druhá zpráva", "9. 6. 2020")),
        (f"{CZ}/assets/File.ashx?id=31695", b"%PDF-1.4 stub"),
    ])
    out = str(tmp_path / "out")
    run_crawl(
        _write(tmp_path, "pages.parquet", pages),
        _seeds(tmp_path, [f"{CZ}/tiskove-zpravy/ds-1017/stranka=1"]),
        _robots(tmp_path, ["www.uoou.cz"]), out,
        CrawlConfig(n_frontier_shards=2, n_seen_shards=2, n_page_shards=2,
                    registry={h: CZECH_SPEC for h in CZECH_SPEC.hosts}))
    log = crawl_log_dataset(out).to_pandas()
    fetched = set(log["url"])
    assert f"{CZ}/tiskove-zpravy/ds-1017/stranka=2" in fetched
    assert f"{CZ}/tz/old" not in fetched          # d. m. yyyy filtered
    assert f"{CZ}/assets/File.ashx?id=31695" in fetched
    assert log.set_index("url").loc[
        f"{CZ}/assets/File.ashx?id=31695", "kind"] == "binary"
    docs = finalize_docs(out).to_pandas().set_index("title")
    assert set(docs.index) == {"Tisková zpráva o pokutě", "Druhá zpráva"}
    assert str(docs.loc["Tisková zpráva o pokutě", "release_date"]) \
        == "2021-03-15"


def test_slovakia_slovenia_malta_czech_parsers_standalone():
    from crawler_ray.sources.specs import (czech_date_iso,
                                           czech_page_parser,
                                           malta_page_parser,
                                           slovakia_page_parser,
                                           slovenia_page_parser)

    sk = slovakia_page_parser(_sk_listing(
        [("Metodika 2021", "/f/a.pdf"), ("Stará 2016", "/f/b.pdf")],
        page_hrefs=["?page=1"]))
    assert sk.kind == "listing"
    assert sk.results == [("Metodika 2021", "", "/f/a.pdf")]
    assert sk.out_links == ["?page=1"]

    si = slovenia_page_parser(_si_listing(
        [("M1", "9.6.2021", "mnenja/m1")], next_href="?page=2"))
    assert si.kind == "listing"
    assert si.results == [("M1", "9.6.2021", "/mnenja/m1")]
    # slovenia:139-141 — slash-less hrefs rooted at the site root
    assert si.next_href == "?page=2"
    sid = slovenia_page_parser(_si_doc("M1", "9.6.2021"))
    assert sid.kind == "detail"
    assert sid.text.split("\n")[:2] == ["M1", "Released 2021-06-09"]

    mt = malta_page_parser(_mt_guidelines([("G1 title", "/f/g1.pdf")]))
    assert mt.kind == "listing"
    assert mt.results == [("G1 title download", "", "/f/g1.pdf")]

    assert czech_date_iso("15. 3. 2021 - anotace") == "2021-03-15"
    cz = czech_page_parser(_cz_listing(
        [("Z1", "15. 3. 2021", "/tz/1")], page_hrefs=["stranka=2"]))
    assert cz.kind == "listing"
    assert cz.results == [("Z1", "2021-03-15", "/tz/1")]
    assert cz.out_links == ["stranka=2"]
    czd = czech_page_parser(_cz_doc("Z1", "15. 3. 2021",
                                    files=["/assets/File.ashx?id=1"]))
    assert czd.kind == "detail"
    assert czd.text.split("\n")[:2] == ["Z1", "Released 2021-03-15"]
    assert czd.out_links == ["/assets/File.ashx?id=1"]


def test_parser_nesting_and_gate_regressions():
    """Round-3 review repros: container depth-tracking and row gates.

    - Estonia: the cooperation sentinel ends only THAT ROW's cell scan
      (estonia:172-175 breaks the per-td loop); later rows still scan,
      and cells after the sentinel are ignored.
    - Bulgaria: a year in a DOCUMENT's own title (annual reports) must
      not reroute it into the rubric fan-out.
    - Czech/Slovenia: a nested <ul>/<div> inside the results container
      must not end the scan.
    - Slovakia: the reference's second gate (any token whose
      '-'-prefix compares below '2018', slovakia:100-104).
    """
    from crawler_ray.sources.specs import (bulgaria_page_parser,
                                           czech_page_parser,
                                           estonia_page_parser,
                                           slovakia_page_parser,
                                           slovenia_page_parser)

    ee = estonia_page_parser(_ee_instructions([
        [("A", "/f/a.pdf"), "2020"],
        ["Teiste asutustega koostöös loodud juhendid",
         ("Coop", "/f/coop.pdf"), "2021"],
        [("B", "/f/b.pdf"), "2019"],
    ]))
    hrefs = [h for _, _, h in ee.results]
    assert "/f/a.pdf" in hrefs and "/f/b.pdf" in hrefs
    assert "/f/coop.pdf" not in hrefs

    bg = bulgaria_page_parser(_bg_sublisting(
        links=[("Annual report 2020", "/docs/report2020.pdf")]))
    assert ("Annual report 2020", "", "/docs/report2020.pdf") \
        in bg.results
    assert bg.out_links == []

    cz = czech_page_parser(
        b'<html><body><div class="obsah"><ul class="ui">'
        b'<li><a href="/tz/a">A</a><div>15. 3. 2021 - x</div>'
        b'<ul><li>sub</li></ul></li>'
        b'<li><a href="/tz/b">B</a><div>9. 6. 2020 - y</div></li>'
        b"</ul></div></body></html>")
    assert len(cz.results) == 2

    si = slovenia_page_parser(
        b'<html><body><div class="page pr"><article class="c9">'
        b'<div class="advsea-results-list"><div class="inner">'
        b"<table><tr><th>h</th></tr>"
        b'<tr><td align="center">9.6.2021</td>'
        b'<td align="left"><a href="m/1">Op 1</a></td></tr></table></div>'
        b'<table><tr><td align="center">2.2.2020</td>'
        b'<td align="left"><a href="m/2">Op 2</a></td></tr></table>'
        b"</div></article></div></body></html>")
    assert len(si.results) == 2

    sk = slovakia_page_parser(_sk_listing(
        [("Sprava 2016-12", "/f/x.pdf"), ("Metodika 2021", "/f/y.pdf")]))
    assert [r[2] for r in sk.results] == ["/f/y.pdf"]
