import pyarrow.parquet as pq

from crawler_ray.extract import extract_text, parse_page


def test_byte_identical_on_fixture(fixture_t0):
    pages = pq.read_table(f"{fixture_t0}/pages.parquet")
    for html, text in zip(pages["html"].to_pylist(),
                          pages["text"].to_pylist()):
        assert extract_text(html) == text


def test_kinds():
    assert parse_page(b"").kind == "empty"
    assert parse_page(None).kind == "empty"
    assert parse_page(b"%PDF-1.4 x").kind == "binary"
    assert parse_page(b"<html><body>no container</body></html>").kind == "other"
    p = parse_page(b'<html><body><div class="content"><h1>T</h1>'
                   b"<p>body text</p></div></body></html>")
    assert p.kind == "detail"
    assert p.text == "T\nbody text"


def test_listing_structure():
    html = (b'<html><body><div class="content"><h1>Decisions page 0</h1>'
            b'<ul class="results">'
            b'<li class="result"><a class="doclink" href="/doc/1">Title One</a> '
            b'<span class="date">01.02.2020</span></li>'
            b'<li class="result"><a class="doclink" href="/doc/2">Title Two</a> '
            b'<span class="date"></span></li>'
            b'</ul><a class="next" href="/list/1">More results</a>'
            b"</div></body></html>")
    p = parse_page(html)
    assert p.kind == "listing"
    assert p.results == [("Title One", "01.02.2020", "/doc/1"),
                         ("Title Two", "", "/doc/2")]
    assert p.next_href == "/list/1"
    assert p.text == ("Decisions page 0\nTitle One 01.02.2020\nTitle Two\n"
                      "More results")


def test_outlinks_and_whitespace_collapse():
    html = (b'<html><body><div class="content"><h1>T</h1>'
            b"<p>a\n   b\t c</p>"
            b'<p class="related"><a class="outlink" href="https://x/doc/9">'
            b"Related decision 0</a></p></div></body></html>")
    p = parse_page(html)
    assert p.out_links == ["https://x/doc/9"]
    assert p.text == "T\na b c\nRelated decision 0"


def test_garbage_tolerance():
    assert parse_page(b"<div><<<&&& \xff broken").kind == "other"
    assert parse_page(b"<div class='content'>x<p class=>y</div>").text in (
        "x\ny", "x y", "x", "xy")  # malformed attrs: no crash is the contract
