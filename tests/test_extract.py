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


def test_fast_scanner_equals_stdlib():
    """Differential: the fast one-pass scanner must produce EXACTLY
    the stdlib html.parser result (or fall back to it) on fixture
    pages and adversarial inputs."""
    from crawler_ray.extract import _Extractor, _fast_feed, _NeedsFallback
    from crawler_ray.fixtures import generate

    def stdlib_result(s):
        p = _Extractor()
        p.feed(s)
        p._flush_line()
        return (p.lines, p.results, p.next_href, p.out_links)

    def fast_result(s):
        p = _Extractor()
        try:
            _fast_feed(p, s)
        except _NeedsFallback:
            return None
        p._flush_line()
        return (p.lines, p.results, p.next_href, p.out_links)

    web = generate("t1")
    pages = web.pages_table()
    n_fast = 0
    for html in pages["html"].to_pylist():
        if not html or not html.lstrip()[:1] == b"<":
            continue
        s = html.decode("utf-8", errors="replace")
        fast = fast_result(s)
        if fast is not None:
            n_fast += 1
            assert fast == stdlib_result(s)
    assert n_fast > 1000                       # fast path actually used

    cases = [
        '<div class="content">a &amp; b &lt;c&gt;</div>',
        '<div class="content"><p>x<br>y<br/>z</p></div>',
        '<div class="content"><p class=bare x>text</p></div>',
        "<div class='content'><a class='next' href='/n?a=1&amp;b=2'>m</a></div>",
        '<!DOCTYPE html><!-- c --><div class="content">t</div>',
        '<div class="content">unclosed <b>tag',
        '<div class="content"></span>stray end</div>',
        '<div class="content"><li class="result">'
        '<a class="doclink" href="/d">T</a>'
        '<span class="date">1.2.2021</span></li></div>',
        '<div class="content"><img src="x"><p>after void</p></div>',
        '<div class="content">é unicode &euro;</div>',
        '<div class="content"><A CLASS="OUTLINK" HREF="/up">x</A></div>',
        '<div class="content"><p a="1" a="2">dup attr</p></div>',
    ]
    for s in cases:
        fast = fast_result(s)
        if fast is not None:
            assert fast == stdlib_result(s), s

    # constructs the scanner must refuse (fallback, not wrong answers)
    assert fast_result('<script>if (a<b) x()</script>') is None
    assert fast_result('<div>< notatag</div>') is None
    # unterminated comment: '<![^>]*>' would eat it to the first '>'
    # and leak the body as live markup; stdlib swallows it to EOF
    unterminated = ('<div class="content"><p>before</p>'
                    '<!-- broken > <p>leaked</p></div>')
    assert fast_result(unterminated) is None
    from crawler_ray.extract import extract_text
    assert extract_text(unterminated.encode()) == "before"
