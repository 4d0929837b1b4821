"""SourceSpec registry dispatch + output sinks + seed-CSV loader."""

import json

import pyarrow as pa
import pytest


def test_source_spec_dispatch():
    from crawler_ray.extract import ParsedPage
    from crawler_ray.sources import registry as R
    from crawler_ray.stages.parse import ParseStage

    def table_parser(html: bytes) -> ParsedPage:
        # a custom source whose listings are pipe-separated lines
        rows = []
        for line in html.decode().splitlines():
            if "|" in line:
                title, date_str, href = line.split("|")
                rows.append((title, date_str, href))
        return ParsedPage(kind="listing", results=rows)

    spec = R.SourceSpec(source_id="pipey", hosts=("pipe.example",),
                        page_parser=table_parser)
    try:
        R.register(spec)
        assert R.spec_for_host("pipe.example").source_id == "pipey"
        assert R.spec_for_host("other.example").source_id == "default"

        st = ParseStage()
        batch = pa.table({
            "url": pa.array(["https://pipe.example/list"], pa.string()),
            "host": pa.array(["pipe.example"], pa.string()),
            "html": pa.array(
                [b"Doc A|2021-03-15|/doc/1\nDoc B|2021-04-01|/doc/2"],
                pa.binary()),
        })
        out = st(batch)
        links = out["link_url"][0].as_py()
        assert links == ["https://pipe.example/doc/1",
                         "https://pipe.example/doc/2"]
        # default contract still applies to unregistered hosts
        batch2 = pa.table({
            "url": pa.array(["https://other.example/x"], pa.string()),
            "host": pa.array(["other.example"], pa.string()),
            "html": pa.array(
                [b'<div class="content"><h1>T</h1><p>body</p></div>'],
                pa.binary()),
        })
        assert st(batch2)["text"][0].as_py() == "T\nbody"
    finally:
        R.clear_registry()


def test_registry_dispatch_reaches_workers(ray_session, tmp_path):
    """register() on the driver must take effect inside Ray worker
    processes (the module-level registry is not replayed there — the
    pipelines snapshot it into the stage at construction)."""
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.extract import extract_corpus
    from crawler_ray.sources import registry as R

    def shouty(html: bytes) -> str:
        return html.decode().upper()

    try:
        R.register(R.SourceSpec(source_id="shout",
                                hosts=("shout.example",),
                                text_extractor=shouty))
        pq.write_table(pa.table({
            "url": pa.array(["https://shout.example/a",
                             "https://other.example/b"], pa.string()),
            "html": pa.array(
                [b'<div class="content"><p>hello</p></div>'] * 2,
                pa.binary()),
            "lang": pa.array(["en", "en"], pa.string()),
            "warc_ts": pa.array([0, 0], pa.timestamp("us")),
        }), str(tmp_path / "pages.parquet"))
        out = (extract_corpus(str(tmp_path / "pages.parquet"))
               .to_pandas().set_index("url"))
        assert out.loc["https://shout.example/a", "text"] \
            == '<DIV CLASS="CONTENT"><P>HELLO</P></DIV>'
        assert out.loc["https://other.example/b", "text"] == "hello"
    finally:
        R.clear_registry()


def test_reference_layout_export(ray_session, tmp_path):
    import datetime

    import ray

    from crawler_ray.sinks import export_reference_layout, metadata_json
    docs = ray.data.from_arrow(pa.table({
        "host": pa.array(["h1.example"], pa.string()),
        "doc_hash": pa.array(["abc123"], pa.string()),
        "lang": pa.array(["de"], pa.string()),
        "title": pa.array(["Bescheid"], pa.string()),
        "release_date": pa.array([datetime.date(2021, 3, 15)], pa.date32()),
        "url": pa.array(["https://h1.example/doc/1"], pa.string()),
        "text": pa.array(["Bescheid\ninhalt"], pa.string()),
    }))
    n = export_reference_layout(docs, str(tmp_path / "tree"))
    assert n == 1
    d = tmp_path / "tree" / "h1.example" / "abc123"
    assert (d / "de.txt").read_text() == "Bescheid\ninhalt"
    meta = json.loads((d / "metadata.json").read_text())
    assert meta == {"title.de": "Bescheid", "md5": "abc123",
                    "releaseDate": "2021-03-15",
                    "url": "https://h1.example/doc/1"}
    # exact reference formatting (indent=4, sort_keys)
    assert (d / "metadata.json").read_text() == metadata_json(
        "Bescheid", "de", "abc123", "2021-03-15",
        "https://h1.example/doc/1")


def test_markdown_and_stopword_sinks(tmp_path):
    import pandas as pd

    from crawler_ray.sinks import render_markdown, write_stopwords_json
    assert render_markdown("Hi {{name}}, {{n}} docs", {"name": "x", "n": 3}) \
        == "Hi x, 3 docs"
    df = pd.DataFrame({"source": ["s1", "s1", "s2"],
                       "term": ["alpha", "beta", "alpha"],
                       "term_count": [3, 2, 1]})
    p = write_stopwords_json(df, str(tmp_path), "sw")
    data = json.loads(open(p).read())
    assert data == {"s1": ["alpha", "beta"], "s2": ["alpha"]}
    assert open(str(tmp_path / "sw.txt")).read() == "alpha\nbeta\n"


def test_reachability_svg_export(tmp_path):
    """S8: conformance table → colored reachability tree SVG
    (reference export_reachability_analysis_service:32-74 parity:
    filled nodes, white-on-black failures, parent→child edges)."""
    import pandas as pd

    from crawler_ray.sinks import export_reachability_svg
    report = pd.DataFrame([
        {"host": "good.example", "seed_ok": True, "empty_listings": 0,
         "empty_details": 0, "n_other": 0, "status": "WHITE"},
        {"host": "broken.example", "seed_ok": False, "empty_listings": 2,
         "empty_details": 0, "n_other": 1, "status": "BLACK"},
    ])
    p = export_reachability_svg(report, str(tmp_path / "reach.svg"))
    svg = open(p).read()
    assert svg.startswith("<svg ") and svg.rstrip().endswith("</svg>")
    assert "good.example" in svg and "broken.example" in svg
    # failed host renders as the reference's white-on-black node
    assert 'fill="black"' in svg and 'fill="white"' in svg
    # mixed statuses → GREY root (Color.GREY = lightgrey)
    assert 'fill="lightgrey"' in svg
    # deterministic output
    p2 = export_reachability_svg(report, str(tmp_path / "reach2.svg"))
    assert open(p2).read() == svg


def test_csv_seed_loader(tmp_path):
    from crawler_ray.pipelines.crawl import _load_seeds
    p = tmp_path / "seeds.csv"
    p.write_text("country,doc_type,status,url\n"
                 "AT,Decisions,Crawled,https://a.example/s\n"
                 "DK,Guidelines,notCrawled,https://b.example/s\n")
    t = _load_seeds(str(p))
    assert t["url"].to_pylist() == ["https://a.example/s",
                                    "https://b.example/s"]
    assert t["seed_rank"].to_pylist() == [0, 1]
