"""Warm renderer actor-pool stage (S3/ST3): script-driven content
becomes parseable only after rendering; the browser boots once per
actor, not once per page (the reference boots Chrome per document)."""

import pyarrow as pa
import pytest

AJAX_PAGE = (
    b'<html><body><div class="content"><p>shell</p></div>'
    b'<script type="application/x-fixture-ajax">'
    b'<ul><li class="result"><a class="doclink" href="/doc/1">Doc One</a>'
    b'<span class="date">2021-03-15</span></li></ul>'
    b"</script></body></html>")


def test_render_exposes_ajax_content():
    from crawler_ray.extract import parse_page
    from crawler_ray.sources.render import RenderStage

    # unrendered: the ajax markup sits inert inside the script tag
    assert parse_page(AJAX_PAGE).results == []
    st = RenderStage()
    out = st(pa.table({
        "url": pa.array(["https://h/x"], pa.string()),
        "html": pa.array([AJAX_PAGE], pa.binary()),
    }))
    page = parse_page(out["html"][0].as_py())
    assert page.results == [("Doc One", "2021-03-15", "/doc/1")]


def test_browser_warm_across_batches():
    from crawler_ray.sources.render import RenderStage
    st = RenderStage()
    for _ in range(4):
        st(pa.table({"url": pa.array(["u"], pa.string()),
                     "html": pa.array([AJAX_PAGE], pa.binary())}))
    assert st.browser.launches == 1          # ONE boot, many pages
    assert st.browser.pages_rendered == 4


def test_render_stage_in_dataset_pipeline(ray_session):
    import ray

    from crawler_ray.sources.render import RenderStage
    from crawler_ray.stages.parse import ParseStage

    ds = ray.data.from_arrow(pa.table({
        "url": pa.array([f"https://h/{i}" for i in range(8)], pa.string()),
        "host": pa.array(["h"] * 8, pa.string()),
        "html": pa.array([AJAX_PAGE] * 8, pa.binary()),
    }))
    out = (ds.map_batches(RenderStage, batch_format="pyarrow",
                          batch_size=2, concurrency=2)
           .map_batches(ParseStage, batch_format="pyarrow",
                        concurrency=2)
           .to_pandas())
    assert len(out) == 8
    assert (out["kind"] == "listing").all()
    assert all(ls == ["https://h/doc/1"] for ls in out["link_url"])
