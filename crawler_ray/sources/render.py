"""Warm renderer actor-pool stage (S3 / ST3).

The reference's Selenium sources launch a FRESH headless Chrome per
document (``pygdpr/models/dpa/denmark/__init__.py:104-118``: new
``webdriver.Chrome`` inside the per-page loop, then an ``ajaxhost``
element wait) — browser startup dominates the fetch. The engine's
form is the actor-pool rule (ST7): the browser is constructed ONCE
per actor in ``__init__`` and reused for every batch, so a pool of
``concurrency=N`` renderers serves the whole crawl:

    ds.map_batches(RenderStage, concurrency=N, batch_size=B,
                   num_cpus=1, batch_format="pyarrow")

There is no browser (or network) in this sandbox, so the default
backend is :class:`FakeBrowser` — a deterministic stand-in that
models exactly the behavior the reference needs the browser for:
script-driven content that is absent from the raw html until the
page "runs". Fixture pages embed their post-JS DOM as

    <script type="application/x-fixture-ajax">...markup...</script>

and rendering splices that payload into the document (the ajaxhost
pattern). A real deployment passes ``browser_factory=`` returning an
object with the same ``render(url, html) -> bytes`` contract (e.g. a
Selenium driver wrapper whose ``render`` does ``driver.get`` + wait +
``page_source``); the import-try for selenium is left to that
factory, keeping this module dependency-free.
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray

__all__ = ["FakeBrowser", "RenderStage", "AJAX_SCRIPT_RE",
           "RenderActor", "make_render_pool"]

AJAX_SCRIPT_RE = re.compile(
    rb'<script type="application/x-fixture-ajax">(.*?)</script>',
    re.DOTALL)


class FakeBrowser:
    """Deterministic renderer: splices every fixture-ajax payload into
    the DOM in place of its script tag — the post-JS document the
    reference reads off the live driver. Counts lifetime page loads so
    tests can assert the warm-reuse property."""

    def __init__(self) -> None:
        self.launches = 1          # a real browser would boot here
        self.pages_rendered = 0

    def render(self, url: str, html: bytes | None) -> bytes | None:
        self.pages_rendered += 1
        if not html:
            return html
        return AJAX_SCRIPT_RE.sub(lambda m: m.group(1), html)


class RenderStage:
    """``map_batches`` callable class: html → rendered html (column
    replaced in place; all other columns pass through untouched)."""

    def __init__(self, browser_factory=None, html_col: str = "html",
                 url_col: str = "url"):
        self.browser = (browser_factory or FakeBrowser)()   # once per actor
        self.html_col, self.url_col = html_col, url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch[self.url_col].to_pylist()
        htmls = batch[self.html_col].to_pylist()
        rendered = [self.browser.render(u, h) for u, h in zip(urls, htmls)]
        i = batch.schema.get_field_index(self.html_col)
        return batch.set_column(i, self.html_col,
                                pa.array(rendered, pa.binary()))


@ray.remote
class RenderActor:
    """The crawl engine's warm-browser handle: one long-lived browser
    per actor (ST3), shared by every parse task of the run — vs the
    reference's fresh ``webdriver.Chrome`` per document
    (denmark:104-118). Tables travel packed (IPC bytes) because actor
    args don't zero-copy Arrow the way ``map_batches`` blocks do."""

    def __init__(self, browser_factory=None):
        self.stage = RenderStage(browser_factory)

    def render_packed(self, packed: bytes) -> bytes:
        from crawler_ray.sources.pages import pack, unpack
        return pack(self.stage(unpack(packed)))

    def stats(self) -> dict:
        b = self.stage.browser
        return {"launches": getattr(b, "launches", None),
                "pages_rendered": getattr(b, "pages_rendered", None)}


def make_render_pool(n: int, browser_factory=None) -> list:
    """``n`` warm renderer actors (the engine-wide browser budget —
    a real deployment sizes this to licensed browser seats / memory,
    NOT to crawl width)."""
    return [RenderActor.remote(browser_factory) for _ in range(n)]
