"""SourceSpec registry — the engine's scraper plugin API (SURVEY §2.9).

The reference adds a crawl source by subclassing ``DPA`` and
implementing ``update_pagination`` / ``get_source`` / ``get_docs_*``
(~100 hand-written methods across 28 modules,
``pygdpr/models/dpa/__init__.py:525-593``). Here a source is **plain
data + two optional callables**, selected per-row by host inside the
parse stage — adding a source is one ``register()`` call, no new
pipeline code:

- ``page_parser``:  ``bytes -> ParsedPage`` — how to read this
  source's listing/detail structure (default: the engine contract in
  :mod:`crawler_ray.extract`);
- ``text_extractor``: ``bytes -> str`` — the byte-stable text rule
  for this source (default: the contract extractor; per-source
  overrides model the reference's per-DPA container classes,
  ``denmark:147-156`` vs ``austria:270-291``);
- ``pagination``: ``"forward"`` or ``"backward"`` (``italy/__init__
  .py:63-96`` walks last→first; the priority frontier realizes this
  through the discovery keys, so the flag is advisory metadata);
- ``seed_urls`` / ``doc_types``: catalog data (``crawler-ref.csv``).

The registry itself is a module-level dict keyed by host; it is
plain picklable data, so ``map_batches`` workers see whatever was
registered before the stage was built (pass a custom mapping to
``ParseStage(registry=...)`` for isolated pipelines).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

__all__ = ["SourceSpec", "register", "spec_for_host", "default_spec",
           "registered_hosts", "clear_registry"]


@dataclass(frozen=True)
class SourceSpec:
    source_id: str
    hosts: tuple = ()
    seed_urls: tuple = ()
    doc_types: tuple = ()
    pagination: str = "forward"            # forward | backward
    page_parser: Callable | None = None    # bytes -> ParsedPage
    text_extractor: Callable | None = None  # bytes -> str
    #: script-driven source (denmark:104-118 — content arrives via an
    #: AJAX load the raw fetch can't see): the crawl routes this
    #: host's fetched pages through the warm render actor pool before
    #: parsing. The reference booted a fresh headless Chrome PER
    #: DOCUMENT; the engine renders on ``render_pool`` long-lived
    #: browsers.
    needs_render: bool = False
    #: API-backed source (france:61-134): document fetches carry a
    #: broker-issued bearer token (see ``sources/tokens.py``); the
    #: value names the credential so several sources can share one
    #: broker. None = plain fetch.
    auth: str | None = None


_DEFAULT = SourceSpec(source_id="default")
_REGISTRY: dict[str, SourceSpec] = {}


def default_spec() -> SourceSpec:
    return _DEFAULT


def register(spec: SourceSpec) -> SourceSpec:
    for h in spec.hosts:
        _REGISTRY[h] = spec
    return spec


def spec_for_host(host: str | None,
                  registry: dict[str, SourceSpec] | None = None
                  ) -> SourceSpec:
    table = _REGISTRY if registry is None else registry
    return table.get(host or "", _DEFAULT)


def registered_hosts() -> list[str]:
    return sorted(_REGISTRY)


def clear_registry() -> None:
    _REGISTRY.clear()
