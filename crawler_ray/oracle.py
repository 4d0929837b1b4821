"""Sequential in-repo oracle crawler (SURVEY.md §5 golden oracle).

A deliberately simple, single-threaded crawler over the synthetic
``pages``/``seeds``/``robots`` tables implementing the **crawl
semantics contract** below. The Ray engine
(:mod:`crawler_ray.pipelines.crawl`) must produce (a) the identical
final URL-seen set, (b) an identical crawl log when sorted by the
logical order key, and (c) byte-identical extracted text per url.
This mirrors how the reference's correctness is defined by its
sequential loops (``gdprCrawler.py:212-287``,
``austria/__init__.py:67-153``) — but with the north_rule additions
(robots, politeness budget, priority frontier) included.

Crawl semantics contract
========================

1. **Identity**: a URL's identity is ``canonicalize(url)``
   (:mod:`crawler_ray.urlnorm`). The seen set contains every URL ever
   *scheduled* (pushed to the frontier), so no URL is fetched twice.
2. **Robots**: a URL whose path starts with any of its host's
   ``disallow_prefixes`` is never scheduled (counted in metrics).
3. **Politeness**: crawling proceeds in *waves* (global barriers)
   inside simulated time *windows* of ``round_ms``. Per window a
   host may be fetched at most ``budget = round_ms //
   crawl_delay_ms`` times (``politeness_cap`` when the delay is 0);
   the budget is consumed across the window's waves. When every
   host with frontier entries has exhausted its budget, the window
   advances and budgets reset. (Waves, not whole-window rounds, so
   that pagination chains — which reveal one next-page per fetch —
   can be walked several links per window; the reference walks them
   in an inner ``while has_next`` loop, ``austria:72-152``.)
4. **Priority**: within a host, frontier entries pop in ascending
   ``(depth, parent_order, dom_idx)`` order — depth-first discovery
   ranking equivalent to the reference's sequential page→result order
   (§2.6 O4). ``parent_order`` is the pop-rank of the page that
   discovered the URL (−1 for seeds, where ``dom_idx = seed_rank``);
   ``dom_idx`` is the link's index within the discovering page
   (listing rows first, then the next-page link, then out-links).
5. **Pop ranks**: after a wave's pops are determined, the popped
   set is sorted by ``(host, depth, parent_order, dom_idx)`` and
   assigned consecutive global ranks — this is the logical crawl
   order that the engine must reproduce (it does not depend on
   physical execution order).
6. **Duplicate discovery**: a URL discovered multiple times in one
   wave keeps the smallest ``(depth, parent_order, dom_idx)`` key.
7. **Listing rows** whose date parses *outside* the GDPR retain
   window are not scheduled (reference skips the fetch, M5);
   unparseable/empty dates are scheduled (NoDate semantics).
8. **Docs** are emitted from fetched HTML detail pages (title = h1,
   date = the ``Released`` meta line), deduped on the composite key
   ``(md5(title), release_date)`` keeping the earliest pop_rank
   (``denmark:135-140`` collision rule), and date-window filtered.
   Binary/empty payloads yield no doc (extraction stub; metrics
   count them).
9. **Pipelined visibility**: URLs discovered (and admitted to the
   seen set) in wave ``w`` become *poppable* at wave ``w + P``
   (``P = pipeline_depth``). A wave whose pops are empty while
   not-yet-visible entries exist is a **bubble**: the wave counter
   advances, nothing is logged, window budgets are untouched. The
   window advances only when no staged entries remain and every
   active host is budget-exhausted. This makes wave composition a
   pure function of the data, so the Ray engine may keep several
   fetch+parse waves physically in flight and still match this
   oracle bit-for-bit. (Seen-set admission — and therefore dup
   counting — happens at discovery commit, not at visibility.)
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import pyarrow as pa

from crawler_ray.extract import parse_page
from crawler_ray.functions.dates import PINNED_NOW, parse_date_multi, GDPR_DATE
from crawler_ray.functions.hashing import md5_hex
from crawler_ray.urlnorm import canonicalize, host_of, join_url, path_of

__all__ = ["CrawlParams", "OracleResult", "crawl_oracle"]


@dataclass
class CrawlParams:
    round_ms: int = 60_000
    politeness_cap: int = 10_000
    max_depth: int | None = None
    pipeline_depth: int = 3        # wave visibility lag P (rule 9); must
                                   # match CrawlConfig.pipeline_depth
    now = PINNED_NOW


@dataclass
class OracleResult:
    seen: set                       # canonical urls ever scheduled
    crawl_log: list                 # dicts, in pop_rank order
    docs: list                      # dicts, deduped + filtered
    metrics: dict

    def crawl_log_table(self) -> pa.Table:
        return pa.table({k: [r[k] for r in self.crawl_log]
                         for k in ("pop_rank", "wave", "window", "url", "host",
                                   "depth", "parent_order", "dom_idx", "status",
                                   "kind")})


def _date_in_window(date_str: str, now) -> bool | None:
    """True/False when parseable, None when not (NoDate)."""
    d = parse_date_multi(date_str)
    if d is None:
        return None
    margin = now - GDPR_DATE
    return GDPR_DATE <= d <= now + margin


def crawl_oracle(pages: pa.Table, seeds: pa.Table, robots: pa.Table,
                 params: CrawlParams | None = None) -> OracleResult:
    params = params or CrawlParams()
    page_by_url = {}
    for i, u in enumerate(pages["url"].to_pylist()):
        page_by_url[canonicalize(u)] = i
    htmls = pages["html"].to_pylist()
    robots_by_host = {h: (list(d or []), int(c)) for h, d, c in zip(
        robots["host"].to_pylist(),
        robots["disallow_prefixes"].to_pylist(),
        robots["crawl_delay_ms"].to_pylist())}

    def allowed(url: str) -> bool:
        prefixes = robots_by_host.get(host_of(url), ([], 0))[0]
        path = path_of(url)
        return not any(path.startswith(p) for p in prefixes)

    def budget(host: str) -> int:
        delay = robots_by_host.get(host, ([], 0))[1]
        if delay <= 0:
            return params.politeness_cap
        return max(1, min(params.politeness_cap, params.round_ms // delay))

    seen: set[str] = set()
    frontiers: dict[str, list] = {}      # host -> heap of (depth, parent, dom, url)
    metrics = {"robots_excluded": 0, "date_filtered": 0, "dup_discovery": 0,
               "fetched": 0, "missing": 0, "docs_emitted": 0,
               "docs_deduped": 0, "nonhtml": 0}

    staged: dict[int, list] = {}     # visible_wave -> [(depth, parent, dom, url)]

    def schedule(url: str, depth: int, parent_order: int, dom_idx: int,
                 visible_from: int) -> None:
        cu = canonicalize(url)
        if cu in seen:
            metrics["dup_discovery"] += 1
            return
        if not allowed(cu):
            metrics["robots_excluded"] += 1
            return
        if params.max_depth is not None and depth > params.max_depth:
            return
        seen.add(cu)
        staged.setdefault(visible_from, []).append(
            (depth, parent_order, dom_idx, cu))

    def activate(wave: int) -> None:
        for v in [v for v in staged if v <= wave]:
            for depth, parent, dom, cu in staged.pop(v):
                heapq.heappush(frontiers.setdefault(host_of(cu), []),
                               (depth, parent, dom, cu))

    for rank, url in zip(seeds["seed_rank"].to_pylist(), seeds["url"].to_pylist()):
        schedule(url, 0, -1, int(rank), 0)

    crawl_log: list[dict] = []
    docs_by_key: dict[tuple, dict] = {}
    pop_rank = 0
    wave = 0
    window = 0
    budgets: dict[str, int] = {}     # host -> remaining budget this window
    last_nonempty = -1
    while any(frontiers.values()) or staged:
        activate(wave)               # rule 9: entries visible at this wave
        popped: list[tuple] = []     # (host, depth, parent, dom, url)
        for host in sorted(frontiers):
            heap = frontiers[host]
            rem = budgets.setdefault(host, budget(host))
            take = min(rem, len(heap))
            budgets[host] = rem - take
            for _ in range(take):
                depth, parent, dom, url = heapq.heappop(heap)
                popped.append((host, depth, parent, dom, url))
        if not popped:
            # rule 9 bubble: any wave in (wave-P, wave) popped rows —
            # its discoveries may not be visible yet
            if last_nonempty > wave - params.pipeline_depth:
                wave += 1
                continue
            window += 1              # every pending host exhausted → next window
            budgets = {}
            continue
        last_nonempty = wave
        popped.sort()                # (host, depth, parent_order, dom_idx) — rule 5
        discoveries: list[tuple] = []
        for host, depth, parent, dom, url in popped:
            my_rank = pop_rank
            pop_rank += 1
            idx = page_by_url.get(url)
            if idx is None:
                crawl_log.append(dict(pop_rank=my_rank, wave=wave, window=window,
                                      url=url, host=host, depth=depth,
                                      parent_order=parent, dom_idx=dom,
                                      status=404, kind="missing"))
                metrics["missing"] += 1
                continue
            page = parse_page(htmls[idx])
            metrics["fetched"] += 1
            crawl_log.append(dict(pop_rank=my_rank, wave=wave, window=window,
                                  url=url, host=host, depth=depth,
                                  parent_order=parent, dom_idx=dom,
                                  status=200, kind=page.kind))
            di = 0
            for title, date_str, href in page.results:
                w = _date_in_window(date_str, params.now)
                if w is False:
                    metrics["date_filtered"] += 1
                    di += 1
                    continue
                discoveries.append((join_url(url, href), depth + 1, my_rank, di))
                di += 1
            if page.next_href:
                discoveries.append((join_url(url, page.next_href), depth + 1,
                                    my_rank, di))
                di += 1
            for link in page.out_links:
                discoveries.append((join_url(url, link), depth + 1, my_rank, di))
                di += 1
            if page.kind == "detail":
                lines = page.text.split("\n")
                title = lines[0] if lines else ""
                date_str = ""
                for ln in lines[1:2]:
                    if ln.startswith("Released "):
                        date_str = ln[len("Released "):]
                d = parse_date_multi(date_str)
                if _date_in_window(date_str, params.now):
                    key = (md5_hex(title), d.isoformat())
                    metrics["docs_emitted"] += 1
                    if key not in docs_by_key:
                        docs_by_key[key] = dict(
                            doc_hash=key[0], url=url, host=host, title=title,
                            release_date=d, text=page.text, pop_rank=my_rank)
                    else:
                        metrics["docs_deduped"] += 1
                else:
                    metrics["date_filtered"] += 1
            elif page.kind in ("binary", "empty"):
                metrics["nonhtml"] += 1
        # rule 6: smallest key wins for same-round duplicate discoveries
        canon = [(canonicalize(u), depth, parent, dom)
                 for u, depth, parent, dom in discoveries]
        canon.sort()
        last = None
        for cu, depth, parent, dom in canon:
            if cu == last:
                metrics["dup_discovery"] += 1
                continue
            last = cu
            schedule(cu, depth, parent, dom, wave + params.pipeline_depth)
        wave += 1

    docs = sorted(docs_by_key.values(), key=lambda d: d["pop_rank"])
    return OracleResult(seen=seen, crawl_log=crawl_log, docs=docs,
                        metrics=metrics)
