"""Deterministic synthetic web corpus generator (FIXTURES.md §1-3).

Generates the ``pages`` / ``seeds`` / ``robots`` Parquet tables that
stand in for the live DPA websites the reference crawls. Everything
derives from ``(seed, scale)`` — no wall clock, no unseeded RNG
(the reference violates this at
``services/document_key_service.py:23`` and
``specifications/should_retain_document_specification.py:6-7``).

The web model mirrors the reference's site shapes:

- per-host chained listing pages with N result rows each (title +
  mixed-format date string + detail href) and a next-page link
  (forward pagination ``austria/__init__.py:27-53``; some hosts
  enumerate backwards, ``italy/__init__.py:63-96``);
- detail pages with a text container and 0-3 out-links (some
  cross-host) — ``denmark/__init__.py:147-156``;
- ~10% pre-2018 dates (date-window filter M5), ~1% duplicate titles
  with different dates (composite-key dedup, ``denmark:135-140``),
  ~3% dead hrefs (404 path, ``austria:60-65`` skip semantics),
  ~5% non-HTML payloads (%PDF magic) and ~2% empty bodies;
- a Zipf-ish host-size skew: 2 "mega hosts" own ~40% of pages
  (models the EDPB / Czech 1,474-LoC scrapers);
- per-host robots rules + crawl delays (north_rule addition — the
  reference has none).

The ``text`` column is the **oracle extracted text**, computed
directly from the abstract page model by the same line rules
``crawler_ray.extract`` implements over the rendered HTML — the
engine's extractor output must be byte-identical per url.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["WebConfig", "SyntheticWeb", "generate", "write_fixture",
           "write_fixture_parts", "SCALES", "HOST_COUNTS"]

SCALES = {"t1": 2_000, "t2": 20_000, "bench": 200_000,
          "scale": 1_500_000, "scale4": 4_500_000}
HOST_COUNTS = {"t1": 16, "t2": 64, "bench": 256, "scale": 1024,
               "scale4": 2048}

_LANGS = ["de", "da", "en", "fr", "bg", "hr", "el", "cz", "et", "fi", "hu",
          "it", "lv", "nl", "pl", "pt", "ro", "sk", "sl", "es", "se"]
_DOC_TYPES = ["Decisions", "Annual Reports", "Guidelines", "Recommendations",
              "Opinions", "Notices", "Judgements", "Press Releases"]
_DATE_FMTS = ["%d.%m.%Y", "%d-%m-%Y", "%Y-%m-%d"]   # austria:91, denmark:125, edpb:104
_VOCAB = ("data protection authority decision regulation processing consent "
          "controller processor breach fine supervisory complaint appeal "
          "lawful basis transfer adequacy erasure rectification portability "
          "officer assessment legitimate interest notification security "
          "measure pseudonymisation directive enforcement audit registry").split()
_TOPICS = ("cookies marketing employees video surveillance health records "
           "credit scoring telecom retention biometrics advertising minors "
           "insurance banking education housing transport energy").split()

_EPOCH_2016 = np.datetime64("2016-01-01").astype("datetime64[D]").astype(int)
_WARC_BASE_US = np.datetime64("2021-01-01T00:00:00", "us").astype(np.int64)


@dataclass
class WebConfig:
    seed: int = 42
    n_pages: int = 2_000            # approximate total page count
    n_hosts: int = 64
    results_per_listing: int = 10
    dead_link_rate: float = 0.03
    nonhtml_rate: float = 0.05
    empty_rate: float = 0.02
    pre2018_rate: float = 0.10
    nodate_rate: float = 0.02
    dup_title_rate: float = 0.01
    private_rate: float = 0.05      # details under a robots-disallowed prefix
    cross_host_link_rate: float = 0.20
    # skew-exhibit knobs (round-5 verdict #3): a crawl fixture where
    # ONE host owns mega_host_share of all detail pages (0 = keep the
    # default 2×20% + zipf shape), or a perfectly flat host split
    # (uniform_hosts — the equal-volume control for the skew A/B), and
    # a global duplicate cluster owning dup_cluster_share of all
    # details (one title+date shared across hosts — the spam-cluster
    # shape that stresses dedup bucketing)
    mega_host_share: float = 0.0
    uniform_hosts: bool = False
    dup_cluster_share: float = 0.0
    # disjoint URL namespaces for multi-part generation: part k of a
    # composite fixture uses host_offset = k * n_hosts so the parts'
    # host names (and hence every URL) never collide — the scale16
    # horizon tier is 4 scale4-shaped parts generated in parallel
    host_offset: int = 0
    chain_max: int = 30             # max pagination-chain length; hosts with
                                    # more listing pages get an archive-index
                                    # page linking to chain heads (EDPB-style
                                    # archive; keeps crawl depth O(chain_max)
                                    # instead of O(n_pages/host) — a 3,500-page
                                    # chain would serialize the whole crawl)


@dataclass
class Detail:
    url: str
    title: str
    date_str: str                  # "" = NoDate
    date_ord: int                  # days since 2016-01-01; -1 = none
    paras: list
    out_links: list = field(default_factory=list)
    payload: str = "html"          # html | binary | empty


@dataclass
class Listing:
    url: str
    page_idx: int
    rows: list = field(default_factory=list)   # (title, date_str, href)
    next_href: str | None = None


@dataclass
class Host:
    idx: int
    name: str
    lang: str
    fmt: str
    backwards: bool
    crawl_delay_ms: int
    disallow: list
    details: list = field(default_factory=list)
    listings: list = field(default_factory=list)
    seed_url: str = ""


class SyntheticWeb:
    """The abstract model + its rendered Arrow tables."""

    def __init__(self, cfg: WebConfig):
        self.cfg = cfg
        self.hosts: list[Host] = []
        self._build_model()

    # -- model ------------------------------------------------------------
    def _host_weights(self) -> np.ndarray:
        n = self.cfg.n_hosts
        w = np.zeros(n)
        if self.cfg.uniform_hosts:
            w[:] = 1.0 / n
            return w
        if self.cfg.mega_host_share > 0:
            # skew exhibit: host 0 owns the given share outright; the
            # remaining hosts split the rest zipf-style
            w[0] = self.cfg.mega_host_share
            idx = np.arange(1, n, dtype=float)
            z = 1.0 / idx
            w[1:] = (1.0 - w[0]) * z / z.sum()
            return w / w.sum()
        w[: min(2, n)] = 0.20
        rest = np.arange(1, n - min(2, n) + 1, dtype=float)
        if len(rest):
            z = 1.0 / rest
            w[min(2, n):] = 0.60 * z / z.sum()
        return w / w.sum()

    def _build_model(self) -> None:
        cfg = self.cfg
        rng = np.random.default_rng(cfg.seed)
        n_details_total = max(cfg.n_hosts, int(cfg.n_pages * 0.88))
        weights = self._host_weights()
        counts = np.maximum(1, (weights * n_details_total).astype(int))

        for i in range(cfg.n_hosts):
            self.hosts.append(Host(
                idx=i,
                name=f"host{i + cfg.host_offset:03d}.example.org",
                lang=_LANGS[i % len(_LANGS)],
                fmt=_DATE_FMTS[i % len(_DATE_FMTS)],
                backwards=(i % 5 == 3),
                crawl_delay_ms=[0, 100, 250, 500][i % 4],
                disallow=(["/private/"] if i % 3 == 0 else []),
            ))

        # details per host
        all_details: list[tuple[int, int]] = []     # (host_idx, detail_idx)
        for h, c in zip(self.hosts, counts):
            prev_titles: list[tuple[str, str, int]] = []
            for j in range(int(c)):
                private = (h.disallow and rng.random() < self.cfg.private_rate)
                prefix = "/private/doc/" if private else "/doc/"
                url = f"https://{h.name}{prefix}{j}"
                # global dup cluster (skew exhibit): one title + one
                # date + one body shared across hosts. Guarded by the
                # short-circuit so the RNG draw sequence — and hence
                # every existing fixture — is untouched when the knob
                # is off.
                if cfg.dup_cluster_share > 0 \
                        and rng.random() < cfg.dup_cluster_share:
                    d = (np.datetime64("2016-01-01")
                         + np.timedelta64(1500, "D")).astype("datetime64[D]")
                    h.details.append(Detail(
                        url, "Decision cluster-0 on cookies",
                        d.astype(object).strftime(h.fmt), 1500,
                        [" ".join(_VOCAB[k % len(_VOCAB)]
                                  for k in range(17))]))
                    all_details.append((h.idx, j))
                    continue
                reuse_date = None
                if prev_titles and rng.random() < cfg.dup_title_rate:
                    # duplicate title — half with a different date
                    # (composite-key rule, denmark:135-140), half with the
                    # SAME date (true duplicate → deduped)
                    title, pd_str, pd_ord = prev_titles[int(rng.integers(len(prev_titles)))]
                    if rng.random() < 0.5 and pd_ord >= 0:
                        reuse_date = (pd_str, pd_ord)
                else:
                    topic = _TOPICS[int(rng.integers(len(_TOPICS)))]
                    title = f"Decision {h.idx:03d}-{j:05d} on {topic}"
                if reuse_date is not None:
                    date_str, date_ord = reuse_date
                elif rng.random() < cfg.nodate_rate:
                    date_str, date_ord = "", -1
                else:
                    if rng.random() < cfg.pre2018_rate:
                        day = int(rng.integers(0, 870))          # 2016..mid-2018
                    else:
                        day = int(rng.integers(880, 3100))       # mid-2018..2024
                    d = (np.datetime64("2016-01-01") +
                         np.timedelta64(day, "D")).astype("datetime64[D]")
                    py = d.astype(object)
                    date_str, date_ord = py.strftime(h.fmt), day
                prev_titles.append((title, date_str, date_ord))
                n_paras = 1 + int(rng.integers(0, 4))
                paras = [" ".join(_VOCAB[int(k)] for k in
                                  rng.integers(0, len(_VOCAB), 8 + int(rng.integers(0, 18))))
                         for _ in range(n_paras)]
                r = rng.random()
                payload = "binary" if r < cfg.nonhtml_rate else (
                    "empty" if r < cfg.nonhtml_rate + cfg.empty_rate else "html")
                h.details.append(Detail(url, title, date_str, date_ord, paras,
                                        payload=payload))
                all_details.append((h.idx, j))

        # out-links (0-3, some cross-host) — drawn after all details exist
        for h in self.hosts:
            for d in h.details:
                for _ in range(int(rng.integers(0, 4))):
                    if rng.random() < cfg.cross_host_link_rate:
                        hi, di = all_details[int(rng.integers(len(all_details)))]
                        target = self.hosts[hi].details[di].url
                    else:
                        target = h.details[int(rng.integers(len(h.details)))].url
                    d.out_links.append(target)

        # listings: chain per host; each page lists its slice of details
        rpl = cfg.results_per_listing
        for h in self.hosts:
            n_list = max(1, -(-len(h.details) // rpl))
            for k in range(n_list):
                url = f"https://{h.name}/list/{k}"
                rows = []
                for d in h.details[k * rpl:(k + 1) * rpl]:
                    href = d.url if rng.random() < 0.5 else \
                        d.url.replace(f"https://{h.name}", "")   # relative form
                    if rng.random() < cfg.dead_link_rate:
                        href = f"/doc/missing-{int(rng.integers(10**6))}"
                    rows.append((d.title, d.date_str, href))
                if k > 0 and rng.random() < 0.5 and h.details[(k - 1) * rpl:k * rpl]:
                    # duplicate link across pages (pagination dedup,
                    # pagination/__init__.py:6-9)
                    dprev = h.details[(k - 1) * rpl]
                    rows.append((dprev.title, dprev.date_str, dprev.url))
                # pagination chains run within a chain_max-sized group;
                # forward hosts chain head→tail, backwards hosts tail→head
                # (italy/__init__.py:63-96)
                cm = cfg.chain_max
                g0, g1 = (k // cm) * cm, min((k // cm) * cm + cm, n_list)
                if h.backwards:
                    nxt = f"/list/{k - 1}" if k > g0 else None
                else:
                    nxt = f"/list/{k + 1}" if k < g1 - 1 else None
                h.listings.append(Listing(url, k, rows, nxt))
            n_groups = -(-n_list // cfg.chain_max)
            if n_groups > 1:
                # archive-index page listing each group's entry page
                rows = []
                for g in range(n_groups):
                    g0, g1 = g * cfg.chain_max, min((g + 1) * cfg.chain_max, n_list)
                    head = g1 - 1 if h.backwards else g0
                    rows.append((f"Archive section {g}", "", f"/list/{head}"))
                idx_url = f"https://{h.name}/list/index"
                h.listings.append(Listing(idx_url, n_list, rows, None))
                h.seed_url = idx_url
            else:
                h.seed_url = (f"https://{h.name}/list/{n_list - 1}" if h.backwards
                              else f"https://{h.name}/list/0")

    # -- rendering (must agree with crawler_ray.extract contract) ---------
    @staticmethod
    def _render_listing(lst: Listing) -> tuple[bytes, str]:
        rows_html, lines = [], [f"Decisions page {lst.page_idx}"]
        for title, date_str, href in lst.rows:
            rows_html.append(
                f'<li class="result"><a class="doclink" href="{href}">{title}</a> '
                f'<span class="date">{date_str}</span></li>')
            lines.append(f"{title} {date_str}".strip())
        nav = ""
        if lst.next_href:
            nav = f'<a class="next" href="{lst.next_href}">More results</a>'
            lines.append("More results")
        html = (
            "<html><head><title>listing</title></head><body>"
            '<div class="header">site chrome ignored</div>'
            f'<div class="content"><h1>Decisions page {lst.page_idx}</h1>'
            f'<ul class="results">{"".join(rows_html)}</ul>{nav}</div>'
            "</body></html>")
        return html.encode("utf-8"), "\n".join(lines)

    @staticmethod
    def _render_detail(d: Detail) -> tuple[bytes, str]:
        if d.payload == "binary":
            return b"%PDF-1.4\n% synthetic binary payload\n" + d.title.encode(), ""
        if d.payload == "empty":
            return b"", ""
        lines = [d.title]
        body = [f"<h1>{d.title}</h1>"]
        if d.date_str:
            body.append(f'<p class="meta">Released {d.date_str}</p>')
            lines.append(f"Released {d.date_str}")
        for para in d.paras:
            body.append(f"<p>{para}</p>")
            lines.append(para)
        for n, link in enumerate(d.out_links):
            body.append(f'<p class="related"><a class="outlink" href="{link}">'
                        f"Related decision {n}</a></p>")
            lines.append(f"Related decision {n}")
        html = ("<html><head><title>doc</title></head><body>"
                '<div class="sidebar">nav noise</div>'
                f'<div class="content">{"".join(body)}</div>'
                "</body></html>")
        return html.encode("utf-8"), "\n".join(lines)

    # -- tables -----------------------------------------------------------
    def pages_table(self) -> pa.Table:
        urls, htmls, texts, langs = [], [], [], []
        order = []                       # (host_idx, page_seq) for interleaved ts
        for h in self.hosts:
            seq = 0
            for lst in h.listings:
                html, text = self._render_listing(lst)
                urls.append(lst.url); htmls.append(html); texts.append(text)
                langs.append(h.lang); order.append((seq, h.idx)); seq += 1
            for d in h.details:
                html, text = self._render_detail(d)
                urls.append(d.url); htmls.append(html); texts.append(text)
                langs.append(h.lang); order.append((seq, h.idx)); seq += 1
        # warc_ts: monotone per host, interleaved across hosts
        rank = np.lexsort((np.array([o[1] for o in order]),
                           np.array([o[0] for o in order])))
        ts = np.empty(len(urls), dtype=np.int64)
        ts[rank] = _WARC_BASE_US + np.arange(len(urls), dtype=np.int64) * 1_000_000
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        })

    def seeds_table(self) -> pa.Table:
        return pa.table({
            "url": pa.array([h.seed_url for h in self.hosts]),
            "source": pa.array([h.name for h in self.hosts]),
            "doc_type": pa.array([_DOC_TYPES[h.idx % len(_DOC_TYPES)]
                                  for h in self.hosts]),
            "seed_rank": pa.array([h.idx for h in self.hosts], pa.int32()),
        })

    def robots_table(self) -> pa.Table:
        return pa.table({
            "host": pa.array([h.name for h in self.hosts]),
            "disallow_prefixes": pa.array([h.disallow for h in self.hosts],
                                          pa.list_(pa.string())),
            "crawl_delay_ms": pa.array([h.crawl_delay_ms for h in self.hosts],
                                       pa.int32()),
        })


def generate(scale: str = "t1", seed: int = 42, **overrides) -> SyntheticWeb:
    kw = {"n_pages": SCALES[scale], "n_hosts": HOST_COUNTS[scale]}
    if scale.startswith("scale"):
        # throughput-bench shape: wide listings / shallow chains so
        # waves are dominated by parallel parse work, not by the
        # inherently serial next-page discovery latency (deep chains
        # bound ANY crawler's scaling — breadth is what scales)
        kw.update({"results_per_listing": 40, "chain_max": 8})
    kw.update(overrides)
    return SyntheticWeb(WebConfig(seed=seed, **kw))


def _write_part(args: tuple) -> str:
    """Generate ONE part of a composite fixture (own process — the
    model build is single-threaded Python, so parts parallelize
    perfectly across processes)."""
    out_dir, scale, seed, k, n_hosts, overrides = args
    path = os.path.join(out_dir, f"pages_part-{k}.parquet")
    if os.path.exists(path + ".done"):
        return path
    web = generate(scale, seed + k, host_offset=k * n_hosts, **overrides)
    pq.write_table(web.pages_table(), path, row_group_size=4096)
    pq.write_table(web.seeds_table(),
                   os.path.join(out_dir, f"seeds_part-{k}.parquet"))
    pq.write_table(web.robots_table(),
                   os.path.join(out_dir, f"robots_part-{k}.parquet"))
    with open(path + ".done", "w") as f:
        f.write("ok\n")
    return path


def write_fixture_parts(out_dir: str, scale: str = "scale4",
                        n_parts: int = 4, seed: int = 42,
                        **overrides) -> list:
    """Composite fixture: ``n_parts`` independently-generated webs
    with disjoint host namespaces (``host_offset``), built in parallel
    processes. Returns the list of pages part files; seeds/robots are
    merged into the usual single files. This is how the 16M-page
    ``scale16`` horizon tier is built — one 16M-page model would need
    a single ~1-hour single-threaded build and a >40 GB driver heap."""
    from concurrent.futures import ProcessPoolExecutor
    marker = os.path.join(out_dir, "_DONE_PARTS")
    hosts_per_part = HOST_COUNTS[scale]
    paths = [os.path.join(out_dir, f"pages_part-{k}.parquet")
             for k in range(n_parts)]
    if os.path.exists(marker):
        return paths
    os.makedirs(out_dir, exist_ok=True)
    jobs = [(out_dir, scale, seed, k, hosts_per_part, overrides)
            for k in range(n_parts)]
    with ProcessPoolExecutor(max_workers=n_parts) as ex:
        list(ex.map(_write_part, jobs))
    for name in ("seeds", "robots"):
        parts = [pq.read_table(os.path.join(out_dir,
                                            f"{name}_part-{k}.parquet"))
                 for k in range(n_parts)]
        pq.write_table(pa.concat_tables(parts),
                       os.path.join(out_dir, f"{name}.parquet"))
    with open(marker, "w") as f:
        f.write("ok\n")
    return paths


def write_documents_fixture(out_dir: str, n_docs: int = 40_000,
                            dup_cluster_share: float = 0.0,
                            dup_pair_share: float = 0.0,
                            seed: int = 7) -> str:
    """``documents``-table fixture for the dedup skew exhibit (same
    schema as the driver testdata: doc_id, text, lang, source,
    n_chars). ``dup_cluster_share`` puts that fraction of docs into
    ONE near-dup cluster (each member = a 120-word base text with one
    word swapped — pairwise shingle-Jaccard ≈ 0.85-0.95, far above
    the 0.5/0.7 thresholds, so the cluster is a clique); the
    equal-volume control uses ``dup_pair_share``: the same fraction
    of docs, but as scattered independent near-dup PAIRS."""
    marker = os.path.join(out_dir, "_DONE")
    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    base = [_VOCAB[int(k)] for k in rng.integers(0, len(_VOCAB), 120)]
    n_cluster = int(n_docs * dup_cluster_share)
    n_paired = int(n_docs * dup_pair_share) // 2 * 2
    texts: list[str] = []
    for i in range(n_cluster):
        w = list(base)
        w[i % len(w)] = _VOCAB[i % len(_VOCAB)]
        texts.append(" ".join(w))
    i = n_cluster
    while i < n_cluster + n_paired:
        w = [_VOCAB[int(k)] for k in rng.integers(0, len(_VOCAB), 120)]
        texts.append(" ".join(w))
        w2 = list(w)
        w2[i % len(w2)] = _VOCAB[(i + 1) % len(_VOCAB)]
        texts.append(" ".join(w2))
        i += 2
    for i in range(len(texts), n_docs):
        n_words = 80 + int(rng.integers(0, 120))
        texts.append(" ".join(
            _VOCAB[int(k)] for k in rng.integers(0, len(_VOCAB), n_words)))
    t = pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n_docs, pa.string()),
        "source": pa.array([f"src{i % 20:02d}" for i in range(n_docs)],
                           pa.string()),
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    })
    pq.write_table(t, path, row_group_size=8192)
    with open(marker, "w") as f:
        f.write("ok\n")
    return out_dir


def write_fixture(out_dir: str, scale: str = "t1", seed: int = 42,
                  **overrides) -> str:
    """Write pages/seeds/robots Parquet under out_dir; idempotent via a
    _DONE marker (safe to call from entry()/queries() repeatedly)."""
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    web = generate(scale, seed, **overrides)
    pq.write_table(web.pages_table(), os.path.join(out_dir, "pages.parquet"),
                   row_group_size=4096)
    pq.write_table(web.seeds_table(), os.path.join(out_dir, "seeds.parquet"))
    pq.write_table(web.robots_table(), os.path.join(out_dir, "robots.parquet"))
    with open(marker, "w") as f:
        f.write("ok\n")
    return out_dir
