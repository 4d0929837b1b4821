"""The crawl engine: frontier wave loop + checkpoint/resume.

Equivalent of the reference's whole ``scrape`` lifecycle
(``gdprCrawler.py:47-301`` + every per-DPA ``get_docs_*`` loop), as
rounds ("waves") over sharded actors:

    seeds → seen-admit → frontier.push (visible_from = 0)
    while frontier not empty (pipelined, ≤ P−1 waves in flight):
        popped  = frontier.pop_wave(w)           (activation + priority
                 + politeness; entries poppable once visible_from ≤ w)
        ranked  = sort (host, depth, parent, dom) → pop_rank
        fetch on the page-store shards (hash-join J5, 404 = missing);
        parse as stateless load-balanced tasks (ParseStage; parsed
                 parts → Parquet out_dir/parsed/wave=W/; candidates
                 fan out wave-tagged to the seen shards, acked)
        commit_wave(w) on seen shards (dedup+robots+admit) → admitted
                 entries pushed actor→actor to the frontier shards
                 with visible_from = w + P (rule 9 — data-driven
                 visibility keeps pipelining bit-deterministic)
        every k waves: drain + atomic checkpoint epoch

Execution note (why this loop is not one big ``Dataset`` pipeline):
the frontier is *iterative* — wave N+1's input depends on wave N's
parse output through mutable shared state (seen set, priority queues,
politeness budgets), which the Dataset API cannot express. The batch
transform is the same callable the pure Ray Data pipelines use
(``stages/parse.py``); here it runs as stateless ``_parse_task`` Ray
tasks over zero-copy slices of each fetch shard's joined table
(= ``map_batches`` semantics with work-stealing granularity
``parse_batch``), because the loop executes dozens of small waves
where per-wave Dataset instantiation (~1 s) would dominate. The wave
protocol is pop / fetch / parse / commit actor rounds, pipelined up
to ``pipeline_depth − 1`` waves deep, with small control tables
passed inline (see ``sources.pages.pack``).

Checkpoint/resume (north_rule): every ``checkpoint_every`` waves the
driver snapshots every frontier shard + seen shard + counters into
``out_dir/checkpoints/epoch_W.tmp`` and atomically renames it to
``epoch_W`` with a ``_COMMIT`` marker. Resume loads the newest
committed epoch, restores the actors, deletes ``parsed/wave>W`` output
dirs, and continues — determinism makes the rerun byte-equal to an
uninterrupted run.

Scale notes: popped-wave ranking is a driver-side Arrow sort bounded
by Σ politeness budgets per wave (documented scale path: distributed
``ds.sort`` + zipped ranks); mega-host skew affects only columnar
queue bookkeeping on its frontier shard (one lexsort per pop) —
fetch/parse work is spread by ``url_hash`` and stolen across CPUs by
``parse_batch``-sized stateless tasks; the seen set never
materializes in one place (bloom/cuckoo + sorted exact array per
shard).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections import defaultdict
from crawler_ray.arrowutil import table_from_pandas as _table_from_pandas
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from crawler_ray.functions.dates import PINNED_NOW
from crawler_ray.sources.pages import pack, unpack
from crawler_ray.state.frontier import make_frontier_shards
from crawler_ray.state.seen import make_seen_shards
from crawler_ray.urlnorm import (canonicalize, hash64_many, host_of,
                                 hosts_array)

__all__ = ["CrawlConfig", "run_crawl", "finalize_docs", "crawl_log_dataset",
           "wave_metrics"]

LOG_COLS = ["pop_rank", "wave", "window", "url", "host", "depth",
            "parent_order", "dom_idx", "status", "kind"]


@dataclass
class CrawlConfig:
    n_frontier_shards: int = 4
    n_seen_shards: int = 4
    n_page_shards: int = 4
    round_ms: int = 60_000
    politeness_cap: int = 10_000
    seen_capacity_per_shard: int = 1_000_000
    checkpoint_every: int = 0          # waves between epochs; 0 = final only
    max_depth: int | None = None
    pipeline_depth: int = 3            # wave visibility lag P: discoveries of
                                       # wave w become poppable at w+P; the
                                       # driver keeps up to P-1 fetch+parse
                                       # waves in flight (data-driven
                                       # visibility keeps this deterministic)
    seen_filter: str = "sig"           # seen-shard membership structure:
                                       # "sig" (exact signature table, one
                                       # gather per probe — default) |
                                       # "bloom" | "cuckoo" (probabilistic
                                       # prefilters over the sorted exact
                                       # array; ~20x less memory per key,
                                       # 6-11x slower probes; cuckoo
                                       # supports deletion for re-queue
                                       # policies)
    parse_batch: int = 512             # rows per stateless parse task — the
                                       # work-unit Ray load-balances across
                                       # the cluster (bounds stragglers)
    registry: dict | None = None       # host → SourceSpec snapshot; None =
                                       # snapshot the driver's module-level
                                       # registry at run_crawl() start (the
                                       # module dict is NOT replayed in Ray
                                       # worker processes)
    render_pool: int = 2               # warm browser actors serving hosts
                                       # whose spec sets needs_render (0 =
                                       # render disabled even for such hosts)
    browser_factory: object = None     # picklable () -> browser for the
                                       # render actors; None = FakeBrowser
    fetch_mode: str = "rows"           # "rows" (default): the fetch
                                       # join ships densely-packed
                                       # joined rows; parse walks them
                                       # sequentially. "indices":
                                       # corpus published to plasma
                                       # once, fetch returns 8 B/url
                                       # row indices, parse decodes
                                       # html IN PLACE. Measured A/B on
                                       # the 4.5M-page drain: rows wins
                                       # at BOTH 4 and 16 CPUs (152 vs
                                       # 187 s loop at 4; 45-52 vs
                                       # 52-60 s at 16) — the wave-
                                       # ordered sequential walk beats
                                       # copy elimination because the
                                       # indices mode's html reads
                                       # jump randomly through the
                                       # shard (prefetch/TLB misses).
                                       # indices remains the documented
                                       # choice when corpus locality
                                       # pins tasks to shard nodes.
    store_text: str = "all"            # parquet-part text policy: "all"
                                       # (every page, the correctness
                                       # tiers' default) | "docs" (doc
                                       # rows only — the reference's
                                       # storage semantics, used by the
                                       # scale drain bench)
    state_cpu_reserve: float = 0.0
                                       # CPU cores' worth of headroom kept
                                       # free of parse tasks (implemented
                                       # by over-requesting num_cpus on
                                       # the tasks). Hypothesis was that
                                       # the state actors' pop/commit
                                       # work was CPU-starved behind a
                                       # full complement of parse tasks;
                                       # a measured A/B on the scale4
                                       # drain at 16 CPUs REFUTED it
                                       # (reserve=1: pop 5.3 s, commit
                                       # 2.1 s, loop 52.7 s vs reserve=0:
                                       # pop 5.5 s, commit 1.8 s, loop
                                       # 48.7 s — the blocked time is
                                       # pipeline-structural, fixed by
                                       # pipeline_depth=4 + pop prefetch
                                       # instead). Kept (with the
                                       # CRAWLER_RAY_STATE_RESERVE env
                                       # override) as the measurement
                                       # knob and for clusters where
                                       # state shards own a core.
    now = PINNED_NOW


def _render_rows(t: pa.Table, render_hosts, actors: list,
                 salt: int) -> pa.Table:
    """Route the slice's script-driven rows (host ∈ render_hosts)
    through one warm render actor — S3 in the crawl path. Only the
    needing rows ship; the rendered html splices back by position.
    Actor choice is deterministic (salt = the wave-wide task ordinal)
    so replays pick the same browser."""
    from crawler_ray.urlnorm import host_of
    hosts = (t["host"].to_pylist() if "host" in t.column_names
             else [host_of(u) for u in t["url"].to_pylist()])
    mask = np.array([h in render_hosts for h in hosts], dtype=bool)
    if not mask.any():
        return t
    actor = actors[salt % len(actors)]
    rendered = unpack(ray.get(actor.render_packed.remote(
        pack(t.filter(pa.array(mask))))))
    htmls = t["html"].to_pylist()
    for pos, h in zip(np.flatnonzero(mask),
                      rendered["html"].to_pylist()):
        htmls[int(pos)] = h
    i = t.schema.get_field_index("html")
    return t.set_column(i, "html", pa.array(htmls, pa.binary()))


#: columns NOT persisted in the parquet parts — all re-derivable:
#: link_url/link_dom re-exist only as in-flight candidate rows (the
#: int64 link_hash column keeps the lineage at 1/3 the bytes), and
#: doc_hash == doc_key[:32] (finalize_docs re-derives it). Measured on
#: the 4.5M-page drain: 49 of 272 parquet B/url (18%) — write+compress
#: bus traffic the wave no longer pays.
_PART_DROP = ("link_url", "link_dom", "doc_hash")


def _part_for_write(parsed: pa.Table, store_text: str = "all") -> pa.Table:
    """The at-rest projection of a parsed wave part (see _PART_DROP).
    ``store_text="docs"`` additionally blanks ``text`` for non-doc
    rows — the reference's storage semantics (only documents are the
    product; listing/nav pages are navigation) — cutting another ~18%
    of text bytes on the drain fixture. Correctness tiers keep the
    default ``"all"`` (the docgraph reachability oracle checks text
    for every page)."""
    t = parsed.drop_columns([c for c in _PART_DROP
                             if c in parsed.column_names])
    if store_text == "docs":
        i = t.schema.get_field_index("text")
        t = t.set_column(i, "text", pc.if_else(
            t["doc_ok"], t["text"], pa.scalar("", pa.large_string())))
    return t


@ray.remote
def _parse_task(fetched: pa.Table, start: int, stop: int, part_path: str,
                wave: int, ctx: dict,
                salt: int = 0) -> tuple:
    """Stateless parse work-unit: slice of a fetch-shard's joined rows
    → ParseStage → parquet part → wave-tagged candidate fan-out to the
    seen shards (acked: task completion ⇒ this slice's offers are
    delivered, so the wave's commit may be dispatched once every task
    has returned). Fan-out from the tasks distributes the candidate
    routing across the cluster and overlaps it with the other slices'
    parse work — only the last task's offers sit on the wave gap.

    Stateless tasks (vs parse inside the page-store actor) let Ray
    schedule the work across every CPU regardless of which shard owns
    the pages — per-wave stragglers are bounded by the batch size
    instead of the biggest shard slice. The fetched table itself is a
    single object-store entry per (wave, shard, chunk); every task
    maps it zero-copy and slices its own rows. This "rows" mode ships
    the joined rows — the right trade when tasks may run on OTHER
    nodes than the corpus shard (k joined rows < the whole shard);
    the default "indices" mode (``_parse_task_idx``) never
    materializes the joined html at all. (History: a round-2 plasma
    ``export`` ALONGSIDE the actor-heap corpus was reverted — two
    full html copies; ``PageStore.publish`` now REPLACES the heap
    copy, which is why indices mode holds exactly one.)
    ``ctx`` (now / max_depth / seen-shard handles / registry) is one
    object-store entry shared by every task of the run — per-task
    args stay a few ints."""
    sliced = fetched.slice(start, stop - start)
    return _parse_and_emit(sliced, None, part_path, wave, ctx, salt)


@ray.remote
def _parse_task_idx(popped: pa.Table, a_start: int, a_stop: int,
                    corpus: pa.Table, idx: pa.Table, i_start: int,
                    i_stop: int, part_path: str, wave: int, ctx: dict,
                    salt: int = 0, order: np.ndarray | None = None) -> tuple:
    """fetch_mode="indices" work-unit: the popped wave table, the
    shard's plasma-resident corpus and the chunk's (row, -1=404)
    index table all arrive zero-copy; the batch is the popped slice +
    status + lang, and the html is read as in-place memoryviews of
    the corpus buffers (``binary_views_at``) — the joined html table
    of the "rows" mode never exists."""
    from crawler_ray.stages.parse import binary_views_at

    if order is not None:       # page-shard routing via the shared
        sliced = popped.take(   # order array (rows-mode notes apply)
            pa.array(order[a_start:a_stop], pa.int64()))
    else:
        sliced = popped.slice(a_start, a_stop - a_start)
    rows = idx["row"].to_numpy(zero_copy_only=False)[i_start:i_stop]
    status = pa.array(np.where(rows >= 0, 200, 404).astype(np.int16))
    lang = corpus["lang"].take(pa.array(rows, pa.int64(), mask=rows < 0))
    batch = (sliced.append_column("status", status)
                   .append_column("lang", lang))
    views = binary_views_at(corpus["html"], rows)
    return _parse_and_emit(batch, views, part_path, wave, ctx, salt)


def _parse_and_emit(batch: pa.Table, html_views: list | None,
                    part_path: str, wave: int, ctx: dict, salt: int
                    ) -> tuple:
    """Shared parse→write→offer body of both fetch modes."""
    from crawler_ray.stages.parse import ParseStage

    max_depth = ctx["max_depth"]
    seen_shards = ctx["seen_shards"]
    render_hosts = ctx.get("render_hosts") or ()
    if render_hosts:
        if html_views is not None:
            # render needs a real html column: materialize the views
            # (spec-registry crawls only — never the drain hot path)
            batch = batch.append_column("html", pa.array(
                [None if v is None else bytes(v) for v in html_views],
                pa.binary()))
            html_views = None
        # salt = the wave-wide task ordinal, NOT the slice start: the
        # start is always a multiple of the (even) batch size, so
        # `start % pool_size` pinned every render to actor 0 and the
        # rest of the warm pool sat idle
        batch = _render_rows(batch, render_hosts,
                             ctx["render_actors"], salt)
    t0 = time.perf_counter()
    parsed = ParseStage(ctx["now"], registry=ctx["registry"])(
        batch, html_views=html_views)
    t1 = time.perf_counter()
    pq.write_table(_part_for_write(parsed, ctx.get("store_text", "all")),
                   part_path)
    t2 = time.perf_counter()
    cands = _explode_links(parsed)
    if max_depth is not None:
        cands = cands.filter(pc.less_equal(cands["depth"], max_depth))
    acks, offered = [], []
    if cands.num_rows:
        hashes = cands["url_hash"].to_numpy(zero_copy_only=False)
        shard = (hashes % np.uint64(len(seen_shards))).astype(np.int64)
        # ONE stable sort + per-shard index takes instead of a full
        # boolean scan/filter per shard: the loop was O(n·shards) and
        # shard count scales with CPUs, so at 16+ shards the scans
        # dominated the offer section's task CPU (take, not slice —
        # pickling a slice serializes the backing buffers whole)
        order = np.argsort(shard, kind="stable")
        bounds = np.searchsorted(shard[order],
                                 np.arange(len(seen_shards) + 1))
        for s in range(len(seen_shards)):
            lo, hi = int(bounds[s]), int(bounds[s + 1])
            if lo == hi:
                continue
            acks.append(seen_shards[s].offer.remote(
                pack(cands.take(pa.array(order[lo:hi]))), wave))
            offered.append(s)
    t3 = time.perf_counter()
    # The offer ACK REFS return to the driver instead of being
    # ray.get'd here: blocking in-task cost ~8 ms of held CPU slot
    # per task (RPC round trip to up to n_seen_shards actors —
    # measured 21-26 CPU-s per 4M-URL drain); the driver awaits them
    # in retire_one BEFORE dispatching the wave's commit, preserving
    # the "offers landed before commit" barrier, and by retire time
    # (P−1 waves later) they have long since resolved. The ack refs
    # are owned by THIS (transient) worker process — if Ray reaps it
    # before retire, the driver's ray.get raises OwnerDiedError, so
    # retire_one also gets ``offered`` (shard ids, returned by value,
    # driver-owned) and falls back to the shards' wave_offer_count
    # barrier on ack-resolution failure.
    # CPU-second shares per section (summed by retire_one under
    # CRAWLER_RAY_PHASE_TIMING) — the retire_wait decomposition
    return parsed.num_rows, t1 - t0, t2 - t1, t3 - t2, acks, offered


def _load_seeds(path: str) -> pa.Table:
    """Seed list from Parquet or a crawler-ref.csv-shaped CSV (S1:
    ``country, doc_type, status, seed_url`` — any column named
    url/seed_url is the seed; rank = row order)."""
    if path.endswith(".csv"):
        from pyarrow import csv as pacsv
        t = pacsv.read_csv(path)
        lower = {c.lower(): c for c in t.column_names}
        url_col = lower.get("url") or lower.get("seed_url") \
            or t.column_names[-1]
        return pa.table({
            "url": t[url_col].cast(pa.string()),
            "seed_rank": pa.array(np.arange(t.num_rows, dtype=np.int32)),
        })
    return pq.read_table(path)


@ray.remote
def _schedule_seeds(seeds: pa.Table, max_depth, seen_shards: list) -> int:
    """Canonicalize + hash + offer one chunk of the seed list (acked;
    pseudo-wave −1). Rule-6 dedup at commit is order-independent, so
    chunks may interleave freely across tasks."""
    urls = [canonicalize(u) for u in seeds["url"].to_pylist()]
    cand = pa.table({
        "url": pa.array(urls, pa.string()),
        "url_hash": pa.array(hash64_many(urls), pa.uint64()),
        "host": pa.array([host_of(u) for u in urls], pa.string()),
        "depth": pa.array([0] * len(urls), pa.int32()),
        "parent_order": pa.array([-1] * len(urls), pa.int64()),
        "dom_idx": seeds["seed_rank"].cast(pa.int32()),
    })
    _offer_candidates(cand, seen_shards, max_depth, wave=-1)
    return cand.num_rows


# --------------------------------------------------------------------------
# link fan-out: parsed rows → discovery candidate table → seen shards
# --------------------------------------------------------------------------

def _explode_links(parsed: pa.Table) -> pa.Table:
    """Flatten the per-page link list columns into one candidate row
    per discovered link (vectorized: list offsets → repeats)."""
    link_url = parsed["link_url"].combine_chunks()
    lengths = pc.list_value_length(parsed["link_url"]).to_numpy(
        zero_copy_only=False).astype(np.int64)
    if lengths.sum() == 0:
        return pa.table({c: pa.array([], t) for c, t in [
            ("url", pa.string()), ("url_hash", pa.uint64()),
            ("host", pa.string()), ("depth", pa.int32()),
            ("parent_order", pa.int64()), ("dom_idx", pa.int32())]})
    urls = pc.list_flatten(parsed["link_url"])
    hashes = pc.list_flatten(parsed["link_hash"])
    doms = pc.list_flatten(parsed["link_dom"])
    depth = np.repeat(parsed["depth"].to_numpy(zero_copy_only=False) + 1,
                      lengths).astype(np.int32)
    parent = np.repeat(parsed["pop_rank"].to_numpy(zero_copy_only=False),
                       lengths).astype(np.int64)
    # host extraction: one RE2 pass with per-row fallback for the
    # rare non-canonical shape — the shared urlnorm.hosts_array
    # definition, so candidate routing and ParseStage host resolution
    # can never drift apart
    return pa.table({
        "url": urls, "url_hash": hashes,
        "host": hosts_array(urls),
        "depth": pa.array(depth, pa.int32()),
        "parent_order": pa.array(parent, pa.int64()),
        "dom_idx": doms.cast(pa.int32()),
    })


def _offer_candidates(cands: pa.Table, seen_shards: list,
                      max_depth: int | None, wave: int = 0) -> None:
    """Route candidates to seen shards by url_hash and block on acks
    (driver-side path, used for seed scheduling; wave-time fan-out
    happens inside the stateless parse tasks)."""
    if max_depth is not None:
        cands = cands.filter(pc.less_equal(cands["depth"], max_depth))
    if cands.num_rows == 0:
        return
    hashes = cands["url_hash"].to_numpy(zero_copy_only=False)
    shard = (hashes % np.uint64(len(seen_shards))).astype(np.int64)
    order = np.argsort(shard, kind="stable")
    bounds = np.searchsorted(shard[order], np.arange(len(seen_shards) + 1))
    acks = []
    for s in range(len(seen_shards)):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        if lo != hi:
            acks.append(seen_shards[s].offer.remote(
                pack(cands.take(pa.array(order[lo:hi]))), wave))
    ray.get(acks)


# --------------------------------------------------------------------------
# checkpointing
# --------------------------------------------------------------------------

def _checkpoint(out_dir: str, wave: int, window: int, pop_rank: int,
                frontier_shards: list, seen_shards: list) -> None:
    ck = os.path.join(out_dir, "checkpoints")
    os.makedirs(ck, exist_ok=True)
    tmp = os.path.join(ck, f"epoch_{wave:06d}.tmp")
    final = os.path.join(ck, f"epoch_{wave:06d}")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    refs = [f.snapshot.remote(os.path.join(tmp, f"frontier_{i:04d}.parquet"))
            for i, f in enumerate(frontier_shards)]
    refs += [s.snapshot.remote(os.path.join(tmp, f"seen_{i:04d}.parquet"))
             for i, s in enumerate(seen_shards)]
    ray.get(refs)
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump({"wave": wave, "window": window, "pop_rank": pop_rank}, f)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    with open(os.path.join(final, "_COMMIT"), "w") as f:
        f.write("ok\n")


def _latest_epoch(out_dir: str) -> str | None:
    ck = os.path.join(out_dir, "checkpoints")
    if not os.path.isdir(ck):
        return None
    epochs = sorted(d for d in os.listdir(ck)
                    if d.startswith("epoch_") and not d.endswith(".tmp")
                    and os.path.exists(os.path.join(ck, d, "_COMMIT")))
    return os.path.join(ck, epochs[-1]) if epochs else None


# --------------------------------------------------------------------------
# the crawl
# --------------------------------------------------------------------------

def run_crawl(pages_path: str, seeds_path: str, robots_path: str,
              out_dir: str, cfg: CrawlConfig | None = None,
              resume: bool = False, stop_after_waves: int | None = None,
              seed_only: bool = False) -> dict:
    """Run (or resume) a crawl. Returns a summary dict.

    ``stop_after_waves`` aborts mid-crawl after N waves *post
    checkpoint* — used by the resume-equivalence tests to simulate a
    kill. ``seed_only`` bootstraps the crawl state (seed admission +
    epoch-0 checkpoint) and stops — a later ``resume=True`` run
    continues from exactly that state (the drain bench uses this to
    time the crawl proper, not the seed ingest)."""
    cfg = cfg or CrawlConfig()
    if cfg.registry is None:
        # snapshot the driver-side source registry HERE: parse tasks
        # run in worker processes where module-level register() calls
        # were never executed (ADVICE: silent default-spec fallback)
        from crawler_ray.sources.registry import _REGISTRY
        cfg.registry = dict(_REGISTRY)
    os.makedirs(out_dir, exist_ok=True)
    parsed_root = os.path.join(out_dir, "parsed")
    os.makedirs(parsed_root, exist_ok=True)

    phase_setup = defaultdict(float)
    _timing = bool(os.environ.get("CRAWLER_RAY_PHASE_TIMING"))
    t0 = time.perf_counter()
    robots_t = pq.read_table(robots_path)
    robots = {h: list(d or []) for h, d in zip(
        robots_t["host"].to_pylist(), robots_t["disallow_prefixes"].to_pylist())}
    delays = {h: int(c) for h, c in zip(robots_t["host"].to_pylist(),
                                        robots_t["crawl_delay_ms"].to_pylist())}

    # setup is dispatched fully async: actor wiring, the n-way corpus
    # load, and checkpoint restore all overlap (they touch disjoint
    # actors; per-caller FIFO ordering on each actor makes the later
    # wave calls safe without intermediate barriers). Only the STATE
    # restores are barriered before the loop (cheap uint64/entry
    # parquet reads); the corpus loads stay in flight — each shard's
    # first fetch FIFO-queues behind its own load, so the load cost
    # overlaps the first waves' pop/rank/dispatch instead of sitting
    # on the critical path (round-4 verdict: the ~8 s disk-bound
    # restore barrier was 13% of a 16-CPU drain).
    from crawler_ray.sources.pages import PageStore

    frontier_shards = make_frontier_shards(cfg.n_frontier_shards, delays,
                                           cfg.round_ms, cfg.politeness_cap)
    seen_shards = make_seen_shards(cfg.n_seen_shards,
                                   cfg.seen_capacity_per_shard, robots,
                                   filter_kind=cfg.seen_filter)
    setup_refs = [s.set_frontier.remote(frontier_shards) for s in seen_shards]
    page_stores = [PageStore.options(max_concurrency=1)
                   .remote(i, cfg.n_page_shards)
                   for i in range(cfg.n_page_shards)]
    load_refs = [s.load.remote(pages_path) for s in page_stores]

    wave = window = 0
    pop_rank = 0
    if resume:
        epoch = _latest_epoch(out_dir)
        if epoch is None:
            raise FileNotFoundError(f"no committed checkpoint under {out_dir}")
        meta = json.load(open(os.path.join(epoch, "meta.json")))
        wave, window, pop_rank = meta["wave"], meta["window"], meta["pop_rank"]
        setup_refs += \
            [f.restore.remote(os.path.join(epoch, f"frontier_{i:04d}.parquet"))
             for i, f in enumerate(frontier_shards)] + \
            [s.restore.remote(os.path.join(epoch, f"seen_{i:04d}.parquet"))
             for i, s in enumerate(seen_shards)]
        for d in os.listdir(parsed_root):          # drop post-epoch partial waves
            if d.endswith(".tmp"):
                shutil.rmtree(os.path.join(parsed_root, d))
            elif d.startswith("wave=") and int(d.split("=")[1]) >= wave:
                shutil.rmtree(os.path.join(parsed_root, d))
    else:
        seeds_t = _load_seeds(seeds_path)
        # canonicalize/hash/route in parallel tasks — seed lists can be
        # frontier-sized (the drain bench seeds millions of URLs) and
        # the per-URL python must not serialize on the driver
        chunk = 50_000
        refs = [_schedule_seeds.remote(
                    seeds_t.slice(off, chunk), cfg.max_depth, seen_shards)
                for off in range(0, seeds_t.num_rows, chunk)]
        ray.get(refs)
        # seeds: committed as pseudo-wave −1, visible from wave 0
        ray.get([s.commit_wave.remote(-1, 0) for s in seen_shards])
        if seed_only:
            ray.get(setup_refs + load_refs)
            _checkpoint(out_dir, 0, 0, 0, frontier_shards, seen_shards)
            return {"seeded": True, "out_dir": out_dir}
    # NO state barrier here: per-caller FIFO ordering on each actor
    # already serializes every later driver call behind that shard's
    # restore (the first pop_wave on a frontier shard cannot run
    # before its restore; seen commits are driver-ordered behind
    # set_frontier/restore the same way), and cross-caller arrivals
    # (parse-task offers) only append to the offer buffer, which
    # restore PRESERVES — offers run in their own concurrency lane,
    # so on a cold, contended actor an offer can execute before the
    # queued default-lane restore; SeenShard.restore therefore must
    # not (and does not) reset _pending/_offer_counts (a wipe there
    # lost offers ~1/10 resumed runs on a 4-CPU box). Frontier pushes
    # from seen shards can only follow a commit, which follows a
    # completed pop ON EVERY SHARD (the driver ray.gets all pop refs
    # before dispatching tasks), which proves every frontier restore
    # finished. So the restore parquet reads and the actor
    # worker-process cold starts overlap wave 0's pop/rank/dispatch
    # instead of sitting on the critical path; the refs are awaited
    # once at the wave-0 error barrier below so a corrupt checkpoint
    # still fails the run loudly.
    corpus_refs = None
    if cfg.fetch_mode == "indices":
        # one plasma-resident corpus copy per shard; fetch returns
        # 8 B/url row indices and the parse tasks read html in place
        # (publish FIFO-queues behind each shard's load)
        corpus_refs = ray.get([p.publish.remote() for p in page_stores])
        load_refs = []

    # ---- pipelined wave loop --------------------------------------------
    # In flight at any time: up to (pipeline_depth − 1) fetch+parse
    # waves plus their async commits. Visibility is data-driven
    # (visible_from = wave + P on every admitted entry), so overlap
    # never changes wave composition; the sequential oracle implements
    # the identical rules.
    from collections import deque

    phase_setup["setup_total"] = time.perf_counter() - t0
    P = max(1, cfg.pipeline_depth)
    inflight: deque = deque()          # (wave_id, fp refs, tmp, final dir)
    commits: dict[int, list] = {}      # wave_id -> commit_wave refs
    phase = defaultdict(float)         # wall-time per driver phase (printed
    phase.update(phase_setup)          # when CRAWLER_RAY_PHASE_TIMING set

    def retire_one() -> None:
        j, refs, tmp_wave, wave_dir = inflight.popleft()
        t0 = time.perf_counter()
        vals = ray.get(refs)           # tasks done ⇒ wave-j offers SENT
        # ...and landed: await the offer acks the tasks returned
        # (resolved long ago by retire time — this is the barrier that
        # lets commit_wave(j) assume every wave-j offer is buffered).
        # The ack refs are owned by the transient workers that ran the
        # tasks; if one was reaped since, fall back to the shard-side
        # offer-count barrier (driver-owned data: vals[5] = shard ids
        # each task offered to).
        acks = [a for v in vals for a in v[4]]
        if acks:
            try:
                ray.get(acks)
            except ray.exceptions.RayError:
                from collections import Counter
                expected = Counter(s for v in vals for s in v[5])
                deadline = time.monotonic() + 60.0
                while True:
                    got = ray.get([seen_shards[s].wave_offer_count
                                   .remote(j) for s in expected])
                    if all(g >= expected[s]
                           for s, g in zip(expected, got)):
                        break
                    if time.monotonic() > deadline:
                        # an offer never arrived (its owner died before
                        # delivery): fail loudly — committing the wave
                        # would silently drop discovered links
                        raise RuntimeError(
                            f"wave {j}: offer barrier incomplete after "
                            f"owner loss (expected {dict(expected)}, "
                            f"got {got})")
                    time.sleep(0.05)
        phase["retire_wait"] += time.perf_counter() - t0
        if _timing:                    # CPU-second task-section sums
            for v in vals:
                phase["task_parse_cpu_s"] += v[1]
                phase["task_write_cpu_s"] += v[2]
                phase["task_offer_cpu_s"] += v[3]
        os.rename(tmp_wave, wave_dir)
        commits[j] = [s.commit_wave.remote(j, j + P) for s in seen_shards]

    def drain() -> None:
        while inflight:
            retire_one()
        for j in sorted(commits):
            ray.get(commits.pop(j))

    waves_done = 0
    # per-epoch trajectory for the long-horizon leak check: URLs/s,
    # checkpoint cost, and actor RSS/state size at every committed
    # epoch (only populated when checkpoint_every is set — one stats
    # RPC fan-out per epoch, nothing on the per-wave path)
    epoch_log: list[dict] = []

    def _record_epoch(ck_s: float, t_loop0: float) -> None:
        f_st = ray.get([f.stats.remote() for f in frontier_shards])
        s_st = ray.get([s.stats.remote() for s in seen_shards])
        epoch_log.append({
            "wave": wave, "window": window, "urls": pop_rank,
            "loop_t_s": round(time.perf_counter() - t_loop0, 3),
            "checkpoint_s": round(ck_s, 3),
            "seen_size": sum(s["size"] for s in s_st),
            "frontier_size": sum(f["size"] for f in f_st),
            "frontier_rss_mb_max": max(f["rss_mb"] for f in f_st),
            "seen_rss_mb_max": max(s["rss_mb"] for s in s_st),
        })

    last_nonempty = wave - 1       # resume: checkpoint drains, so any
                                   # staged entries came from waves < wave
    # shared per-run parse context: ONE object-store entry instead of
    # re-pickling 8 actor handles + the registry into every task
    render_hosts = frozenset(
        h for h, s in (cfg.registry or {}).items()
        if getattr(s, "needs_render", False))
    render_actors = []
    if render_hosts and cfg.render_pool > 0:
        from crawler_ray.sources.render import make_render_pool
        render_actors = make_render_pool(cfg.render_pool,
                                         cfg.browser_factory)
    ctx_ref = ray.put({"now": cfg.now, "max_depth": cfg.max_depth,
                       "seen_shards": seen_shards,
                       "registry": cfg.registry,
                       "store_text": cfg.store_text,
                       # no actors (render_pool=0) ⇒ pages parse raw,
                       # like the reference without a webdriver
                       "render_hosts": render_hosts if render_actors
                       else frozenset(),
                       "render_actors": render_actors})
    n_cpus = int(ray.cluster_resources().get("CPU", 32))
    # state-actor CPU headroom (see CrawlConfig.state_cpu_reserve):
    # implemented by over-requesting num_cpus on the parse tasks so
    # the raylet schedules at most (n_cpus - reserve) of them
    # concurrently; the freed core's cycles go to whichever state
    # actor has queued work. The env knob exists for A/B measurement.
    env_r = os.environ.get("CRAWLER_RAY_STATE_RESERVE")
    reserve = float(env_r) if env_r is not None else cfg.state_cpu_reserve
    if reserve > 0 and n_cpus - reserve >= 2:
        # largest millicpu value v with floor(n_cpus/v) == slots
        task_cpu = int(n_cpus / (n_cpus - reserve) * 1000 - 1) / 1000
        parse_task = _parse_task.options(num_cpus=task_cpu)
        parse_task_idx = _parse_task_idx.options(num_cpus=task_cpu)
    else:
        parse_task, parse_task_idx = _parse_task, _parse_task_idx

    def _all_ready(refs: list) -> bool:
        return len(ray.wait(list(refs), num_returns=len(refs),
                            timeout=0)[0]) == len(refs)

    # pop prefetch: (wave_id, per-shard refs) dispatched at the END of
    # the previous iteration once the commits pop(wave_id) depends on
    # have provably resolved — the frontier shards then compute the
    # politeness/priority selection WHILE the driver blocks in the next
    # iteration's retire_wait, instead of serially after it
    pending_pop: tuple[int, list] | None = None

    def _try_prefetch() -> None:
        """Issue pop(wave) now if its visibility inputs are provably
        settled, so the shards compute the politeness/priority
        selection while the driver blocks in the next iteration's
        retire_wait. Safe iff every commit with visibility deadline
        ≤ wave has been applied — an un-retired wave that old, or an
        unresolved commit ref, vetoes (the normal path handles them).
        Called from every spot the loop re-enters pop: end of a
        dispatch iteration, the bubble fast path, and a window reset
        (where inflight/commits are empty so it always fires)."""
        nonlocal pending_pop
        if inflight and inflight[0][0] <= wave - P:
            return
        need = [j for j in commits if j <= wave - P]
        if all(_all_ready(commits[j]) for j in need):
            for j in need:
                ray.get(commits.pop(j))
            pending_pop = (wave, [f.pop_wave_parts.remote(wave)
                                  for f in frontier_shards])

    # per-iteration outlier tracker (CRAWLER_RAY_PHASE_TIMING only):
    # phase[] sums hide WHICH wave a stall hit; rare single-wave
    # stragglers (one slow 16-CPU leg in an otherwise clean session)
    # need the per-iteration wall + phase-delta to localize
    _iter_keys = ("retire_wait", "commit_wait", "pop", "rank_merge",
                  "shard_put", "dispatch", "load_wait")
    iter_log: list = []                # (wall_s, wave_id, phase deltas)
    _iter_prev = None                  # (t_start, wave_id, counter snapshot)

    t_loop0 = time.perf_counter()
    while True:
        if _timing:
            _t_now = time.perf_counter()
            if _iter_prev is not None:
                _t_st, _w_id, _snap = _iter_prev
                iter_log.append((_t_now - _t_st, _w_id,
                                 {k: phase[k] - _snap[k]
                                  for k in _iter_keys}))
            _iter_prev = (_t_now, wave, {k: phase[k] for k in _iter_keys})
        # dispatch commits for waves old enough (≥1 iteration of slack
        # before their visibility deadline at pop(j+P))
        while inflight and inflight[0][0] <= wave - min(P, 2):
            retire_one()
        # visibility barrier: commits for waves ≤ wave−P must be applied
        t0 = time.perf_counter()
        for j in [j for j in list(commits) if j <= wave - P]:
            ray.get(commits.pop(j))
        phase["commit_wait"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        if pending_pop is not None and pending_pop[0] == wave:
            pop_refs = pending_pop[1]
            phase["pop_prefetched_n"] += 1
            pre = True
        else:
            pop_refs = [f.pop_wave_parts.remote(wave)
                        for f in frontier_shards]
            phase["pop_cold_n"] += 1
            pre = False
        pending_pop = None
        parts = [t for t in ray.get(pop_refs) if t is not None]
        dt = time.perf_counter() - t0
        phase["pop"] += dt
        if "first_pop_s" not in phase:
            # The run's first pop FIFO-queues behind every shard's
            # actor cold start (worker spawn + imports, core-bound)
            # and checkpoint restore, so its wait IS the one-time
            # restore/startup barrier (measured 4.7 s at 16 CPUs vs
            # 7.6 s at 4 on the scale4 drain, while every steady-state
            # pop waits <0.1 s thanks to the prefetch). Exposed in the
            # summary so the scaling bench can report a drain-only
            # number with the barrier excluded — on a real cluster the
            # barrier is per-node-parallel, not a scaling cost.
            phase["first_pop_s"] = dt
        if _timing and dt > 0.05:
            print(f"POPWAIT wave={wave} prefetched={pre} "
                  f"wait={dt:.3f} nonempty={bool(parts)}",
                  file=__import__('sys').stderr)
        if not parts:
            # Bubble rule (oracle rule 9): if any wave in (wave−P, wave)
            # popped rows, its discoveries may still be staged — advance
            # the wave counter WITHOUT draining (the pipeline keeps
            # running through bubbles). Otherwise nothing can be in
            # flight (inflight only ever holds non-empty waves and the
            # visibility barrier already applied commits ≤ wave−P), so
            # the frontier counts below are exact.
            if last_nonempty > wave - P:
                wave += 1
                _try_prefetch()
                continue
            assert not inflight and not commits
            szs = ray.get([f.sizes.remote() for f in frontier_shards])
            if sum(s["active"] for s in szs):
                window += 1
                ray.get([f.reset_window.remote() for f in frontier_shards])
                _try_prefetch()
                continue
            break
        last_nonempty = wave
        t0 = time.perf_counter()
        # global rank order WITHOUT a driver-blocked O(wave) sort:
        # each shard's pop is host-ascending with per-host pieces
        # already priority-sorted, and hosts are hash-partitioned
        # (one shard per host), so sorting the ~n_hosts PIECES by
        # host name and concatenating zero-copy slices reproduces the
        # old sort_indices((host, depth, parent_order, dom_idx))
        # order exactly (UTF-8 byte order == codepoint order). ONE
        # combine_chunks materializes the wave contiguously for the
        # single ray.put below — a sequential memcopy instead of the
        # old sort + two gather-takes (was rank_sort 1.3 s + a
        # page-shard take, constant across CPU levels).
        pieces: list[tuple[str, pa.Table]] = []
        for t, starts, hosts in parts:
            stops = starts[1:] + [t.num_rows]
            for h, lo, hi in zip(hosts, starts, stops):
                pieces.append((h, t.slice(lo, hi - lo)))
        pieces.sort(key=lambda p: p[0])
        popped = pa.concat_tables([p[1] for p in pieces]).combine_chunks()
        phase["rank_merge"] += time.perf_counter() - t0
        n = popped.num_rows
        popped = (popped
                  .append_column("pop_rank", pa.array(
                      np.arange(pop_rank, pop_rank + n, dtype=np.int64)))
                  .append_column("wave", pa.array([wave] * n, pa.int32()))
                  .append_column("window", pa.array([window] * n, pa.int32())))
        pop_rank += n

        wave_dir = os.path.join(parsed_root, f"wave={wave:06d}")
        tmp_wave = wave_dir + ".tmp"
        if os.path.exists(tmp_wave):
            shutil.rmtree(tmp_wave)
        if os.path.exists(wave_dir):                # stale from a killed run
            shutil.rmtree(wave_dir)
        os.makedirs(tmp_wave)

        # fetch on the page-store pool (data-local hash-join), parse as
        # stateless load-balanced tasks, all dispatched async — retired
        # up to P−1 waves later
        t0 = time.perf_counter()
        hashes = popped["url_hash"].to_numpy(zero_copy_only=False)
        shard = (hashes % np.uint64(cfg.n_page_shards)).astype(np.int64)
        # page-shard routing WITHOUT a second driver-side gather: the
        # rank-ordered wave is put ONCE, plus one int64 order array;
        # each fetch call selects its rows via order[start:stop]
        # shard-side (the take cost runs n_page_shards-wide in the
        # actors instead of serially on the driver). Row sets and
        # row order per task are bit-identical to the old
        # popped.take(shard_order) contiguous-slice layout.
        shard_order = np.argsort(shard, kind="stable")
        bounds = np.searchsorted(shard[shard_order],
                                 np.arange(cfg.n_page_shards + 1))
        popped_ref = ray.put(popped)
        order_ref = ray.put(shard_order)
        phase["shard_put"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        refs = []
        # work-unit size scales with the wave so a frontier-wide mega
        # wave doesn't dispatch thousands of tasks. Target tasks/wave =
        # max(64, 6/CPU): every task pays fixed costs that SCALE WITH
        # SHARD COUNT (an offer pack+dispatch per seen shard, a plasma
        # read, a scheduling round trip), so the old flat 16-tasks/CPU
        # target made total offer CPU grow ~quadratically with CPUs
        # (4x tasks x 4x shard messages from 4->16 CPUs, measured
        # 7.3 -> 29.9 task-CPU-s on the scale4 drain). 64 keeps small
        # boxes at their measured-best granularity; stragglers at the
        # coarser high-CPU batch hide behind the P-deep wave pipeline
        # (task results are row-independent, so the batch size never
        # affects crawl output — only scheduling).
        batch = max(cfg.parse_batch,
                    -(-n // max(64, n_cpus * 6)))    # ceil-div
        fetch_chunk = batch * 4
        for s in range(cfg.n_page_shards):
            lo, hi = int(bounds[s]), int(bounds[s + 1])
            if lo == hi:
                continue
            # fetch in chunks so the first parse tasks start ~one chunk
            # after dispatch instead of after the whole shard's join —
            # a monolithic fetch left every CPU idle at wave start
            for c, c_start in enumerate(range(lo, hi, fetch_chunk)):
                c_stop = min(c_start + fetch_chunk, hi)
                if corpus_refs is not None:
                    idx_ref = page_stores[s].fetch_indices.remote(
                        popped_ref, c_start, c_stop, order_ref)
                    for b, start in enumerate(
                            range(0, c_stop - c_start, batch)):
                        stop = min(start + batch, c_stop - c_start)
                        refs.append(parse_task_idx.remote(
                            popped_ref, c_start + start, c_start + stop,
                            corpus_refs[s], idx_ref, start, stop,
                            os.path.join(
                                tmp_wave,
                                f"part-{s:05d}-{c:05d}-{b:05d}.parquet"),
                            wave, ctx_ref, len(refs), order_ref))
                    continue
                fetched_ref = page_stores[s].fetch.remote(
                    popped_ref, c_start, c_stop, order_ref)
                for b, start in enumerate(
                        range(0, c_stop - c_start, batch)):
                    stop = min(start + batch, c_stop - c_start)
                    refs.append(parse_task.remote(
                        fetched_ref, start, stop,
                        os.path.join(tmp_wave,
                                     f"part-{s:05d}-{c:05d}-{b:05d}.parquet"),
                        wave, ctx_ref, len(refs)))
        phase["dispatch"] += time.perf_counter() - t0
        inflight.append((wave, refs, tmp_wave, wave_dir))
        wave += 1
        waves_done += 1
        if load_refs or setup_refs:
            # setup/corpus-load error barrier, crossed once: wave 0 is
            # dispatched (its fetches FIFO-queue behind each shard's
            # load, its pop queued behind each frontier restore), so a
            # failed load OR a corrupt checkpoint restore surfaces
            # here instead of silently 404-ing / empty-popping the
            # whole crawl. With the IPC-mmap layout this is
            # milliseconds; with the parquet fallback it overlaps
            # wave 0's pop/rank/dispatch.
            t0 = time.perf_counter()
            ray.get(load_refs + setup_refs)
            load_refs, setup_refs = [], []
            phase["load_wait"] += time.perf_counter() - t0
        # cadence counts COMPLETED (non-empty) waves: the wave counter
        # itself advances in strides of pipeline_depth through bubble
        # waves, so `wave % checkpoint_every` aliases (P=3 strides hit
        # post-increment values ≡1 mod 3 — checkpoint_every=3 would
        # never fire)
        if cfg.checkpoint_every and waves_done % cfg.checkpoint_every == 0:
            drain()                    # epoch = fully settled state
            t_ck = time.perf_counter()
            _checkpoint(out_dir, wave, window, pop_rank,
                        frontier_shards, seen_shards)
            _record_epoch(time.perf_counter() - t_ck, t_loop0)
            if stop_after_waves is not None and waves_done >= stop_after_waves:
                return {"aborted_at_wave": wave, "out_dir": out_dir}
        # ---- end-of-iteration overlap work (order matters: never pop
        # ahead of a checkpoint — popped entries must not be missing
        # from an epoch snapshot) ------------------------------------
        # eager retire: any wave whose tasks have ALL finished gets its
        # commit dispatched now (non-blocking check), giving the seen
        # shards the rest of this wave's parse window to run the
        # commit instead of compressing it into the next commit_wait
        while inflight and _all_ready(inflight[0][1]):
            retire_one()
        # pop prefetch for the next iteration (see _try_prefetch).
        # Structural note: at P=3 the oldest inflight wave is exactly
        # wave−P here in steady state, so the veto fires on most
        # dispatch iterations (pop(w+1) truly depends on commit(w−2),
        # whose tasks finish only at the next loop-top retire) —
        # pop + commit_wait (~7-12 s per scale4 drain, constant across
        # CPU levels) are the engine's remaining serial head. Raising
        # P to 4 to buy overlap was measured WORSE (interleaved A/B at
        # 16 CPUs: 56.4/79.2 s vs 48.1/60.5 s at P=3): the deeper
        # visibility lag defers the 404-discovery tail into more,
        # smaller waves. The property suite oracle-checks P ∈ 1..4.
        _try_prefetch()

    phase["loop_total"] = time.perf_counter() - t_loop0
    if _timing and _iter_prev is not None:  # close the final iteration
        _t_st, _w_id, _snap = _iter_prev
        iter_log.append((time.perf_counter() - _t_st, _w_id,
                         {k: phase[k] - _snap[k] for k in _iter_keys}))
        _iter_prev = None
    t0 = time.perf_counter()
    _checkpoint(out_dir, wave, window, pop_rank, frontier_shards, seen_shards)
    phase["final_checkpoint"] = time.perf_counter() - t0
    if cfg.checkpoint_every:
        _record_epoch(phase["final_checkpoint"], t_loop0)
    if _timing:
        import sys as _sys
        print("PHASE_TIMING "
              + json.dumps({k: round(v, 3) for k, v in sorted(phase.items())}),
              file=_sys.stderr)
        if iter_log:
            worst = sorted(iter_log, key=lambda r: r[0], reverse=True)[:5]
            med = sorted(r[0] for r in iter_log)[len(iter_log) // 2]
            print("WAVE_OUTLIERS median_iter_s="
                  + f"{med:.3f} " + json.dumps([
                      {"wall_s": round(w, 3), "wave": wid,
                       **{k: round(v, 3) for k, v in d.items()
                          if v > 0.005}}
                      for w, wid, d in worst]), file=_sys.stderr)
    seen_stats = ray.get([s.stats.remote() for s in seen_shards])
    frontier_stats = ray.get([f.stats.remote() for f in frontier_shards])
    if _timing and seen_stats and "commit_s" in seen_stats[0]:
        # where the seen-shard commit CPU goes (sum + max over shards;
        # the MAX shard bounds the commit_wait the driver can see at a
        # window boundary, since shards run in parallel)
        import sys as _sys
        stages = seen_stats[0]["commit_s"]
        agg = {k: round(sum(s["commit_s"][k] for s in seen_stats), 3)
               for k in stages}
        mx = {k: round(max(s["commit_s"][k] for s in seen_stats), 3)
              for k in stages}
        print("SEEN_COMMIT sum=" + json.dumps(agg)
              + " max_shard=" + json.dumps(mx), file=_sys.stderr)
    summary = {
        "out_dir": out_dir,
        "waves": wave,
        "windows": window + 1,
        # measurement transparency for the scaling bench: setup is the
        # one-time parallel restore/load barrier (disk-bound, ~constant
        # across CPU levels on one box — per-node-parallel on a real
        # cluster); loop_s is the drain itself
        "setup_s": round(phase["setup_total"], 3),
        "loop_s": round(phase["loop_total"], 3),
        # the first pop's blocked wait = actor cold start + checkpoint
        # restore + first selection (see the first_pop_s comment in
        # the loop); loop_s - first_pop_s is the steady drain
        "first_pop_s": round(phase.get("first_pop_s", 0.0), 3),
        "urls_fetched": pop_rank,
        "seen_size": sum(s["size"] for s in seen_stats),
        "robots_excluded": sum(s["robots_excluded"] for s in seen_stats),
        "dup_discovery": sum(s["dup_discovery"] for s in seen_stats),
        "frontier_remaining": sum(f["size"] for f in frontier_stats),
    }
    if epoch_log:
        summary["epoch_log"] = epoch_log
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary


# --------------------------------------------------------------------------
# post-crawl materializations (pure Ray Data)
# --------------------------------------------------------------------------

def parsed_dataset(out_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(out_dir, "parsed"))


def crawl_log_dataset(out_dir: str) -> "ray.data.Dataset":
    """The ordered crawl log (O4): sort on materialization only."""
    return (parsed_dataset(out_dir)
            .select_columns(LOG_COLS)
            .sort("pop_rank"))


def finalize_docs(out_dir: str, docs_path: str | None = None
                  ) -> "ray.data.Dataset":
    """Dedup emitted docs on the composite key, earliest pop_rank wins
    (oracle rule 8) — shuffle keyed by a coarse hash of doc_key, with
    the per-key idxmin vectorized inside each group (singleton-group
    map_groups overhead lesson, see dedup.py)."""
    import pandas as pd

    def add_coarse(batch: pa.Table) -> pa.Table:
        # doc_key begins with the 32-hex-char md5(title) (parse.py),
        # so its first 8 ASCII bytes are uniform over hex digits:
        # read them as a big-endian u64 and multiplicative-hash to 64
        # groups (top bits — the low bits of a product depend only on
        # the low bits of the operand). Identical doc_keys share the
        # prefix, which is the only correctness requirement here;
        # a prefix collision merely merges two groups. Fully
        # vectorized — no per-row Python hashing in the finalize path.
        if batch.num_rows == 0:
            return batch.append_column(
                "coarse", pa.array([], pa.int64()))
        sl = pc.binary_slice(
            batch["doc_key"].cast(pa.binary()), 0, 8).combine_chunks()
        off = np.frombuffer(sl.buffers()[1], np.int32)[
            sl.offset: sl.offset + len(sl) + 1]
        data = np.frombuffer(sl.buffers()[2], np.uint8)
        mat = data[off[:-1, None] + np.arange(8)]
        v = np.ascontiguousarray(mat).view(">u8").reshape(-1)
        with np.errstate(over="ignore"):
            coarse = ((v.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                      >> np.uint64(58)).astype(np.int64)
        return batch.append_column("coarse", pa.array(coarse, pa.int64()))

    def first_by_rank(g: pd.DataFrame) -> pd.DataFrame:
        idx = g.groupby("doc_key")["pop_rank"].idxmin()
        return g.loc[idx].drop(columns=["coarse"])

    def add_doc_hash(batch: pa.Table) -> pa.Table:
        # doc_hash is not persisted in the parts (_PART_DROP): it is
        # by construction the 32-hex-char md5 prefix of doc_key
        return batch.append_column(
            "doc_hash", pc.utf8_slice_codeunits(batch["doc_key"], 0, 32))

    ds = (parsed_dataset(out_dir)
          .filter(expr="doc_ok == True")
          .select_columns(["doc_key", "url", "host", "title",
                           "release_date", "lang", "text", "pop_rank"])
          .map_batches(add_doc_hash, batch_format="pyarrow")
          .map_batches(add_coarse, batch_format="pyarrow")
          .groupby("coarse")
          .map_groups(first_by_rank, batch_format="pandas"))
    if docs_path:
        ds.write_parquet(docs_path)
        return ray.data.read_parquet(docs_path)
    return ds


def wave_metrics(out_dir: str) -> pa.Table:
    """Per-wave lineage/metrics from the parsed output (A-series
    aggregate): rows in/out, 404s, docs, links discovered."""
    import pandas as pd

    def agg(batch: pa.Table) -> pa.Table:
        df = batch.select(["wave", "window", "status", "doc_ok",
                           "n_date_filtered"]).to_pandas()
        df["missing"] = (df.pop("status") == 404).astype("int64")
        df["links"] = pc.list_value_length(batch["link_hash"]).to_numpy(
            zero_copy_only=False).astype("int64")
        df["rows"] = 1
        g = df.groupby(["wave", "window"], as_index=False).sum()
        return _table_from_pandas(g)

    parts = (parsed_dataset(out_dir)
             .map_batches(agg, batch_format="pyarrow")
             .to_pandas())
    final = parts.groupby(["wave", "window"], as_index=False).sum() \
                 .sort_values("wave")
    return _table_from_pandas(final)
