#!/usr/bin/env python
"""Headline benchmark for the crawler_ray engine.

Default mode (one JSON line on stdout):
  - crawl throughput over the 200k-page synthetic web fixture
    (frontier + seen + politeness + fetch-join + parse, the full
    engine) at ``RAY_GRAFT_CPUS`` CPUs (default 32);
  - the query suite over ``$GRAFT_SF_DIR`` (default
    /root/testdata/sf0.1) — one wall-clock per query.

``--scaling``: runs the frontier DRAIN at two CPU levels (``--levels
N,4N``, default 8,32) in FRESH taskset-pinned processes (sandbox
stand-in for N vs 4N nodes, per the build contract): a wide frontier
(every page of the drain fixture — ``--scale-tier scale`` = 1.35M
URLs / ~20 s window, ``scale4`` = 4.09M URLs / >=60 s window at 16
CPUs — a mid-crawl state bootstrapped once via
``run_crawl(seed_only=True)`` and restored from its epoch-0
checkpoint) is crawled to empty under politeness windows. Levels are
INTERLEAVED across trials so box drift cancels out of the ratio.
Reports median throughputs + efficiency at three tiers: raw wall,
``loop_only_efficiency`` (excludes pre-loop setup), and
``drain_only_efficiency`` (additionally excludes the per-trial
MEASURED first-pop barrier = actor cold start + checkpoint restore,
which is per-node-parallel on a real cluster — see
``run_crawl``'s ``first_pop_s``). The measurable ceiling on this box
varies with its load phase (scripts/hw_ceiling.py: shared memory
bus — 0.63-0.88 across sessions on the 4→16 pair); results land in
BASELINE.md.

``--crawl-only --cpus N --tier scale``: single timed crawl (used by
--scaling's subprocesses).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

BENCH_ROOT = "/tmp/crawler_ray_bench"
N_SHARDS = 8


def _n_shards(cpus: int) -> int:
    """Crawl-state shard count scales with the CPU budget — the
    real-cluster rule (a shard set per node / few cores). A fixed
    count caps every actor-side phase (page-store fetch, seen
    offer/commit, frontier pop, checkpoint restore) at that
    parallelism no matter how many CPUs the cluster has; measured on
    the scale4 drain at 16 CPUs, 8 fixed shards held setup at 13.5 s
    (8-way load) and commit_wait at 5.8 s."""
    return max(4, cpus)

CRAWL_TIERS = {
    # tier -> (politeness round_ms, cap): permissive budgets so the
    # bench measures engine throughput, not the (logical) politeness
    # wait; correctness tests use binding budgets instead.
    "bench": dict(round_ms=3_600_000, politeness_cap=100_000,
              pipeline_depth=2),
    # drain tiers store text for DOC rows only — the reference's
    # storage semantics (documents are the product, listing pages are
    # navigation); correctness tiers keep store_text="all"
    "scale": dict(round_ms=36_000_000, politeness_cap=50_000,
                  seen_capacity_per_shard=2_000_000, store_text="docs"),
    # 3x drain window (>= 60 s at 32 CPUs): lifts the timed section
    # far above the VM's +-25% wall-clock jitter for the scaling
    # bench. politeness_cap must clear the fixture's mega hosts
    # (~0.9M pages each at this scale) or every extra politeness
    # window inserts a global barrier and the drain measures barrier
    # overhead instead of engine throughput (measured: cap 50k -> 17
    # windows, 25k URLs/s; cap 1M -> 1 window).
    # pipeline depth stays 3 on the drain tiers — measured interleaved
    # A/B at 16 CPUs (CRAWLER_RAY_P seam): P=4 ran 56.4/79.2 s vs
    # P=3's 48.1/60.5 s. Deeper visibility lag defers the 404-discovery
    # tail (visible_from = w+P), splitting the drain into 16 waves
    # instead of 12 — more per-wave fixed cost and narrower parse
    # windows outweigh the extra pop/commit overlap the depth buys.
    "scale4": dict(round_ms=36_000_000, politeness_cap=1_000_000,
                   seen_capacity_per_shard=2_000_000, store_text="docs"),
    # long-horizon leak tier: 16M pages over 8192 EQUAL hosts with a
    # BINDING politeness cap, so the drain runs ~18 equal-sized
    # windows (uniform hosts ⇒ every window pops cap×hosts URLs —
    # flat-throughput expectation) across multiple checkpoint epochs;
    # per-epoch URLs/s + actor RSS land in the summary's epoch_log
    "scale16": dict(round_ms=36_000_000, politeness_cap=120,
                    seen_capacity_per_shard=2_000_000, store_text="docs",
                    checkpoint_every=3),
    # skew A/B (equal volume, equal tier config): skews puts 50% of
    # all pages on ONE host and 10% of docs in ONE dup cluster; skewu
    # is the perfectly-uniform control
    "skewu": dict(round_ms=36_000_000, politeness_cap=1_000_000,
                  store_text="docs"),
    "skews": dict(round_ms=36_000_000, politeness_cap=1_000_000,
                  store_text="docs"),
    "t1": dict(round_ms=60_000, politeness_cap=10_000),
}

# tier -> (base generator scale, WebConfig overrides) for fixtures
# that aren't plain SCALES entries
FIXTURE_SHAPES = {
    "skewu": ("bench", dict(n_pages=600_000, results_per_listing=40,
                            chain_max=8, uniform_hosts=True)),
    "skews": ("bench", dict(n_pages=600_000, results_per_listing=40,
                            chain_max=8, mega_host_share=0.5,
                            dup_cluster_share=0.10)),
}


def _ensure_fixture(tier: str, n_shards: int = N_SHARDS) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq
    from crawler_ray.fixtures import write_fixture, write_fixture_parts
    from crawler_ray.sources.pages import prepare_sharded_pages
    fix = os.path.join(BENCH_ROOT, tier)
    if tier == "scale16":
        # 4 scale4-shaped parts with disjoint host namespaces, built
        # in parallel processes (uniform hosts: the horizon tier wants
        # a flat per-window throughput expectation)
        pages = write_fixture_parts(fix, "scale4", n_parts=4,
                                    uniform_hosts=True)
    else:
        base, shape = FIXTURE_SHAPES.get(tier, (tier, {}))
        write_fixture(fix, base, **shape)
        pages = [os.path.join(fix, "pages.parquet")]
    prepare_sharded_pages(pages if len(pages) > 1 else pages[0],
                          os.path.join(fix, f"sharded_{n_shards}"), n_shards)
    wide = os.path.join(fix, "seeds_wide.parquet")
    if (tier.startswith("scale") or tier.startswith("skew")) \
            and not os.path.exists(wide):
        # drain-bench seed list = every page URL (a mid-crawl
        # wide-frontier snapshot): measures steady-state frontier /
        # fetch / parse / dedup throughput rather than the link-depth
        # discovery latency that bounds any crawler's wave count
        t = pa.concat_tables(pq.read_table(p, columns=["url"])
                             for p in pages)
        pq.write_table(pa.table({
            "url": t["url"],
            "source": pa.array(["drain"] * t.num_rows, pa.string()),
            "doc_type": pa.array(["Decisions"] * t.num_rows, pa.string()),
            "seed_rank": pa.array(range(t.num_rows), pa.int32()),
        }), wide)
    return fix


def _start_util_sampler():
    """CRAWLER_RAY_UTIL_SAMPLE=1: sample parse-task slot occupancy
    (total CPU − ray.available_resources()['CPU']) every ~50 ms on a
    daemon thread for the duration of one crawl. State actors reserve
    0 running CPUs, so the series is exactly "how many parse/fetch
    task slots are busy" over time — a sawtooth localizes pipeline
    bubbles (window resets, checkpoint drains, wave-tail straggle),
    while a flat-full series with low task-CPU utilization indicts
    physical-core contention from actors/raylet instead. Dumped as
    one UTIL_SAMPLE stderr JSON line: [t_rel_s, busy_slots] pairs."""
    if os.environ.get("CRAWLER_RAY_UTIL_SAMPLE") != "1":
        return None
    import threading
    import ray
    total = ray.cluster_resources().get("CPU", 0)
    samples: list = []
    stop = threading.Event()

    def loop():
        t0 = time.perf_counter()
        while not stop.is_set():
            try:
                # fully-consumed resources are OMITTED from the dict,
                # so a missing "CPU" key means 0 available, not total
                avail = ray.available_resources().get("CPU", 0.0)
            except Exception:
                avail = total
            samples.append((round(time.perf_counter() - t0, 3),
                            round(total - avail, 2)))
            stop.wait(0.05)

    th = threading.Thread(target=loop, daemon=True)
    th.start()
    return (stop, th, samples)


def _stop_util_sampler(sampler) -> None:
    if sampler is None:
        return
    stop, th, samples = sampler
    stop.set()
    th.join(timeout=2.0)
    print("UTIL_SAMPLE " + json.dumps(samples), file=sys.stderr)


def _crawl(tier: str, out_tag: str, wide_seeds: bool = False,
           n_shards: int = N_SHARDS) -> dict:
    from crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
    fix = _ensure_fixture(tier, n_shards)
    out = os.path.join(BENCH_ROOT, f"out_{out_tag}")
    shutil.rmtree(out, ignore_errors=True)
    tier_cfg = dict(CRAWL_TIERS[tier])
    if "CRAWLER_RAY_P" in os.environ:      # A/B seam, like fetch_mode
        tier_cfg["pipeline_depth"] = int(os.environ["CRAWLER_RAY_P"])
    cfg = CrawlConfig(n_frontier_shards=n_shards, n_seen_shards=n_shards,
                      n_page_shards=n_shards,
                      # A/B seam for the fetch-path experiments
                      fetch_mode=os.environ.get("CRAWLER_RAY_FETCH_MODE",
                                                "rows"),
                      **tier_cfg)
    pages = os.path.join(fix, f"sharded_{n_shards}")
    robots = os.path.join(fix, "robots.parquet")
    sampler = _start_util_sampler()
    if wide_seeds:
        # drain bench: time the crawl from a seeded epoch-0 checkpoint
        # (seed ingest is one-time state prep, identical at every
        # parallelism level — resume restores it in parallel)
        seeded = os.path.join(fix, f"seeded_{n_shards}")
        if not os.path.exists(os.path.join(seeded, "checkpoints")):
            run_crawl(pages, os.path.join(fix, "seeds_wide.parquet"),
                      robots, seeded, cfg, seed_only=True)
        os.makedirs(out)
        shutil.copytree(os.path.join(seeded, "checkpoints"),
                        os.path.join(out, "checkpoints"))
        t0 = time.time()
        s = run_crawl(pages, "", robots, out, cfg, resume=True)
    else:
        t0 = time.time()
        s = run_crawl(pages, os.path.join(fix, "seeds.parquet"),
                      robots, out, cfg)
    wall = time.time() - t0
    _stop_util_sampler(sampler)
    out = {"tier": tier, "sec": round(wall, 2),
           "urls_fetched": s["urls_fetched"],
           "urls_per_sec": round(s["urls_fetched"] / wall, 1),
           "setup_s": s.get("setup_s"), "loop_s": s.get("loop_s"),
           "first_pop_s": s.get("first_pop_s"),
           "waves": s["waves"], "windows": s["windows"]}
    if s.get("epoch_log"):
        out["epoch_log"] = s["epoch_log"]
    return out


def _warmup() -> None:
    """Tiny crawl to spawn Ray workers + import the library in them —
    the timed run then measures steady-state engine throughput."""
    _crawl("t1", "warmup")


def _quiet_ray_data() -> None:
    """Keep the bench's stdout/stderr tail clean (the driver records
    the last KBs of output verbatim into BENCH_r*.json — round-1/2
    files carried 100+ KB of Ray Data INFO lines): progress bars off,
    ray.data loggers at ERROR."""
    import logging

    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    for name in ("ray.data", "ray.air", "ray.tune"):
        logging.getLogger(name).setLevel(logging.ERROR)


def _parse_rate_probe(seconds: float = 3.0) -> float | None:
    """Single-process ParseStage pages/s on the bench fixture — the
    box-phase indicator embedded in every bench JSON so a slow-VM
    session is visible inline (BASELINE.md records the fast/slow
    bands; round 3's headline ran in a slow phase and the JSON alone
    couldn't show it)."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.stages.parse import ParseStage
    shards = sorted(glob.glob(os.path.join(
        BENCH_ROOT, "*", "sharded_*", "shard-00000.parquet")))
    if not shards:
        return None
    t = pq.read_table(shards[0]).slice(0, 4096)
    t = t.append_column("status", pa.array([200] * t.num_rows, pa.int16()))
    ps = ParseStage()
    t0, n = time.time(), 0
    while time.time() - t0 < seconds:
        ps(t.slice(n % 2048, 512))
        n += 512
    return round(n / (time.time() - t0), 1)


def _hw_ceiling_control(levels: tuple[int, int], tier: str,
                        seconds: float = 4.0) -> dict | None:
    """Same-session hardware ceiling for the scaling ratio: the bare
    parse workload (scripts/hw_ceiling.py, no Ray) at the same two
    taskset-pinned core budgets. Embedded in the --scaling JSON so
    the efficiency number is interpretable without BASELINE.md
    archaeology: raw engine efficiency can never exceed this box's
    same-hour memory-bus ceiling."""
    import glob
    shards = sorted(glob.glob(os.path.join(
        BENCH_ROOT, tier, "sharded_*", "shard-00000.parquet")))
    if not shards:
        return None
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "hw_ceiling.py")
    rates: dict[int, float] = {}
    for c in levels:
        p = subprocess.run(
            ["taskset", "-c", f"0-{c - 1}", sys.executable, script,
             shards[0], "--levels", str(c), "--seconds", str(seconds),
             "--json"],
            capture_output=True, text=True, timeout=600)
        if p.returncode != 0:
            return None
        rates[c] = json.loads(p.stdout.strip().splitlines()[-1])[str(c)]
    out = {f"bare_parse_pages_per_sec_{c}": rates[c] for c in levels}
    if len(levels) == 2:
        lo, hi = levels
        out["hw_ceiling"] = round((rates[hi] / rates[lo]) / (hi / lo), 3)
    return out


def run_queries(sf_dir: str) -> dict:
    import __ray_entry__ as E
    qs = E.queries()
    # time the WHOLE registry (round-4 verdict: a hand-kept subset
    # drifted to 38 of 50, leaving a quarter of the registry invisible
    # to round-over-round perf comparison) ...
    wanted = list(qs)
    # ... plus events_hourly_hll, which left the driver registry (50-
    # entry gate cap) but stays benched: the approximate variant's
    # cost is the number a user trades against the exact path
    from crawler_ray.pipelines.analytics import events_hourly_hll
    qs["events_hourly_hll"] = events_hourly_hll
    wanted.append("events_hourly_hll")
    out = {}
    # min of 2 timed runs per query: single-shot numbers ride the
    # VM's ±25% phase drift and read as false regressions round over
    # round (the round-2 "q1/revenue 2x regression" was exactly this);
    # min is the standard noise-robust estimator for a deterministic
    # workload
    trials = int(os.environ.get("BENCH_QUERY_TRIALS", "2"))
    for name in wanted:
        secs = []
        for _ in range(trials):
            t0 = time.time()
            res = qs[name](sf_dir)
            # consume to a driver-side table (results are small
            # aggregates or per-doc rows at bench scale)
            import pyarrow as pa
            import ray as _ray
            if isinstance(res, _ray.data.Dataset):
                res.to_pandas()
            elif isinstance(res, pa.Table):
                pass
            secs.append(time.time() - t0)
        out[name] = round(min(secs), 2)
    return out


def knn_recall(sf_dir: str, approx_name: str = "knn_lsh") -> float:
    """recall@k of an ANN path vs exact brute force (same queries) —
    the number a user tunes the probe knobs against."""
    import __ray_entry__ as E
    qs = E.queries()
    brute = qs["knn_cosine"](sf_dir).to_pandas()
    approx = qs[approx_name](sf_dir).to_pandas()
    b = set(map(tuple, brute.values))
    a = set(map(tuple, approx.values))
    return round(len(a & b) / len(b), 3) if b else 1.0


def embedding_dedup_recall(sf_dir: str) -> float:
    """pair recall of the LSH-bucketed embedding dedup vs the exact
    block sweep at the same threshold."""
    import __ray_entry__ as E
    qs = E.queries()
    exact = qs["dedup_embedding"](sf_dir).to_pandas()
    lsh = qs["dedup_embedding_lsh"](sf_dir).to_pandas()
    e = set(map(tuple, exact[["a_id", "b_id"]].values))
    l = set(map(tuple, lsh[["a_id", "b_id"]].values))
    return round(len(e & l) / len(e), 3) if e else 1.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--horizon", action="store_true",
                    help="long-horizon leak check: drain the 16M-page "
                         "scale16 tier (uniform hosts, binding "
                         "politeness cap ⇒ ~18 equal windows) with "
                         "checkpoint epochs every 3 waves; reports "
                         "per-epoch URLs/s, checkpoint cost, and actor "
                         "RSS so throughput drift or heap growth is "
                         "visible epoch over epoch")
    ap.add_argument("--skew", action="store_true",
                    help="skew exhibit: equal-volume drain A/B (one "
                         "host owns 50%% of pages + one dup cluster "
                         "owns 10%% of docs, vs perfectly uniform) and "
                         "a dedup A/B (10%% one-cluster vs scattered "
                         "pairs); reports wall-time inflation ratios "
                         "against the <1.5x bar")
    ap.add_argument("--crawl-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--tier", default="bench")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--levels", default="8,32",
                    help="comma pair of CPU counts for --scaling (N,4N)")
    ap.add_argument("--shards", type=int, default=None,
                    help="override the CPU-derived crawl shard count")
    ap.add_argument("--scale-tier", default="scale",
                    help="drain fixture for --scaling: scale (1.5M pages,"
                         " ~20 s window) or scale4 (4.5M, >=60 s window)")
    ap.add_argument("--normalized", action="store_true",
                    help="run the bare-workload hw control IMMEDIATELY "
                         "before each --scaling engine trial (same pinned "
                         "cores), yielding a per-trial phase-normalized "
                         "engine share — the box's throughput swings ~1.5x "
                         "across hours and ASYMMETRICALLY across core "
                         "counts, so one end-of-session control cannot "
                         "normalize individual trials")
    ap.add_argument("--warm-fixture", action="store_true",
                    help="before --scaling trial 0, stream every byte "
                         "of the drain fixture through the OS page "
                         "cache (plain sequential reads, no Ray). "
                         "Removes the one-time cold-disk read tax that "
                         "hits the two CPU levels asymmetrically "
                         "(session 9: trial-0 pair efficiency 0.604 vs "
                         "0.82 warm) — on a real cluster the input "
                         "lives in distributed storage that both "
                         "cluster sizes read identically")
    ap.add_argument("--trial-gap", type=float, default=0.0,
                    help="seconds of cool-down between --scaling trial "
                         "processes (sustained back-to-back load degrades "
                         "this box's clock monotonically within a session "
                         "— measured: 4-CPU trials 157 -> 211 s over one "
                         "25-min run; gaps let trials sample the same "
                         "thermal/noisy-neighbor phase)")
    args = ap.parse_args()

    if args.scaling:
        # Fresh process per (level, trial), the contract's N vs 4N
        # cluster stand-in, with two noise controls:
        #  - trials INTERLEAVE the levels (8,32,8,32,...) so the
        #    box's ±30% background drift cancels out of the ratio
        #    instead of biasing whichever level ran second;
        #  - each process is taskset-pinned to its core budget
        #    (0..N-1), so an "8-CPU cluster" really is 8 physical
        #    cores — actors and I/O can't borrow idle cores the way
        #    they never could on a real 8-core node.
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        lo_cpus, hi_cpus = (int(x) for x in args.levels.split(","))
        # pre-build the drain fixture + BOTH CPU levels' shard layouts
        # here, unpinned (the wrapper owns the whole box): on a fresh
        # /tmp the build would otherwise happen inside pinned trial 0
        # — after --warm-fixture walked an empty directory — so trial
        # 0 would run cold-disk at the SMALL level, exactly the
        # asymmetric tax the warm flag exists to remove. Idempotent
        # (_DONE / meta.json markers), so trial subprocesses skip it.
        for _c in (lo_cpus, hi_cpus):
            _ensure_fixture(args.scale_tier, _n_shards(_c))
        if args.warm_fixture:
            fix = os.path.join(BENCH_ROOT, args.scale_tier)
            warmed = 0
            for root, _dirs, files in os.walk(fix):
                for f in files:
                    with open(os.path.join(root, f), "rb") as fh:
                        while fh.read(16 << 20):
                            pass
                        warmed += fh.tell()
            print(f"warmed {warmed / 1e9:.1f} GB of {fix} into page "
                  f"cache", file=sys.stderr)
        trial_secs = {lo_cpus: [], hi_cpus: []}
        loop_secs = {lo_cpus: [], hi_cpus: []}
        drain_secs = {lo_cpus: [], hi_cpus: []}
        urls = None
        bare_rates = {lo_cpus: [], hi_cpus: []}
        for t in range(args.trials):
            for cpus in (lo_cpus, hi_cpus):
                if args.trial_gap and (t or cpus != lo_cpus):
                    time.sleep(args.trial_gap)
                p = subprocess.run(
                    ["taskset", "-c", f"0-{cpus - 1}",
                     sys.executable, os.path.abspath(__file__),
                     "--crawl-only", "--cpus", str(cpus),
                     "--tier", args.scale_tier, "--trials", "1"],
                    capture_output=True, text=True, timeout=3600,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                    env={**os.environ, "CRAWLER_RAY_PHASE_TIMING": "1"})
                if p.returncode != 0:
                    print(p.stdout, p.stderr[-4000:], file=sys.stderr)
                    sys.exit(1)
                # persist the trial's phase/outlier lines: when one
                # leg of a session runs anomalously slow (s10 trial 2:
                # 58.2 s vs 46.6/47.0 in a clean box phase), these are
                # the only evidence that localizes WHICH wave stalled
                # and in which driver phase
                with open(f"/tmp/scaling_trial_{cpus}c_t{t}.err",
                          "w") as fh:
                    fh.write("\n".join(
                        ln for ln in p.stderr.splitlines()
                        if ln.startswith(("PHASE_TIMING",
                                          "WAVE_OUTLIERS", "POPWAIT"))))
                r = json.loads(p.stdout.strip().splitlines()[-1])
                trial_secs[cpus].append(r["crawl"]["sec"])
                loop_secs[cpus].append(r["crawl"].get("loop_s")
                                       or r["crawl"]["sec"])
                # steady drain = loop minus the measured one-time
                # actor-cold-start + checkpoint-restore barrier (the
                # first pop's blocked wait — per-node-parallel on a
                # real cluster, a near-constant startup tax on one box)
                drain_secs[cpus].append(
                    loop_secs[cpus][-1]
                    - (r["crawl"].get("first_pop_s") or 0.0))
                urls = r["crawl"]["urls_fetched"]
                if args.normalized:
                    # control runs AFTER the engine trial (still
                    # phase-adjacent) — before it, trial 0 on a fresh
                    # box would glob an unbuilt fixture, return None
                    # and silently void every normalized stat
                    ctl = _hw_ceiling_control((cpus,), args.scale_tier,
                                              seconds=4.0) or {}
                    bare_rates[cpus].append(
                        ctl.get(f"bare_parse_pages_per_sec_{cpus}"))
        med = {c: sorted(s)[len(s) // 2] for c, s in trial_secs.items()}
        ups = {c: round(urls / med[c], 1) for c in med}
        eff = (ups[hi_cpus] / ups[lo_cpus]) / (hi_cpus / lo_cpus)
        # secondary: drain-loop-only efficiency — excludes the one-time
        # disk-bound restore barrier, which is ~constant across CPU
        # levels on one box but per-node-parallel on a real cluster
        lmed = {c: sorted(s)[len(s) // 2] for c, s in loop_secs.items()}
        loop_eff = (lmed[lo_cpus] / lmed[hi_cpus]) / (hi_cpus / lo_cpus)
        dmed = {c: sorted(s)[len(s) // 2] for c, s in drain_secs.items()}
        drain_eff = (dmed[lo_cpus] / dmed[hi_cpus]) / (hi_cpus / lo_cpus)
        hw = _hw_ceiling_control((lo_cpus, hi_cpus), args.scale_tier) or {}
        ceiling = hw.get("hw_ceiling")
        norm = {}
        if args.normalized and all(bare_rates[lo_cpus]) \
                and all(bare_rates[hi_cpus]):
            # per-trial phase normalization: each trial's engine ratio
            # divided by ITS OWN adjacent bare-workload ratio — the
            # estimator that survives the box's asymmetric hour-scale
            # throughput swings (raw medians cannot)
            pair_eff, pair_ceiling, pair_share = [], [], []
            for t in range(args.trials):
                e = (loop_secs[lo_cpus][t] / loop_secs[hi_cpus][t]) \
                    / (hi_cpus / lo_cpus)
                c = (bare_rates[hi_cpus][t] / bare_rates[lo_cpus][t]) \
                    / (hi_cpus / lo_cpus)
                pair_eff.append(round(e, 3))
                pair_ceiling.append(round(c, 3))
                pair_share.append(round(e / c, 3))
            norm = {
                "per_trial_loop_eff": pair_eff,
                "per_trial_hw_ceiling": pair_ceiling,
                "per_trial_engine_share": pair_share,
                "median_engine_share":
                    sorted(pair_share)[len(pair_share) // 2],
                f"bare_trial_rates_{lo_cpus}": bare_rates[lo_cpus],
                f"bare_trial_rates_{hi_cpus}": bare_rates[hi_cpus],
            }
        print(json.dumps({
            "metric": f"frontier-drain scaling efficiency ({lo_cpus} -> "
                      f"{hi_cpus} CPUs, fresh taskset-pinned processes, "
                      f"interleaved trials x{args.trials}, "
                      f"{args.scale_tier} drain fixture)",
            "value": round(eff, 3), "unit": "efficiency",
            f"urls_per_sec_{lo_cpus}": ups[lo_cpus],
            f"urls_per_sec_{hi_cpus}": ups[hi_cpus],
            f"sec_{lo_cpus}": med[lo_cpus], f"sec_{hi_cpus}": med[hi_cpus],
            f"trial_secs_{lo_cpus}": trial_secs[lo_cpus],
            f"trial_secs_{hi_cpus}": trial_secs[hi_cpus],
            "loop_only_efficiency": round(loop_eff, 3),
            # barrier-excluded steady drain (loop minus the per-trial
            # MEASURED first-pop wait = actor cold start + checkpoint
            # restore; per-node-parallel on a real cluster)
            "drain_only_efficiency": round(drain_eff, 3),
            f"drain_secs_{lo_cpus}": [round(x, 3)
                                      for x in drain_secs[lo_cpus]],
            f"drain_secs_{hi_cpus}": [round(x, 3)
                                      for x in drain_secs[hi_cpus]],
            f"loop_secs_{lo_cpus}": loop_secs[lo_cpus],
            f"loop_secs_{hi_cpus}": loop_secs[hi_cpus],
            "urls_fetched": urls,
            "warm_fixture": bool(args.warm_fixture),
            # same-session bare-workload control (memory-bus ceiling)
            **hw,
            "engine_share_of_ceiling": (round(eff / ceiling, 3)
                                        if ceiling else None),
            **norm,
        }))
        return

    cpus = args.cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    import crawler_ray
    crawler_ray.suppress_empty_schema_divergence_warning()
    _quiet_ray_data()

    if args.horizon:
        ns = args.shards or _n_shards(cpus)
        _ensure_fixture("scale16", ns)
        _warmup()
        r = _crawl("scale16", f"horizon_{cpus}", wide_seeds=True,
                   n_shards=ns)
        epochs = r.pop("epoch_log", [])
        # per-epoch deltas: URLs/s between consecutive epochs (the
        # flatness series), RSS trajectory (the leak series)
        rates, prev_u, prev_t = [], 0, 0.0
        for e in epochs:
            dt = e["loop_t_s"] - prev_t
            rates.append(round((e["urls"] - prev_u) / dt, 1) if dt > 0
                         else None)
            prev_u, prev_t = e["urls"], e["loop_t_s"]
        steady = [x for x in rates[1:] if x]   # epoch 0 includes ramp-up
        flatness = (round(max(steady) / min(steady), 3)
                    if len(steady) >= 2 else None)
        print(json.dumps({
            "metric": f"scale16 long-horizon drain ({cpus} CPUs, "
                      f"{len(epochs)} checkpoint epochs)",
            "value": r["sec"], "unit": "sec", "num_cpus": cpus,
            "crawl": r,
            "per_epoch_urls_per_sec": rates,
            "steady_flatness_max_over_min": flatness,
            "checkpoint_s": [e["checkpoint_s"] for e in epochs],
            "seen_rss_mb_max": [e["seen_rss_mb_max"] for e in epochs],
            "frontier_rss_mb_max": [e["frontier_rss_mb_max"]
                                    for e in epochs],
            "seen_size": [e["seen_size"] for e in epochs],
            "epoch_log": epochs,
        }))
        ray.shutdown()
        return

    if args.skew:
        ns = args.shards or _n_shards(cpus)
        for tier in ("skewu", "skews"):
            _ensure_fixture(tier, ns)
        _warmup()
        # interleaved min-of-2 drains, identical tier config
        drains = {t: [] for t in ("skewu", "skews")}
        for trial in range(2):
            for tier in ("skewu", "skews"):
                drains[tier].append(_crawl(tier, f"skew_{tier}_{trial}",
                                           wide_seeds=True, n_shards=ns))
        crawl_u = min(c["loop_s"] for c in drains["skewu"])
        crawl_s = min(c["loop_s"] for c in drains["skews"])
        # dedup A/B: 10% of docs in ONE near-dup cluster vs the same
        # dup volume as scattered pairs; times the minhash-LSH pair
        # stage (star-collapse keeps the mega bucket linear) plus
        # full components assignment
        from crawler_ray.dedup import minhash_lsh_pairs, dup_components
        from crawler_ray.fixtures import write_documents_fixture
        dd = {}
        for name, kw in (("uniform", dict(dup_pair_share=0.10)),
                         ("skewed", dict(dup_cluster_share=0.10))):
            d = os.path.join(BENCH_ROOT, f"skewdocs_{name}")
            write_documents_fixture(d, n_docs=40_000, **kw)
            secs = []
            for _ in range(2):
                import ray.data as rd
                t0 = time.time()
                docs = rd.read_parquet(
                    os.path.join(d, "documents.parquet"),
                    columns=["doc_id", "text"])
                pairs = minhash_lsh_pairs(docs, threshold=0.7)
                ids = rd.read_parquet(
                    os.path.join(d, "documents.parquet"),
                    columns=["doc_id"])
                comp = dup_components(pairs, ids)
                n_comp = comp.to_pandas()["component"].nunique()
                secs.append(time.time() - t0)
            dd[name] = {"sec": round(min(secs), 2), "components": int(n_comp)}
        crawl_ratio = round(crawl_s / crawl_u, 3)
        dedup_ratio = round(dd["skewed"]["sec"] / dd["uniform"]["sec"], 3)
        print(json.dumps({
            "metric": "skew exhibit: wave-time inflation (skewed / "
                      "uniform, equal volume, min-of-2 interleaved)",
            "value": crawl_ratio, "unit": "ratio", "num_cpus": cpus,
            "crawl_loop_s_uniform": crawl_u, "crawl_loop_s_skewed": crawl_s,
            "crawl_inflation": crawl_ratio,
            "crawl_bar_1_5x": crawl_ratio < 1.5,
            "crawl_uniform": drains["skewu"], "crawl_skewed": drains["skews"],
            "dedup_uniform": dd["uniform"], "dedup_skewed": dd["skewed"],
            "dedup_inflation": dedup_ratio,
            "dedup_bar_1_5x": dedup_ratio < 1.5,
        }))
        ray.shutdown()
        return

    if args.crawl_only:
        ns = args.shards or _n_shards(cpus)
        _ensure_fixture(args.tier, ns)
        _warmup()
        trials = [_crawl(args.tier, f"crawl_{cpus}_{t}",
                         wide_seeds=args.tier.startswith("scale"),
                         n_shards=ns)
                  for t in range(args.trials)]
        # median trial (VM timing noise is ±15%)
        trials.sort(key=lambda c: c["sec"])
        crawl = trials[len(trials) // 2]
        print(json.dumps({"num_cpus": cpus, "crawl": crawl,
                          "trial_secs": [c["sec"] for c in trials]}))
        ray.shutdown()
        return

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    t_total = time.time()
    ns = _n_shards(cpus)
    _ensure_fixture("bench", ns)
    box_phase = _parse_rate_probe()
    _warmup()
    # median of 3 crawl trials: the headline number must not ride one
    # draw of the VM's ±25% wall-clock drift
    crawl_trials = sorted(
        (_crawl("bench", f"crawl_{cpus}_{t}", n_shards=ns)
         for t in range(3)), key=lambda c: c["sec"])
    crawl = crawl_trials[1]
    queries = run_queries(sf_dir)
    recall = knn_recall(sf_dir)
    recall_ivf = knn_recall(sf_dir, "knn_ivf")
    dedup_recall = embedding_dedup_recall(sf_dir)
    # per-run measured quality for the langid heuristic (the analogue
    # of the ANN recall lines; labeled held-out sentences — the
    # testdata's lang column is synthetic-lorem, not ground truth)
    from crawler_ray.functions.langid import labeled_accuracy
    langid_acc = labeled_accuracy()
    total = time.time() - t_total
    queries["crawl_bench_200k"] = crawl["sec"]
    # headline = crawl median + per-query minimums: comparable across
    # rounds regardless of how many noise-control repeats ran
    suite = round(sum(queries.values()), 2)
    print(json.dumps({
        "metric": "crawl 200k pages (full engine) + query suite time "
                  "(crawl median-of-3 + per-query min-of-2)",
        "value": suite, "unit": "sec",
        "wall_gross_s": round(total, 2),
        "queries": queries, "sf": sf, "num_cpus": cpus,
        "crawl_urls_per_sec": crawl["urls_per_sec"],
        "crawl": crawl,
        "crawl_trial_secs": [c["sec"] for c in crawl_trials],
        "knn_lsh_recall_at_10": recall,
        "knn_ivf_recall_at_10": recall_ivf,
        "embedding_lsh_pair_recall": dedup_recall,
        "langid_labeled_accuracy": langid_acc,
        # single-core parse pages/s at run start — the box-phase
        # indicator (compare against BASELINE.md's fast/slow bands)
        "box_phase_pages_per_sec": box_phase,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
