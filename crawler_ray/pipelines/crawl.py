"""The crawl engine: frontier wave loop + checkpoint/resume.

Equivalent of the reference's whole ``scrape`` lifecycle
(``gdprCrawler.py:47-301`` + every per-DPA ``get_docs_*`` loop), as
rounds ("waves") over sharded actors:

    seeds → seen-admit → frontier.push
    while frontier not empty:
        popped  = frontier.pop_wave()            (priority + politeness)
        ranked  = sort (host, depth, parent, dom) → pop_rank
        fetch+parse on the page-store actor pool  (hash-join J5 +
                 ParseStage, data-local; 404 = missing page;
                 parsed part → Parquet out_dir/parsed/wave=W/;
                 link candidates fan out to the seen shards)
        commit_wave on seen shards (dedup+robots+admit) → admitted
                 entries pushed actor→actor to the frontier shards
        every k waves: atomic checkpoint epoch (frontier+seen+meta)

Execution note (why this loop is not one big ``Dataset`` pipeline):
the frontier is *iterative* — wave N+1's input depends on wave N's
parse output through mutable shared state (seen set, priority heaps,
politeness budgets), which the Dataset API cannot express. The batch
transform is the same callable the pure Ray Data pipelines use
(``stages/parse.py``); here it runs inside the page-store actor pool
(= ``map_batches(FetchParse, concurrency=n_page_shards)`` semantics)
because the loop executes dozens of small waves where per-wave
Dataset instantiation (~1 s) would dominate; the wave protocol is
three actor barriers (pop / fetch_parse / commit) with small control
tables passed inline (see ``sources.pages.pack``).

Checkpoint/resume (north_rule): every ``checkpoint_every`` waves the
driver snapshots every frontier shard + seen shard + counters into
``out_dir/checkpoints/epoch_W.tmp`` and atomically renames it to
``epoch_W`` with a ``_COMMIT`` marker. Resume loads the newest
committed epoch, restores the actors, deletes ``parsed/wave>W`` output
dirs, and continues — determinism makes the rerun byte-equal to an
uninterrupted run.

Scale notes: popped-wave ranking is a driver-side Arrow sort bounded
by Σ politeness budgets per wave (documented scale path: distributed
``ds.sort`` + zipped ranks); mega-host skew affects only heap
bookkeeping on its frontier shard — fetch/parse work is spread by
``url_hash``; the seen set never materializes in one place (bloom +
exact per shard).
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from crawler_ray.functions.dates import PINNED_NOW
from crawler_ray.sources.pages import build_page_stores, pack
from crawler_ray.state.frontier import make_frontier_shards
from crawler_ray.state.seen import make_seen_shards
from crawler_ray.urlnorm import canonicalize, hash64_many, host_of

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
    now = PINNED_NOW


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
    hosts = [host_of(u) for u in urls.to_pylist()]
    return pa.table({
        "url": urls, "url_hash": hashes,
        "host": pa.array(hosts, pa.string()),
        "depth": pa.array(depth, pa.int32()),
        "parent_order": pa.array(parent, pa.int64()),
        "dom_idx": doms.cast(pa.int32()),
    })


def _offer_candidates(cands: pa.Table, seen_shards: list,
                      max_depth: int | None) -> None:
    """Route candidates to seen shards by url_hash and block on acks
    (driver-side path, used for seed scheduling; wave-time fan-out
    happens inside PageStore.fetch_parse)."""
    if max_depth is not None:
        cands = cands.filter(pc.less_equal(cands["depth"], max_depth))
    if cands.num_rows == 0:
        return
    hashes = cands["url_hash"].to_numpy(zero_copy_only=False)
    shard = (hashes % np.uint64(len(seen_shards))).astype(np.int64)
    acks = []
    for s in range(len(seen_shards)):
        mask = shard == s
        if mask.any():
            acks.append(seen_shards[s].offer.remote(
                pack(cands.filter(pa.array(mask)))))
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
              resume: bool = False, stop_after_waves: int | None = None) -> dict:
    """Run (or resume) a crawl. Returns a summary dict.

    ``stop_after_waves`` aborts mid-crawl after N waves *post
    checkpoint* — used by the resume-equivalence tests to simulate a
    kill."""
    cfg = cfg or CrawlConfig()
    os.makedirs(out_dir, exist_ok=True)
    parsed_root = os.path.join(out_dir, "parsed")
    os.makedirs(parsed_root, exist_ok=True)

    robots_t = pq.read_table(robots_path)
    robots = {h: list(d or []) for h, d in zip(
        robots_t["host"].to_pylist(), robots_t["disallow_prefixes"].to_pylist())}
    delays = {h: int(c) for h, c in zip(robots_t["host"].to_pylist(),
                                        robots_t["crawl_delay_ms"].to_pylist())}

    frontier_shards = make_frontier_shards(cfg.n_frontier_shards, delays,
                                           cfg.round_ms, cfg.politeness_cap)
    seen_shards = make_seen_shards(cfg.n_seen_shards,
                                   cfg.seen_capacity_per_shard, robots)
    ray.get([s.set_frontier.remote(frontier_shards) for s in seen_shards])
    page_stores = build_page_stores(pages_path, cfg.n_page_shards)
    ray.get([p.set_sinks.remote(seen_shards) for p in page_stores])

    def push_admitted() -> int:
        """commit_wave on every seen shard (each pushes its admitted
        entries to the frontier shards actor-to-actor)."""
        return sum(ray.get([s.commit_wave.remote() for s in seen_shards]))

    wave = window = 0
    pop_rank = 0
    if resume:
        epoch = _latest_epoch(out_dir)
        if epoch is None:
            raise FileNotFoundError(f"no committed checkpoint under {out_dir}")
        meta = json.load(open(os.path.join(epoch, "meta.json")))
        wave, window, pop_rank = meta["wave"], meta["window"], meta["pop_rank"]
        ray.get([f.restore.remote(os.path.join(epoch, f"frontier_{i:04d}.parquet"))
                 for i, f in enumerate(frontier_shards)] +
                [s.restore.remote(os.path.join(epoch, f"seen_{i:04d}.parquet"))
                 for i, s in enumerate(seen_shards)])
        for d in os.listdir(parsed_root):          # drop post-epoch partial waves
            if d.startswith("wave=") and int(d.split("=")[1]) >= wave:
                shutil.rmtree(os.path.join(parsed_root, d))
    else:
        seeds_t = pq.read_table(seeds_path)
        urls = [canonicalize(u) for u in seeds_t["url"].to_pylist()]
        cand = pa.table({
            "url": pa.array(urls, pa.string()),
            "url_hash": pa.array(hash64_many(urls), pa.uint64()),
            "host": pa.array([host_of(u) for u in urls], pa.string()),
            "depth": pa.array([0] * len(urls), pa.int32()),
            "parent_order": pa.array([-1] * len(urls), pa.int64()),
            "dom_idx": seeds_t["seed_rank"].cast(pa.int32()),
        })
        _offer_candidates(cand, seen_shards, cfg.max_depth)
        push_admitted()

    waves_done = 0
    while True:
        parts = [t for t in ray.get(
            [f.pop_wave.remote() for f in frontier_shards]) if t is not None]
        if not parts:
            if sum(ray.get([f.size.remote() for f in frontier_shards])) == 0:
                break
            window += 1
            ray.get([f.reset_window.remote() for f in frontier_shards])
            continue
        popped = pa.concat_tables(parts)
        order = pc.sort_indices(popped, sort_keys=[
            ("host", "ascending"), ("depth", "ascending"),
            ("parent_order", "ascending"), ("dom_idx", "ascending")])
        popped = popped.take(order)
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

        # fused fetch+parse on the page-store actor pool (data-local
        # hash-join + ParseStage + parsed-part write + link fan-out)
        hashes = popped["url_hash"].to_numpy(zero_copy_only=False)
        shard = (hashes % np.uint64(cfg.n_page_shards)).astype(np.int64)
        refs = []
        for s in range(cfg.n_page_shards):
            mask = shard == s
            if mask.any():
                refs.append(page_stores[s].fetch_parse.remote(
                    pack(popped.filter(pa.array(mask))),
                    os.path.join(tmp_wave, f"part-{s:05d}.parquet"),
                    cfg.now, cfg.max_depth))
        ray.get(refs)
        os.rename(tmp_wave, wave_dir)

        push_admitted()
        wave += 1
        waves_done += 1
        if cfg.checkpoint_every and wave % cfg.checkpoint_every == 0:
            _checkpoint(out_dir, wave, window, pop_rank,
                        frontier_shards, seen_shards)
            if stop_after_waves is not None and waves_done >= stop_after_waves:
                return {"aborted_at_wave": wave, "out_dir": out_dir}

    _checkpoint(out_dir, wave, window, pop_rank, frontier_shards, seen_shards)
    seen_stats = ray.get([s.stats.remote() for s in seen_shards])
    frontier_stats = ray.get([f.stats.remote() for f in frontier_shards])
    summary = {
        "out_dir": out_dir,
        "waves": wave,
        "windows": window + 1,
        "urls_fetched": pop_rank,
        "seen_size": sum(s["size"] for s in seen_stats),
        "robots_excluded": sum(s["robots_excluded"] for s in seen_stats),
        "dup_discovery": sum(s["dup_discovery"] for s in seen_stats),
        "frontier_remaining": sum(f["size"] for f in frontier_stats),
    }
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
    (oracle rule 8) — a groupby shuffle keyed by doc_key."""
    import pandas as pd

    def first_by_rank(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(1, "pop_rank")

    ds = (parsed_dataset(out_dir)
          .filter(expr="doc_ok == True")
          .select_columns(["doc_key", "doc_hash", "url", "host", "title",
                           "release_date", "lang", "text", "pop_rank"])
          .groupby("doc_key")
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
        df["links"] = pc.list_value_length(batch["link_url"]).to_numpy(
            zero_copy_only=False).astype("int64")
        df["rows"] = 1
        g = df.groupby(["wave", "window"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = (parsed_dataset(out_dir)
             .map_batches(agg, batch_format="pyarrow")
             .to_pandas())
    final = parts.groupby(["wave", "window"], as_index=False).sum() \
                 .sort_values("wave")
    return pa.Table.from_pandas(final, preserve_index=False)
