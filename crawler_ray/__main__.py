"""CLI — the engine's equivalent of the reference's ``gdprCrawler``
console script (``setup.py:25-27``, click commands at
``gdprCrawler.py:47-54``).

    python -m crawler_ray crawl   --pages P --seeds S --robots R --out O
    python -m crawler_ray resume  --pages P --robots R --out O
    python -m crawler_ray extract --pages P --out O
    python -m crawler_ray docs    --crawl-out O --docs-out D [--tree]
    python -m crawler_ray fixture --out DIR --tier t1|t2|bench|scale

Owns the Ray session (init/shutdown); the library never does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_init(cpus: int | None):
    import ray
    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "ignore_reinit_error": True}
        if cpus:
            kwargs["num_cpus"] = cpus
        ray.init(**kwargs)
    return ray


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="crawler_ray")
    ap.add_argument("--cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    pc = sub.add_parser("crawl", help="run a crawl to completion")
    pc.add_argument("--pages", required=True)
    pc.add_argument("--seeds", required=True)
    pc.add_argument("--robots", required=True)
    pc.add_argument("--out", required=True)
    pc.add_argument("--shards", type=int, default=4)
    pc.add_argument("--round-ms", type=int, default=60_000)
    pc.add_argument("--politeness-cap", type=int, default=10_000)
    pc.add_argument("--checkpoint-every", type=int, default=0)
    pc.add_argument("--max-depth", type=int, default=None)
    pc.add_argument("--seen-filter", choices=["sig", "bloom", "cuckoo"],
                    default="sig")

    pr = sub.add_parser("resume", help="resume from the latest checkpoint")
    for a in ("--pages", "--robots", "--out"):
        pr.add_argument(a, required=True)
    pr.add_argument("--shards", type=int, default=4)
    pr.add_argument("--round-ms", type=int, default=60_000)
    pr.add_argument("--politeness-cap", type=int, default=10_000)
    pr.add_argument("--checkpoint-every", type=int, default=0)

    pe = sub.add_parser("extract", help="streaming corpus extraction")
    pe.add_argument("--pages", required=True)
    pe.add_argument("--out", required=True)

    pd = sub.add_parser("docs", help="finalize deduped docs from a crawl")
    pd.add_argument("--crawl-out", required=True)
    pd.add_argument("--docs-out", required=True)
    pd.add_argument("--tree", action="store_true",
                    help="also export the reference-layout file tree")

    pf = sub.add_parser("fixture", help="generate a synthetic web fixture")
    pf.add_argument("--out", required=True)
    pf.add_argument("--tier", default="t1",
                    choices=["t1", "t2", "bench", "scale"])
    pf.add_argument("--seed", type=int, default=42)

    args = ap.parse_args(argv)

    if args.cmd == "fixture":               # no Ray needed
        from crawler_ray.fixtures import write_fixture
        out = write_fixture(args.out, args.tier, args.seed)
        print(json.dumps({"fixture": out}))
        return 0

    ray = _ray_init(args.cpus)
    try:
        if args.cmd in ("crawl", "resume"):
            from crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
            cfg = CrawlConfig(
                n_frontier_shards=args.shards, n_seen_shards=args.shards,
                n_page_shards=args.shards, round_ms=args.round_ms,
                politeness_cap=args.politeness_cap,
                checkpoint_every=args.checkpoint_every,
                max_depth=getattr(args, "max_depth", None),
                seen_filter=getattr(args, "seen_filter", "sig"))
            summary = run_crawl(args.pages,
                                getattr(args, "seeds", ""), args.robots,
                                args.out, cfg,
                                resume=(args.cmd == "resume"))
            print(json.dumps(summary))
        elif args.cmd == "extract":
            from crawler_ray.pipelines.extract import extracted_docs
            ds = extracted_docs(args.pages, args.out)
            print(json.dumps({"docs": ds.count(), "out": args.out}))
        elif args.cmd == "docs":
            from crawler_ray.pipelines.crawl import finalize_docs
            ds = finalize_docs(args.crawl_out, args.docs_out)
            n = ds.count()
            if args.tree:
                from crawler_ray.sinks import export_reference_layout
                export_reference_layout(
                    ds, os.path.join(args.docs_out + "_tree"))
            print(json.dumps({"docs": n, "out": args.docs_out}))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
