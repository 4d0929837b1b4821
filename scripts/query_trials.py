#!/usr/bin/env python
"""Per-query median wall time over N fresh-process trials.

Regression triage tool (round-2 verdict #1): q1_pricing_summary and
revenue_by_nation jumped 2.1-2.3x between rounds 1 and 2 on a box with
±25% session drift. This runs a query subset in FRESH Ray processes,
one process per trial (so object-store pressure from earlier queries
in the suite can't bleed into the measurement), and reports per-query
median + min/max.

Usage: python scripts/query_trials.py [--trials 3] [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    "q1_pricing_summary", "revenue_by_nation", "top_parts_by_revenue",
    "events_hourly", "dedup_minhash",
]


def run_once(names: list[str], sf_dir: str, cpus: int) -> dict:
    import ray
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    sys.path.insert(0, REPO)
    import __ray_entry__ as E
    qs = E.queries()
    # warm up Ray workers + library imports with one cheap query so
    # the timed runs measure the engine, not process spawn
    qs[names[0]](sf_dir).to_pandas()
    out = {}
    for name in names:
        t0 = time.time()
        qs[name](sf_dir).to_pandas()
        out[name] = round(time.time() - t0, 2)
    ray.shutdown()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--sf-dir",
                    default=os.environ.get("GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--one-trial", action="store_true",
                    help="internal: run queries once, print JSON")
    args = ap.parse_args()
    names = args.queries.split(",")

    if args.one_trial:
        print(json.dumps(run_once(names, args.sf_dir, args.cpus)))
        return

    per_query: dict[str, list[float]] = {n: [] for n in names}
    for t in range(args.trials):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one-trial",
             "--queries", args.queries, "--sf-dir", args.sf_dir,
             "--cpus", str(args.cpus)],
            capture_output=True, text=True, timeout=1800, cwd=REPO)
        if p.returncode != 0:
            print(p.stdout, p.stderr[-4000:], file=sys.stderr)
            sys.exit(1)
        r = json.loads(p.stdout.strip().splitlines()[-1])
        for n, s in r.items():
            per_query[n].append(s)
    summary = {n: {"median": sorted(v)[len(v) // 2],
                   "min": min(v), "max": max(v), "trials": v}
               for n, v in per_query.items()}
    print(json.dumps({"sf_dir": args.sf_dir, "num_cpus": args.cpus,
                      "trials": args.trials, "queries": summary},
                     indent=1))


if __name__ == "__main__":
    main()
