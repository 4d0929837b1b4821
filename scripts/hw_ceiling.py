"""Hardware scaling ceiling for the crawl's parse workload.

Runs the actual hot-path transform (``ParseStage`` over real fixture
batches) in N independent OS processes (no Ray, no engine — pure
workload) and reports aggregate throughput at 1 / 8 / 32 processes.
The 8→32 ratio bounds ANY engine's measurable 8→32-CPU scaling
efficiency on this box: Python/Arrow parse is memory-bound, and
32 cores share one memory bus (real N→4N *node* scaling adds memory
bandwidth with every node and does not face this ceiling).

Usage: python scripts/hw_ceiling.py [pages_parquet]
Writes the measured ratios to stdout; referenced by BASELINE.md.
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time


def work(args):
    path, seconds = args
    sys.path.insert(0, "/root/repo")
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.stages.parse import ParseStage
    t = pq.read_table(path).slice(0, 4096)
    t = t.append_column("status", pa.array([200] * t.num_rows, pa.int16()))
    ps = ParseStage()
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        ps(t.slice(n % 2048, 512))
        n += 512
    return n / (time.time() - t0)


def main() -> None:
    import argparse
    import json
    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?", default=
                    "/tmp/crawler_ray_bench/scale/sharded_8/"
                    "shard-00000.parquet")
    ap.add_argument("--levels", default="1,4,8,16,32",
                    help="comma list of process counts to measure")
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--json", action="store_true",
                    help="print one JSON dict {procs: pages_per_sec} "
                         "as the last line (bench.py control mode)")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    results = {}
    for procs in levels:
        with mp.Pool(procs) as p:
            rates = p.map(work, [(args.path, args.seconds)] * procs)
        results[procs] = sum(rates)
        if not args.json:
            print(f"{procs:>2} procs: {results[procs]:8.0f} pages/s "
                  f"aggregate ({results[procs] / procs:6.0f} per proc)")
    if args.json:
        print(json.dumps({str(k): round(v, 1) for k, v in results.items()}))
        return
    for lo, hi in ((8, 32), (4, 16)):
        if lo in results and hi in results:
            ratio = results[hi] / results[lo]
            print(f"{lo}->{hi} speedup: {ratio:.2f}x  "
                  f"=> hardware scaling-efficiency ceiling {ratio / 4:.2f}")


if __name__ == "__main__":
    main()
