"""Per-source conformance health-check (SURVEY §3.3c).

The reference's "reachability analysis" evaluates golden XPaths
against live page source per DPA, colors the source tree WHITE/BLACK,
renders it, and files a GitHub issue on failure
(``services/reachability_analysis_service/__init__.py:47-57``,
``build_dpa_node_service/__init__.py:12-58``,
``report_reachability_issue_service/__init__.py:62-78``). It is the
reference's only systematic correctness harness.

Engine version: one streaming pass over a page corpus checks the
structural invariants each source's parser depends on —

- the seed URL exists in the corpus;
- listing pages yield result rows or a next link;
- detail pages yield non-empty extracted text;
- the binary/empty page fraction stays under a threshold —

aggregated per host via per-batch partials → ``groupby(host)``
(pre-aggregation pattern: the shuffle moves one counter row per host
per block). Output: one row per source with WHITE/BLACK status, plus
a markdown issue body (M24 templater) for every BLACK source.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from crawler_ray.sinks import render_markdown
from crawler_ray.stages.parse import ParseStage
from crawler_ray.arrowutil import table_from_pandas as _table_from_pandas

__all__ = ["conformance_report", "ISSUE_TEMPLATE"]

ISSUE_TEMPLATE = """\
## Source structure check failed: {{host}}

- pages: {{n_pages}} (listings {{n_listings}}, details {{n_details}}, \
binary/empty {{n_nonhtml}}, structureless {{n_other}})
- seed present: {{seed_ok}}
- empty listings: {{empty_listings}}
- empty details: {{empty_details}}

The source's page structure no longer matches the parser contract —
listing/detail extraction would silently yield nothing. (Engine
analogue of the reference's auto-filed reachability issue.)
"""


def conformance_report(pages_path: str, seeds_path: str,
                       max_nonhtml_frac: float = 0.25
                       ) -> tuple[pd.DataFrame, dict[str, str]]:
    """Returns (per-source status table, {host: markdown issue} for
    every BLACK source)."""
    import pyarrow.parquet as pq

    from crawler_ray.urlnorm import host_of

    seed_hosts = {host_of(u): u for u in
                  pq.read_table(seeds_path, columns=["url"])
                  ["url"].to_pylist()}
    seed_urls = set(seed_hosts.values())

    def partial(batch: pa.Table) -> pa.Table:
        parsed = ParseStage()(batch)
        df = pd.DataFrame({
            "host": [host_of(u) for u in parsed["url"].to_pylist()],
            "kind": parsed["kind"].to_pylist(),
            "has_text": [len(t) > 0 for t in parsed["text"].to_pylist()],
            "n_results": [
                len(r) for r in parsed["link_url"].to_pylist()],
            "is_seed": [u in seed_urls for u in parsed["url"].to_pylist()],
        })
        g = pd.DataFrame({
            "n_pages": df.groupby("host").size(),
            "n_listings": df[df.kind == "listing"].groupby("host").size(),
            "n_details": df[df.kind == "detail"].groupby("host").size(),
            "n_nonhtml": df[df.kind.isin(["binary", "empty"])]
            .groupby("host").size(),
            "n_other": df[df.kind == "other"].groupby("host").size(),
            "empty_listings": df[(df.kind == "listing")
                                 & (df.n_results == 0)]
            .groupby("host").size(),
            "empty_details": df[(df.kind == "detail") & (~df.has_text)]
            .groupby("host").size(),
            "seed_seen": df[df.is_seed].groupby("host").size(),
        }).fillna(0).astype(np.int64).reset_index()
        return _table_from_pandas(g)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns=["host"]).sum().to_frame().T
        out.insert(0, "host", g["host"].iloc[0])
        return out

    agg = (ray.data.read_parquet(pages_path, columns=["url", "html"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("host")
           .map_groups(merge, batch_format="pandas")
           .to_pandas())

    agg["seed_ok"] = agg.apply(
        lambda r: (r["host"] not in seed_hosts) or r["seed_seen"] > 0,
        axis=1)
    agg["status"] = np.where(
        agg["seed_ok"]
        & (agg["empty_listings"] == 0)
        & (agg["empty_details"] == 0)
        # "other" = parsed to nothing (no results, no next, no text):
        # the shape a broken container/selector produces
        & (agg["n_other"] == 0)
        & (agg["n_nonhtml"] <= max_nonhtml_frac * agg["n_pages"]),
        "WHITE", "BLACK")

    issues = {}
    for r in agg[agg["status"] == "BLACK"].to_dict("records"):
        issues[r["host"]] = render_markdown(ISSUE_TEMPLATE, r)
    return agg.sort_values("host").reset_index(drop=True), issues
