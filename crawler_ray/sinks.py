"""Output sinks (SURVEY §2.1 S5-S7) + the M24 markdown templater.

- ``write_docs_parquet`` — the engine's primary sink: partitioned
  Parquet (resumable; one directory per partition value), replacing
  the reference's per-document filesystem tree.
- ``export_reference_layout`` — byte-parity export of the reference's
  tree ``<path>/<host>/<doc_hash>/`` with ``<lang>.txt`` and a
  ``metadata.json`` rendered exactly like
  ``pygdpr/models/dpa/austria/__init__.py:139-148`` (keys
  ``title.{lang}``, ``md5``, ``releaseDate``, ``url``; ``indent=4,
  sort_keys=True``) — runs as a ``map_batches`` side-effect stage so
  the export is distributed, and is idempotent (keyed by doc_hash).
- ``write_stopwords_json`` — S7 (``services/gdpr_stopwords_service
  .py:20-26``): aggregate result → json/txt assets.
- ``render_markdown`` — M24 (``services/markdown_formatting_service/
  __init__.py:1-12``): ``{{key}}`` substitution.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

__all__ = ["write_docs_parquet", "export_reference_layout",
           "write_stopwords_json", "render_markdown", "metadata_json",
           "export_reachability_svg"]


def write_docs_parquet(docs, out_dir: str,
                       partition_cols: list[str] | None = None):
    """Partitioned Parquet docs sink (default partition: host — the
    engine's analogue of the reference's per-country dirs)."""
    docs.write_parquet(out_dir,
                       partition_cols=partition_cols or ["host"])
    return out_dir


def metadata_json(title: str, lang: str, doc_hash: str,
                  release_date_iso: str, url: str) -> str:
    """Reference-identical metadata.json body (austria:139-148)."""
    return json.dumps({
        f"title.{lang}": title,
        "md5": doc_hash,
        "releaseDate": release_date_iso,
        "url": url,
    }, indent=4, sort_keys=True)


def export_reference_layout(docs, out_dir: str):
    """Write the reference's ``<host>/<doc_hash>/{<lang>.txt,
    metadata.json}`` tree from a docs Dataset — distributed via
    map_batches (each task writes its rows; doc_hash-keyed paths make
    re-runs idempotent)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_rows(batch: pa.Table) -> pa.Table:
        n_written = []
        for row in batch.to_pylist():
            d = os.path.join(out_dir, row["host"], row["doc_hash"])
            os.makedirs(d, exist_ok=True)
            lang = row.get("lang") or "en"
            with open(os.path.join(d, f"{lang}.txt"), "w",
                      encoding="utf-8") as f:
                f.write(row["text"])
            rd = row["release_date"]
            iso = rd.isoformat() if hasattr(rd, "isoformat") else str(rd)
            with open(os.path.join(d, "metadata.json"), "w",
                      encoding="utf-8") as f:
                f.write(metadata_json(row["title"], lang, row["doc_hash"],
                                      iso, row["url"]))
            n_written.append(1)
        return pa.table({"written": pa.array(n_written, pa.int32())})

    total = docs.map_batches(write_rows, batch_format="pyarrow") \
                .sum("written")
    return total or 0


def write_stopwords_json(stopwords_df, out_dir: str,
                         name: str = "stopwords") -> str:
    """S7: per-source stopword aggregate → ``<name>.json`` (mapping)
    and ``<name>.txt`` (one term per line, global union, sorted)."""
    os.makedirs(out_dir, exist_ok=True)
    by_source: dict[str, list[str]] = {}
    for row in stopwords_df.to_dict("records"):
        by_source.setdefault(row["source"], []).append(row["term"])
    jpath = os.path.join(out_dir, f"{name}.json")
    with open(jpath, "w", encoding="utf-8") as f:
        json.dump(by_source, f, indent=4, sort_keys=True)
    with open(os.path.join(out_dir, f"{name}.txt"), "w",
              encoding="utf-8") as f:
        for term in sorted({t for ts in by_source.values() for t in ts}):
            f.write(term + "\n")
    return jpath


def render_markdown(template: str, values: dict) -> str:
    """M24: ``{{key}}`` substitution."""
    out = template
    for k, v in values.items():
        out = out.replace("{{" + k + "}}", str(v))
    return out


# --------------------------------------------------------------------------
# S8: reachability-analysis SVG export
# --------------------------------------------------------------------------

_SVG_COLORS = {"WHITE": ("white", "black"),      # fill, text — mirrors the
               "GREY": ("lightgrey", "black"),   # reference's Color enum
               "BLACK": ("black", "white")}      # (reachability_node:3-7)

_CHECK_COLS = (("seed", "seed_ok"), ("listings", "empty_listings"),
               ("details", "empty_details"), ("structure", "n_other"))


def export_reachability_svg(report, path: str) -> str:
    """S8: render the conformance report as the reference's colored
    reachability tree (``export_reachability_analysis_service/
    __init__.py:32-74``: filled nodes, white-on-black for failed,
    edges parent→child), as a deterministic stdlib-built SVG — the
    sandbox has no graphviz, and the layout (root → one node per
    source host → one leaf per structural check) is fixed, so a
    hand-rolled layered renderer gives byte-stable output.

    ``report`` is the per-source DataFrame from
    :func:`crawler_ray.pipelines.conformance.conformance_report`
    (driver-sized: one row per source — rendering is not distributed
    work, exactly like the reference's driver-side ``dot.render``)."""
    rows = report.sort_values("host").to_dict("records")

    node_w, node_h, leaf_w, gap, vgap = 150, 26, 82, 14, 52
    group_w = max(node_w, len(_CHECK_COLS) * (leaf_w + gap) - gap)
    total_w = max(300, len(rows) * (group_w + gap * 2))
    total_h = 3 * (node_h + vgap) + 20

    def esc(s) -> str:
        return (str(s).replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;").replace('"', "&quot;"))

    def box(x, y, w, label, status) -> str:
        fill, text = _SVG_COLORS[status]
        return (
            f'<rect x="{x:.1f}" y="{y}" width="{w}" height="{node_h}" '
            f'fill="{fill}" stroke="black"/>'
            f'<text x="{x + w / 2:.1f}" y="{y + node_h / 2 + 4}" '
            f'fill="{text}" text-anchor="middle" font-size="11" '
            f'font-family="monospace">{esc(label)}</text>')

    def edge(x1, y1, x2, y2) -> str:
        return (f'<line x1="{x1:.1f}" y1="{y1}" x2="{x2:.1f}" y2="{y2}" '
                f'stroke="black"/>')

    def checks(r) -> list[tuple[str, str]]:
        return [
            ("seed", "WHITE" if r["seed_ok"] else "BLACK"),
            ("listings", "WHITE" if r["empty_listings"] == 0 else "BLACK"),
            ("details", "WHITE" if r["empty_details"] == 0 else "BLACK"),
            ("structure", "WHITE" if r["n_other"] == 0 else "BLACK"),
        ]

    statuses = [r["status"] for r in rows]
    root_status = ("WHITE" if all(s == "WHITE" for s in statuses)
                   else "BLACK" if all(s == "BLACK" for s in statuses)
                   else "GREY")
    parts = [f'<svg xmlns="http://www.w3.org/2000/svg" '
             f'width="{total_w}" height="{total_h}" '
             f'viewBox="0 0 {total_w} {total_h}">']
    root_x = total_w / 2 - node_w / 2
    y0, y1, y2 = 10, 10 + node_h + vgap, 10 + 2 * (node_h + vgap)
    parts.append(box(root_x, y0, node_w, "GDPR", root_status))
    for i, r in enumerate(rows):
        gx = gap + i * (group_w + gap * 2)
        hx = gx + group_w / 2 - node_w / 2
        parts.append(edge(total_w / 2, y0 + node_h,
                          hx + node_w / 2, y1))
        parts.append(box(hx, y1, node_w, r["host"], r["status"]))
        for j, (label, st) in enumerate(checks(r)):
            lx = gx + j * (leaf_w + gap) \
                + (group_w - (len(_CHECK_COLS) * (leaf_w + gap) - gap)) / 2
            parts.append(edge(hx + node_w / 2, y1 + node_h,
                              lx + leaf_w / 2, y2))
            parts.append(box(lx, y2, leaf_w, label, st))
    parts.append("</svg>")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(parts) + "\n")
    return path
