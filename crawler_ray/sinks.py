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
           "write_stopwords_json", "render_markdown", "metadata_json"]


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
