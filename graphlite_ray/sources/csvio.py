"""CSV corpus source/sink — the other interchange format corpora arrive
in (exports from warehouses, spreadsheets, log dumps). Mirrors the JSONL
seam (`sources/jsonl.py`): Ray Data already streams `read_csv` (pyarrow
CSV reader, RFC-4180 quoting) and `write_csv` (one shard per block);
this module adds the repo's staged-layout conventions — idempotent
`_SUCCESS`-marked directories and column pruning at the read.

No reference analog (GraphLite reads whitespace text edge lists only —
`engine/InputFormatter.cc`); this is a north-rule training-data source.
"""

from __future__ import annotations

import os

import ray.data


def stage_csv(ds: "ray.data.Dataset", out_dir: str) -> str:
    """Write `ds` as a CSV shard directory (one file per block, header
    row per shard, RFC-4180 quoting), idempotent: a `_SUCCESS`-marked
    directory is never rewritten, so the staging composes with resumable
    pipelines."""
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    ds.write_csv(out_dir)
    with open(marker, "w"):
        pass
    return out_dir


def read_csv(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Streaming CSV read; prunes to `columns` right after parse (the
    pyarrow CSV reader can skip columns, but Ray's reader surface doesn't
    expose it per-file — the prune caps what leaves the read tasks, not
    what they parse; same honest caveat as the JSONL seam)."""
    ds = ray.data.read_csv(path, file_extensions=["csv"])
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds
