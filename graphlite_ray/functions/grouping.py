"""Bucketed grouping: the scale-safe alternative to high-cardinality map_groups.

`Dataset.groupby(key).map_groups(fn)` invokes `fn` once PER KEY — a Python
loop over keys. Fine for tens of groups (partitions, buckets, event
types); catastrophic for per-vertex / per-pair / per-document keys (one
interpreter call per row at the limit).

`grouped_map_bucketed` keeps the shuffle but collapses its cardinality:
rows are hashed into B buckets (every key's rows land in exactly one
bucket), ONE vectorized callback runs per bucket and handles all its keys
with pandas/numpy group operations. B ~ a few × cluster cores.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from graphlite_ray.functions.hashing import hash_strings

_MULT = np.uint64(0x9E3779B97F4A7C15)


def _hash_objects(v: np.ndarray) -> np.ndarray:
    """String/object key column -> uint64, via pandas' C siphash
    (O(total_bytes), fixed key — deterministic across processes). The
    byte-position FNV loop in hash_strings costs max_len numpy passes,
    which is pathological when the KEY is a whole document (exact_dedup);
    bucket assignment is transient within one shuffle, so it does not need
    hash_strings' cross-version stability guarantee."""
    try:
        return pd.util.hash_array(np.asarray(v, dtype=object), categorize=False)
    except TypeError:  # unhashable objects: stringify, rare fallback
        return hash_strings([str(x) for x in v])


def bucket_ids(df_or_table, key_cols: list[str], B: int) -> np.ndarray:
    """Deterministic bucket id per row from the key columns."""
    if isinstance(df_or_table, pa.Table):
        cols = {c: df_or_table[c].to_numpy(zero_copy_only=False) for c in key_cols}
        n = df_or_table.num_rows
    else:
        cols = {c: df_or_table[c].to_numpy() for c in key_cols}
        n = len(df_or_table)
    h = np.zeros(n, np.uint64)
    with np.errstate(over="ignore"):
        for c in key_cols:
            v = cols[c]
            if v.dtype.kind in ("i", "u"):
                hv = v.astype(np.uint64) * _MULT
            elif v.dtype.kind == "f":
                hv = v.view(np.uint64) * _MULT
            else:
                hv = _hash_objects(v)
            h = (h ^ hv) * _MULT
    return (h % np.uint64(max(1, B))).astype(np.int64)


def auto_bucket_count(
    ds: "ray.data.Dataset",
    target_bytes_per_bucket: int = 64 << 20,
    default_B: int = 64,
    hi: int = 4096,
) -> int:
    """Derive a bucket count from the dataset's byte-size estimate so one
    bucket's group data fits a single task's memory at any corpus size:
    B = max(default_B, ceil(bytes / target_bytes_per_bucket)), capped.

    At small scale this returns `default_B` unchanged (today's constants);
    at 100x the data it grows B instead of silently overflowing a task.
    CAVEAT: `size_bytes()` is metadata-cheap ONLY on a fresh source read
    (measured: 2 ms on a parquet read handle vs full execution on a
    derived dataset) — call this with the SOURCE dataset, before
    transforms, or pass an explicit B."""
    import math

    try:
        sz = ds.size_bytes()
    except Exception:
        return default_B
    if not sz or sz <= 0:
        return default_B
    return min(hi, max(default_B, math.ceil(sz / target_bytes_per_bucket)))


def grouped_map_bucketed(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    fn,
    B: int = 64,
    fmt: str = "pandas",
) -> "ray.data.Dataset":
    """`fn(df: pd.DataFrame) -> pd.DataFrame` receives ~1/B of the KEY
    space with every key's rows complete — it must process all keys in the
    frame vectorized (pandas groupby / numpy segmented ops).

    `fmt="pyarrow"` passes `fn` a pa.Table instead (required when rows
    carry tensor/list columns: pandas blocks with those defeat Ray's
    schema dedup and copy the payload)."""

    def _tag(t: pa.Table) -> pa.Table:
        # strip schema metadata: pandas-origin blocks carry the pandas
        # metadata dict, which makes shuffle-side schema dedup impossible
        if t.schema.metadata:
            t = t.replace_schema_metadata(None)
        return t.append_column("__bucket", pa.array(bucket_ids(t, key_cols, B)))

    if fmt == "pyarrow":
        def _apply_arrow(g: pa.Table) -> pa.Table:
            return fn(g.drop_columns(["__bucket"]))

        return (
            ds.map_batches(_tag, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(_apply_arrow, batch_format="pyarrow")
        )

    def _apply(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns="__bucket"))

    return (
        ds.map_batches(_tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_apply, batch_format="pandas")
    )
