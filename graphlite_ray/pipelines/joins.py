"""Join strategies for Ray Data pipelines.

The reference implements no relational join (SURVEY.md §2.4) — its closest
analog is hash-routed message delivery. Our engine needs real joins
(url-map attach, degree orientation, wedge closure, relational queries);
three strategies, chosen by side size:

1. `broadcast_join` — small side `ray.put` ONCE, read per task (never
   re-shipped per batch); the Ray idiom for dimension tables.
2. `write_bucketed` + `attach_from_bucketed` — explicit partitioned hash
   join through shared storage: the right side is written once partitioned
   by `key % B`, the left side is shuffled by the same function, and each
   group merges against exactly one right bucket file. Scales to two large
   sides, is resumable (bucket files are independent), and reuses the
   engine's single partition-function discipline (SURVEY.md §7.3).
3. native `Dataset.join` when this Ray version provides it (wrapped with a
   capability check).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from graphlite_ray.state import storage

_FNV = np.uint64(1099511628211)


def bucket_of(ids: np.ndarray, B: int) -> np.ndarray:
    return (ids.astype(np.uint64) % np.uint64(B)).astype(np.int64)


def pair_bucket(a: np.ndarray, b: np.ndarray, B: int) -> np.ndarray:
    h = a.astype(np.uint64) * _FNV ^ b.astype(np.uint64)
    return (h % np.uint64(B)).astype(np.int64)


def broadcast_join(
    big: "ray.data.Dataset",
    small_df: pd.DataFrame,
    on: list[str] | str,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Hash-join a Dataset against a driver-side small table. The small side
    is put in the object store once; every map task reads the same copy."""
    ref = ray.put(small_df)

    class _Join:
        def __init__(self):
            self.small = ray.get(ref)  # once per actor/task proc

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, on=on, how=how)

    return big.map_batches(_Join, batch_format="pandas", concurrency=(1, 8))


def write_bucketed(
    ds: "ray.data.Dataset", key_col: str, B: int, out_dir: str, columns: list[str] | None = None
) -> str:
    """Partition `ds` by key % B into one parquet file per bucket."""
    storage.makedirs(out_dir)

    def _tag(t: pa.Table) -> pa.Table:
        if t.schema.metadata:
            t = t.replace_schema_metadata(None)
        k = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column("__bucket", pa.array(bucket_of(k, B)))

    def _write(g: pa.Table) -> pa.Table:
        b = int(g["__bucket"][0].as_py())
        g = g.drop_columns(["__bucket"])
        if columns:
            g = g.select(columns)
        storage.write_table_atomic(g, storage.join(out_dir, f"bucket_{b}.parquet"))
        return pa.table({"bucket": [b], "rows": [g.num_rows]})

    (
        ds.map_batches(_tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_write, batch_format="pyarrow")
        .count()
    )
    return out_dir


def attach_from_bucketed(
    ds: "ray.data.Dataset",
    key_col: str,
    bucketed_dir: str,
    B: int,
    right_key: str,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Shuffle `ds` by the same bucket function and merge each group against
    its single co-partitioned right bucket file."""

    def _tag(t: pa.Table) -> pa.Table:
        if t.schema.metadata:
            t = t.replace_schema_metadata(None)
        k = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column("__bucket", pa.array(bucket_of(k, B)))

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__bucket"].iloc[0])
        g = g.drop(columns="__bucket")
        path = storage.join(bucketed_dir, f"bucket_{b}.parquet")
        if not storage.exists(path):
            return g.iloc[0:0] if how == "inner" else g
        right = storage.read_table(path).to_pandas()
        return g.merge(right, left_on=key_col, right_on=right_key, how=how)

    return (
        ds.map_batches(_tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_merge, batch_format="pandas")
    )


def anti_join_bucketed(
    left: "ray.data.Dataset",
    left_key: str,
    right: "ray.data.Dataset",
    right_key: str,
    work_dir: str,
    B: int = 32,
) -> "ray.data.Dataset":
    """Anti-join for a fact-sized right key set: the right side's distinct
    keys are written bucketed by key % B (one shuffle, one file per
    bucket), the left side shuffles by the same function, and each group
    drops rows whose key appears in its single co-partitioned bucket file.
    No driver-side key set — both sides stream (the scale path the
    broadcast anti-join gates into)."""
    keys_dir = storage.join(work_dir, "anti_keys")

    def _keys(t: pa.Table) -> pa.Table:
        k = np.unique(t[right_key].to_numpy(zero_copy_only=False))
        return pa.table({right_key: k})

    write_bucketed(
        right.map_batches(_keys, batch_format="pyarrow"), right_key, B, keys_dir
    )

    def _tag(t: pa.Table) -> pa.Table:
        if t.schema.metadata:
            t = t.replace_schema_metadata(None)
        k = t[left_key].to_numpy(zero_copy_only=False)
        return t.append_column("__bucket", pa.array(bucket_of(k, B)))

    def _drop_matched(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__bucket"].iloc[0])
        g = g.drop(columns="__bucket")
        path = storage.join(keys_dir, f"bucket_{b}.parquet")
        if not storage.exists(path):
            return g
        keys = storage.read_table(path)[right_key].to_numpy(zero_copy_only=False)
        return g[~g[left_key].isin(keys)]

    return (
        left.map_batches(_tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_drop_matched, batch_format="pandas")
    )


def native_join_available() -> bool:
    return hasattr(ray.data.Dataset, "join")
