"""Shared Parquet read helper.

Pandas-written parquet embeds a `pandas` schema-metadata dict that makes
`pyarrow.Schema` UNHASHABLE — every Ray Data operator that tries to dedup
block schemas (`unify_schemas`) then logs 'Failed to hash the schemas'
per block and loses the fast-path. Stripping the metadata at the read
boundary is zero-copy and makes all downstream schemas hashable.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def _strip_metadata(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def read_parquet_clean(paths, **kwargs) -> "ray.data.Dataset":
    """`ray.data.read_parquet` + schema-metadata strip (batch_size=None:
    one block per batch, so the strip stage itself never unifies the
    still-unhashable input schemas)."""
    return ray.data.read_parquet(paths, **kwargs).map_batches(
        _strip_metadata, batch_format="pyarrow", batch_size=None
    )
