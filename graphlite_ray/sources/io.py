"""Shared Parquet read helper.

Pandas-written parquet embeds a `pandas` schema-metadata dict that makes
`pyarrow.Schema` UNHASHABLE — every Ray Data operator that tries to dedup
block schemas (`unify_schemas`) then logs 'Failed to hash the schemas'
per block and loses the fast-path. Passing an explicit METADATA-STRIPPED
schema to the read fixes the read tasks themselves; a zero-copy strip
stage covers anything the schema hint doesn't reach.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from graphlite_ray.state import storage


def _strip_metadata(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def _clean_schema(paths, columns) -> "pa.Schema | None":
    """Metadata-stripped (sub)schema of the first parquet file, or None."""
    try:
        p = paths if isinstance(paths, str) else paths[0]
        fs, pp = storage.resolve(p)
        info = fs.get_file_info(pp)
        if info.type == storage.pafs.FileType.Directory:
            names = [n for n in storage.listdir(p) if n.endswith(".parquet")]
            if not names:
                return None
            pp = f"{pp.rstrip('/')}/{names[0]}"
        schema = pq.read_schema(pp, filesystem=fs).remove_metadata()
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return schema
    except Exception:
        return None


def read_parquet_clean(paths, columns=None, **kwargs) -> "ray.data.Dataset":
    """`ray.data.read_parquet` with hashable (metadata-free) block schemas."""
    schema = _clean_schema(paths, columns)
    if schema is not None:
        kwargs["schema"] = schema
    ds = ray.data.read_parquet(paths, columns=columns, **kwargs)
    # batch_size=None: one block per batch — the strip stage itself must
    # never combine (still-unhashable) input schemas
    return ds.map_batches(_strip_metadata, batch_format="pyarrow", batch_size=None)
