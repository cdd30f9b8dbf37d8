"""Distributed prefix sum (exclusive scan) over a sorted Dataset.

The classic two-pass scan, expressed on Ray Data blocks:

  pass 1  per-block reduce: each block reports (block_key, block_total)
          where block_key = the block's minimum sort-key value (valid
          because a sorted Dataset's blocks hold disjoint key ranges)
  driver  tiny: sort the per-block totals by key, exclusive-prefix them
          -> {block_key: offset}, broadcast via ray.put
  pass 2  per-block rescan: each block re-derives its own block_key,
          looks up its offset, and emits offset + local exclusive cumsum

Only per-block METADATA (one row per block) touches the driver; both
passes stream. The reference has no scan/order-dependent operator at all
(its message semantics are explicitly order-free, SURVEY.md §2.12) — this
is the primitive that unlocks order-dependent training-data operators
(sequence packing, global row numbering) at scale.

Contract: `ds` must already be sorted by `key_col` with globally unique
keys (blocks then hold disjoint ranges), and must be MATERIALIZED so both
passes observe the same block layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def exclusive_prefix_sum(
    ds: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    out_col: str = "prefix",
) -> "ray.data.Dataset":
    """Sorted, materialized `ds` -> same rows + `out_col` = the exclusive
    global running sum of `val_col` in `key_col` order (int64)."""

    def _block_total(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"bk": pa.array([], pa.int64()), "total": pa.array([], pa.int64())}
            )
        k = t[key_col].to_numpy(zero_copy_only=False)
        v = t[val_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {"bk": [int(k.min())], "total": [int(v.astype(np.int64).sum())]}
        )

    # batch_size=None = exactly one batch per block: pass 1 and pass 2 see
    # the SAME partitioning of rows, so block_key lookup is well-defined
    totals = ds.map_batches(
        _block_total, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    totals = totals.sort_values("bk", ignore_index=True)
    offsets = dict(
        zip(
            totals["bk"].tolist(),
            np.concatenate([[0], np.cumsum(totals["total"].to_numpy())[:-1]]).tolist(),
        )
    )
    off_ref = ray.put(offsets)

    def _rescan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        offs = ray.get(off_ref)
        k = t[key_col].to_numpy(zero_copy_only=False)
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # rows inside a block may not be key-sorted (Ray's sort orders
        # blocks by range; row order within a block is already sorted, but
        # be defensive): scan in key order, emit in input order
        order = np.argsort(k, kind="stable")
        ex = np.empty(len(v), np.int64)
        ex[order] = np.concatenate([[0], np.cumsum(v[order])[:-1]])
        return t.append_column(out_col, pa.array(offs[int(k.min())] + ex))

    return ds.map_batches(_rescan, batch_format="pyarrow", batch_size=None)
