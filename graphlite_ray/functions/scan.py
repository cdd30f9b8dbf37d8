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


def global_rank(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    out_col: str = "rank",
) -> "ray.data.Dataset":
    """Dense global row numbering: `out_col` = 1 + the number of rows
    preceding this one in the ascending lexicographic order of `key_cols`
    (SQL `row_number() OVER (ORDER BY key_cols)`).

    The distributed-sort exemplar: `ds.sort(key_cols)` is THE wide step
    (Ray's range-partitioned shuffle); ranks then come from the same
    two-pass scan as `exclusive_prefix_sum`, generalized to composite
    keys — each block reports its lex-min key tuple (typed columns, for
    driver-side ordering) plus a worker-computed string form (the offset
    dict key: both passes derive it from the same numpy values, so no
    driver/worker representation skew) and its row count; the driver
    exclusive-prefixes ONE ROW PER BLOCK and a rescan adds the local
    lexsort index. No stage ever holds more than a block.

    Contract: the LAST key column must be globally unique (it tie-breaks
    the order AND makes block-min tuples distinct, so the offset lookup
    is well-defined)."""
    ordered = ds.sort(key_cols).materialize()

    def _cols(t: pa.Table):
        return [t[c].to_numpy(zero_copy_only=False) for c in key_cols]

    def _lexmin(cols) -> int:
        # np.lexsort sorts by the LAST key first -> pass reversed
        return int(np.lexsort(tuple(reversed(cols)))[0])

    def _bk(cols, i: int) -> str:
        return repr(tuple(c[i].item() for c in cols))

    def _block_meta(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return None  # filtered below via zero-row table
        cols = _cols(t)
        i = _lexmin(cols)
        out = {"bk": [_bk(cols, i)], "n": [t.num_rows]}
        for j, c in enumerate(key_cols):
            out[f"k{j}"] = t[c].slice(i, 1)
        return pa.table(out)

    def _meta_or_empty(t: pa.Table) -> pa.Table:
        m = _block_meta(t)
        if m is not None:
            return m
        out = {"bk": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        for j, c in enumerate(key_cols):
            out[f"k{j}"] = t[c]
        return pa.table(out)

    metas = ordered.map_batches(
        _meta_or_empty, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    metas = metas.sort_values(
        [f"k{j}" for j in range(len(key_cols))], ignore_index=True
    )
    if metas["bk"].duplicated().any():
        raise ValueError(
            "global_rank: two blocks share a lex-min key tuple — the last "
            f"key column ({key_cols[-1]!r}) must be globally unique"
        )
    offsets = dict(
        zip(
            metas["bk"].tolist(),
            np.concatenate([[0], np.cumsum(metas["n"].to_numpy())[:-1]]).tolist(),
        )
    )
    off_ref = ray.put(offsets)

    def _rescan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        cols = _cols(t)
        offs = ray.get(off_ref)
        order = np.lexsort(tuple(reversed(cols)))
        local = np.empty(t.num_rows, np.int64)
        local[order] = np.arange(t.num_rows)
        base = offs[_bk(cols, int(order[0]))]
        return t.append_column(out_col, pa.array(base + local + 1))

    return ordered.map_batches(_rescan, batch_format="pyarrow", batch_size=None)
