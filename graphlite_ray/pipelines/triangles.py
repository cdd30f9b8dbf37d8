"""Triangle counting as a Ray Data pipeline (SURVEY.md §7.1 step 7).

The reference ships no triangle program; our documented spec: count
triangles of the SIMPLE UNDIRECTED graph (self-loops dropped, parallel and
reciprocal edges collapsed — a deliberate, documented deviation from the
parallel-edge-preserving message semantics, per SURVEY.md §2.7).

Algorithm: degree-ordered edge orientation + wedge closure — the standard
O(m^1.5) scalable method:

  1. canonical undirected distinct edges (lo, hi)
  2. vertex degrees over the simple graph
  3. orient each edge from the (degree, id)-smaller endpoint `a` to the
     larger `b` — bounds every oriented out-degree by O(sqrt(m)), taming
     hub-skew wedge explosion (SURVEY.md §4 skew row)
  4. wedges: per source a, all oriented-neighbor pairs (b, c)
  5. a wedge closes a triangle iff (b, c) is an oriented edge: counted via
     an explicit partitioned hash join on the pair key

Every wide step is a Dataset groupby / bucketed join; no driver-side
materialization of edges or wedges.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from graphlite_ray.functions.grouping import grouped_map_bucketed
from graphlite_ray.pipelines.joins import (
    attach_from_bucketed,
    pair_bucket,
    write_bucketed,
)


def _canonical_simple_edges(edges: "ray.data.Dataset", B: int = 32) -> "ray.data.Dataset":
    def _canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        keep = s != d  # drop self-loops
        s, d = s[keep], d[keep]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        # per-batch pre-dedup before the global distinct
        u = np.unique(np.stack([lo, hi], axis=1), axis=0)
        return pa.table({"lo": u[:, 0], "hi": u[:, 1]})

    def _dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["lo", "hi"])

    return grouped_map_bucketed(
        edges.map_batches(_canon, batch_format="pyarrow"), ["lo", "hi"], _dedup, B
    )


PAIR_DTYPE = np.dtype([("lo", "<i8"), ("hi", "<i8")])


def _triangle_count_broadcast(simple: "ray.data.Dataset") -> int:
    """Small/medium graphs: degrees and the edge set fit in the object
    store, so both joins become broadcast lookups — 2 small jobs instead of
    8 shuffles. The edge list is pulled ONCE (<= broadcast_limit rows by
    contract); degrees come from that same pull (np.unique over both
    endpoint columns), saving the degree groupby shuffle entirely. Exact
    membership via a sorted structured (lo, hi) array (no hash-collision
    risk)."""
    pair_rows = simple.to_pandas()  # <= broadcast_limit rows by contract
    ends = np.concatenate(
        [pair_rows["lo"].to_numpy(), pair_rows["hi"].to_numpy()]
    )
    deg_vids, deg_vals = np.unique(ends, return_counts=True)  # sorted vids
    epairs = np.empty(len(pair_rows), PAIR_DTYPE)
    epairs["lo"] = pair_rows["lo"].to_numpy()
    epairs["hi"] = pair_rows["hi"].to_numpy()
    epairs.sort(order=["lo", "hi"])
    e_ref = ray.put(epairs)
    d_ref = ray.put((deg_vids, deg_vals))

    def _orient_batch(t: pa.Table) -> pa.Table:
        vids, deg = ray.get(d_ref)  # zero-copy plasma view per task
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        dlo = deg[np.searchsorted(vids, lo)]
        dhi = deg[np.searchsorted(vids, hi)]
        lo_first = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
        return pa.table(
            {
                "a": np.where(lo_first, lo, hi),
                "b": np.where(lo_first, hi, lo),
            }
        )

    oriented = simple.map_batches(_orient_batch, batch_format="pyarrow")

    def make_closer():
        cache = {}

        def _close_frame(g: pd.DataFrame) -> pd.DataFrame:
            """All sources of one bucket: vectorized per-source wedge
            enumeration + exact membership against the broadcast edge set."""
            if "e" not in cache:
                cache["e"] = ray.get(e_ref)
            e = cache["e"]
            arr = g[["a", "b"]].to_numpy()
            order = np.lexsort((arr[:, 1], arr[:, 0]))
            a_s, b_s = arr[order, 0], arr[order, 1]
            starts = np.flatnonzero(np.concatenate(([True], a_s[1:] != a_s[:-1])))
            ends = np.concatenate((starts[1:], [len(a_s)]))
            total = 0
            for s, t in zip(starts, ends):
                k = t - s
                if k < 2:
                    continue
                nbrs = b_s[s:t]
                i, j = np.triu_indices(k, k=1)
                w = np.empty(len(i), PAIR_DTYPE)
                w["lo"], w["hi"] = nbrs[i], nbrs[j]
                pos = np.clip(np.searchsorted(e, w), 0, len(e) - 1)
                total += int((e[pos] == w).sum())
            return pd.DataFrame({"n": [total]})

        return _close_frame

    counts = grouped_map_bucketed(oriented, ["a"], make_closer(), B=16)
    total = counts.sum("n")
    return int(total if not isinstance(total, dict) else total["sum(n)"])


def triangle_count(
    edges: "ray.data.Dataset",
    work_dir: str | None = None,
    B: int = 32,
    broadcast_limit: int = 2_000_000,
) -> int:
    """edges (src:int64, dst:int64) -> exact triangle count of the simple
    undirected graph. `B` = hash-join bucket count (choose ~cluster cores)
    for the large-graph bucketed path; graphs with <= `broadcast_limit`
    distinct edges use the broadcast path."""
    work_dir = work_dir or tempfile.mkdtemp(prefix="glr_tri_")
    os.makedirs(work_dir, exist_ok=True)

    simple = _canonical_simple_edges(edges).materialize()  # reused below
    if simple.count() <= broadcast_limit:
        return _triangle_count_broadcast(simple)

    # degrees over the simple graph
    def _ends(t: pa.Table) -> pa.Table:
        v = np.concatenate(
            [t["lo"].to_numpy(zero_copy_only=False), t["hi"].to_numpy(zero_copy_only=False)]
        )
        u, c = np.unique(v, return_counts=True)  # per-batch partial count
        return pa.table({"vid": u, "deg_part": c})

    deg = (
        simple.map_batches(_ends, batch_format="pyarrow")
        .groupby("vid")
        .sum("deg_part", ignore_nulls=True)
    )
    # -> columns (vid, sum(deg_part))
    deg = deg.map_batches(
        lambda t: pa.table(
            {"vid": t["vid"], "deg": t[t.column_names[1]]}
        ),
        batch_format="pyarrow",
    )
    deg_dir = write_bucketed(deg, "vid", B, os.path.join(work_dir, "deg"))

    # attach degrees to both endpoints (two partitioned hash joins)
    with_lo = attach_from_bucketed(simple, "lo", deg_dir, B, "vid").map_batches(
        lambda df: df.rename(columns={"deg": "deg_lo"}).drop(columns=["vid"]),
        batch_format="pandas",
    )
    both = attach_from_bucketed(with_lo, "hi", deg_dir, B, "vid").map_batches(
        lambda df: df.rename(columns={"deg": "deg_hi"}).drop(columns=["vid"]),
        batch_format="pandas",
    )

    # orient by (degree, id)
    def _orient(df: pd.DataFrame) -> pd.DataFrame:
        lo, hi = df["lo"].to_numpy(), df["hi"].to_numpy()
        dlo, dhi = df["deg_lo"].to_numpy(), df["deg_hi"].to_numpy()
        lo_first = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
        a = np.where(lo_first, lo, hi)
        b = np.where(lo_first, hi, lo)
        return pd.DataFrame({"a": a, "b": b})

    oriented = both.map_batches(_orient, batch_format="pandas").materialize()

    # undirected simple edge set bucketed by the canonical PAIR key — the
    # closure side of the join (a wedge {b,c} closes iff {b,c} is an edge,
    # in either orientation)
    def _pairkey(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        return pa.table({"lo": lo, "hi": hi, "pb": pair_bucket(lo, hi, B)})

    edge_dir = os.path.join(work_dir, "cedges")
    write_bucketed(
        simple.map_batches(_pairkey, batch_format="pyarrow"), "pb", B, edge_dir
    )

    # wedges per oriented source: each triangle appears as exactly one wedge
    # at its (deg, id)-minimum vertex; emit pairs id-canonicalized (lo, hi)
    def _wedges_frame(g: pd.DataFrame) -> pd.DataFrame:
        arr = g[["a", "b"]].to_numpy()
        order = np.lexsort((arr[:, 1], arr[:, 0]))
        a_s, b_s = arr[order, 0], arr[order, 1]
        starts = np.flatnonzero(np.concatenate(([True], a_s[1:] != a_s[:-1])))
        ends = np.concatenate((starts[1:], [len(a_s)]))
        los, his = [], []
        for s, t in zip(starts, ends):
            k = t - s
            if k < 2:
                continue
            nbrs = b_s[s:t]
            i, j = np.triu_indices(k, k=1)
            los.append(nbrs[i])
            his.append(nbrs[j])
        if not los:
            return pd.DataFrame({"lo": np.empty(0, np.int64), "hi": np.empty(0, np.int64)})
        return pd.DataFrame({"lo": np.concatenate(los), "hi": np.concatenate(his)})

    wedges = grouped_map_bucketed(oriented, ["a"], _wedges_frame, B)

    def _tag_wedge(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = t["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"lo": lo, "hi": hi, "pb": pair_bucket(lo, hi, B)})

    def _close(g: pd.DataFrame) -> pd.DataFrame:
        pb = int(g["pb"].iloc[0])
        path = os.path.join(edge_dir, f"bucket_{pb}.parquet")
        if not os.path.exists(path):
            return pd.DataFrame({"n": [0]})
        e = pq.read_table(path, columns=["lo", "hi"]).to_pandas()
        n = len(g.merge(e, on=["lo", "hi"], how="inner"))
        return pd.DataFrame({"n": [n]})

    counts = (
        wedges.map_batches(_tag_wedge, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(_close, batch_format="pandas")
    )
    total = counts.sum("n")
    return int(total if not isinstance(total, dict) else total["sum(n)"])
