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
import shutil
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


def _broadcast_refs(simple: "ray.data.Dataset"):
    """Pull the simple edge set ONCE (<= broadcast_limit rows by contract)
    and put the sorted structured (lo, hi) pair array + the degree arrays
    in the object store — both joins become broadcast lookups. Degrees come
    from the same pull (np.unique over both endpoint columns), saving the
    degree groupby shuffle entirely. Exact membership via the sorted pair
    array (no hash-collision risk)."""
    pair_rows = simple.to_pandas()
    ends = np.concatenate([pair_rows["lo"].to_numpy(), pair_rows["hi"].to_numpy()])
    deg_vids, deg_vals = np.unique(ends, return_counts=True)  # sorted vids
    epairs = np.empty(len(pair_rows), PAIR_DTYPE)
    epairs["lo"] = pair_rows["lo"].to_numpy()
    epairs["hi"] = pair_rows["hi"].to_numpy()
    epairs.sort(order=["lo", "hi"])
    return ray.put(epairs), ray.put((deg_vids, deg_vals))


def _orient_broadcast(simple: "ray.data.Dataset", d_ref) -> "ray.data.Dataset":
    """Orient each edge from the (degree, id)-smaller endpoint, degrees
    read from the broadcast arrays (zero-copy plasma view per task)."""

    def _orient_batch(t: pa.Table) -> pa.Table:
        vids, deg = ray.get(d_ref)
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

    return simple.map_batches(_orient_batch, batch_format="pyarrow")


def _wedge_spans(g: pd.DataFrame):
    """Bucket frame of oriented edges -> (a_sorted, b_sorted, starts, ends)
    per-source neighbor runs for vectorized wedge enumeration."""
    arr = g[["a", "b"]].to_numpy()
    order = np.lexsort((arr[:, 1], arr[:, 0]))
    a_s, b_s = arr[order, 0], arr[order, 1]
    starts = np.flatnonzero(np.concatenate(([True], a_s[1:] != a_s[:-1])))
    ends = np.concatenate((starts[1:], [len(a_s)]))
    return a_s, b_s, starts, ends


def _emit_all_wedges(a_s, b_s, starts, ends):
    """Fully vectorized wedge emission (r5 — replaces the per-source
    Python loop the r4 audit flagged): for every source run of length k,
    emit all k*(k-1)/2 neighbor pairs (i<j, neighbors already dst-sorted)
    via the closed-form inversion of the flattened triangular index —
    zero per-vertex Python, exact for degrees to 2^26.

    Returns (src, lo, hi) int64 arrays."""
    k = (ends - starts).astype(np.int64)
    m = k * (k - 1) // 2
    tot = int(m.sum())
    if tot == 0:
        e = np.empty(0, np.int64)
        return e, e.copy(), e.copy()
    run_of = np.repeat(np.arange(len(k)), m)
    w = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
    kr = k[run_of]
    # i = smallest row with offset(i+1) > w, offset(i) = i*kr - i*(i+1)/2 - i
    # closed form + one integer fix-up pass for float boundary cases
    tw = 2 * kr - 1
    i = ((tw - np.sqrt(tw.astype(np.float64) ** 2 - 8 * w)) // 2).astype(np.int64)
    np.clip(i, 0, kr - 2, out=i)

    def _off(ii):
        return ii * kr - (ii * (ii + 1)) // 2

    i[w < _off(i)] -= 1
    i[w >= _off(i + 1)] += 1
    j = w - _off(i) + i + 1
    base = np.repeat(starts, m)
    return a_s[base], b_s[base + i], b_s[base + j]


def _make_broadcast_closer(e_ref, per_vertex: bool):
    """Bucket closure against the broadcast edge set. per_vertex=False
    returns one total per bucket; per_vertex=True returns partial
    per-vertex triangle credits (each matched wedge (a; b, c) credits all
    three corners)."""
    cache = {}

    def _close_frame(g: pd.DataFrame) -> pd.DataFrame:
        if "e" not in cache:
            cache["e"] = ray.get(e_ref)
        e = cache["e"]
        a_s, b_s, starts, ends = _wedge_spans(g)
        total = 0
        credits = []
        src, lo_w, hi_w = _emit_all_wedges(a_s, b_s, starts, ends)
        if len(src):
            w = np.empty(len(src), PAIR_DTYPE)
            w["lo"], w["hi"] = lo_w, hi_w
            pos = np.clip(np.searchsorted(e, w), 0, len(e) - 1)
            hit = e[pos] == w
            if per_vertex:
                if hit.any():
                    credits.append(src[hit])
                    credits.append(lo_w[hit])
                    credits.append(hi_w[hit])
            else:
                total = int(hit.sum())
        if not per_vertex:
            return pd.DataFrame({"n": [total]})
        if not credits:
            return pd.DataFrame({"v": np.empty(0, np.int64), "t": np.empty(0, np.int64)})
        u, c = np.unique(np.concatenate(credits), return_counts=True)
        return pd.DataFrame({"v": u, "t": c})

    return _close_frame


def _triangle_count_broadcast(simple: "ray.data.Dataset") -> int:
    e_ref, d_ref = _broadcast_refs(simple)
    oriented = _orient_broadcast(simple, d_ref)
    counts = grouped_map_bucketed(oriented, ["a"], _make_broadcast_closer(e_ref, False), B=16)
    total = counts.sum("n")
    return int(total if not isinstance(total, dict) else total["sum(n)"])


def _clustering_attach(d_ref):
    """Batch fn: (v, t) -> (vertex_id, triangles, clustering) with
    clustering = 2t / (d(d-1)) over the simple-graph degree (0 when d<2),
    degrees read from the broadcast arrays."""

    def _attach(t: pa.Table) -> pa.Table:
        vids, deg = ray.get(d_ref)
        v = t["v"].to_numpy(zero_copy_only=False)
        tri = t["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = deg[np.searchsorted(vids, v)].astype(np.float64)
        denom = d * (d - 1.0)
        clust = np.divide(2.0 * tri, denom, out=np.zeros(len(v)), where=denom > 0)
        return pa.table({"vertex_id": v, "triangles": tri, "clustering": clust})

    return _attach


def _vertex_triangles_broadcast(simple: "ray.data.Dataset") -> "ray.data.Dataset":
    e_ref, d_ref = _broadcast_refs(simple)
    oriented = _orient_broadcast(simple, d_ref)
    credits = grouped_map_bucketed(
        oriented, ["a"], _make_broadcast_closer(e_ref, True), B=16
    )
    # zero row per vertex so triangle-free vertices appear in the output
    deg_vids, _ = ray.get(d_ref)
    zeros = ray.data.from_arrow(
        pa.table({"v": deg_vids, "t": np.zeros(len(deg_vids), np.int64)})
    )

    def _sum_credits(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("v", as_index=False)["t"].sum()
        out["t"] = out["t"].astype("int64")
        return out

    totals = grouped_map_bucketed(credits.union(zeros), ["v"], _sum_credits, B=16)
    return totals.map_batches(_clustering_attach(d_ref), batch_format="pyarrow")


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
    return _triangles_impl(edges, work_dir, B, broadcast_limit, per_vertex=False)


def transitivity(
    edges: "ray.data.Dataset",
    work_dir: str | None = None,
    B: int = 32,
    broadcast_limit: int = 2_000_000,
) -> tuple[int, int, float]:
    """Global clustering coefficient of the simple undirected graph:
    C = 3 * triangles / wedges, wedges = sum over v of C(deg_v, 2)
    (open + closed). Triangles reuse `triangle_count`'s machinery; the
    wedge total is a per-block partial degree count -> one bucketed sum
    per vertex -> per-bucket wedge subtotal, so the driver adds <= B
    scalars. Returns (n_triangles, n_wedges, C); C = 0.0 on a wedge-less
    graph."""
    T = triangle_count(edges, work_dir=work_dir, B=B, broadcast_limit=broadcast_limit)
    simple = _canonical_simple_edges(edges, B=B)

    def _deg_partial(t: pa.Table) -> pd.DataFrame:
        both = np.concatenate(
            [
                t["lo"].to_numpy(zero_copy_only=False),
                t["hi"].to_numpy(zero_copy_only=False),
            ]
        )
        v, c = np.unique(both, return_counts=True)
        return pd.DataFrame({"v": v, "c": c.astype(np.int64)})

    def _wedge_subtotal(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("v")["c"].sum().to_numpy(np.int64)
        return pd.DataFrame({"nw": [int((d * (d - 1) // 2).sum())]})

    parts = grouped_map_bucketed(
        simple.map_batches(_deg_partial, batch_format="pyarrow"),
        ["v"],
        _wedge_subtotal,
        B,
    ).to_pandas()
    W = int(parts["nw"].sum()) if len(parts) else 0
    C = (3.0 * T) / W if W else 0.0
    return T, W, C


def vertex_triangle_counts(
    edges: "ray.data.Dataset",
    work_dir: str | None = None,
    B: int = 32,
    broadcast_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """edges (src:int64, dst:int64) -> Dataset (vertex_id, triangles:int64,
    clustering:float64): per-vertex triangle counts of the simple undirected
    graph and the local clustering coefficient 2t / (d(d-1)) (0 when the
    simple degree d < 2). Same two execution paths as `triangle_count`; the
    per-vertex variant additionally credits each closed wedge (a; b, c) to
    all three corners and sums credits per vertex in bucketed shuffles."""
    return _triangles_impl(edges, work_dir, B, broadcast_limit, per_vertex=True)


def _triangles_impl(
    edges: "ray.data.Dataset",
    work_dir: str | None,
    B: int,
    broadcast_limit: int,
    per_vertex: bool,
):
    work_dir = work_dir or tempfile.mkdtemp(prefix="glr_tri_")
    os.makedirs(work_dir, exist_ok=True)

    simple = _canonical_simple_edges(edges).materialize()  # reused below
    if simple.count() <= broadcast_limit:
        if per_vertex:
            return _vertex_triangles_broadcast(simple)
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
    # at its (deg, id)-minimum vertex `a`; emit (a, lo, hi) with the far
    # pair id-canonicalized
    def _wedges_frame(g: pd.DataFrame) -> pd.DataFrame:
        a_s, b_s, starts, ends = _wedge_spans(g)
        src, lo, hi = _emit_all_wedges(a_s, b_s, starts, ends)
        return pd.DataFrame({"a": src, "lo": lo, "hi": hi})

    wedges = grouped_map_bucketed(oriented, ["a"], _wedges_frame, B)

    def _tag_wedge(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = t["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = t["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"a": a, "lo": lo, "hi": hi, "pb": pair_bucket(lo, hi, B)})

    def _close(g: pd.DataFrame) -> pd.DataFrame:
        pb = int(g["pb"].iloc[0])
        path = os.path.join(edge_dir, f"bucket_{pb}.parquet")
        if not os.path.exists(path):
            if per_vertex:
                e = np.empty(0, np.int64)
                return pd.DataFrame({"v": e, "t": e.copy()})
            return pd.DataFrame({"n": [0]})
        e = pq.read_table(path, columns=["lo", "hi"]).to_pandas()
        m = g.merge(e, on=["lo", "hi"], how="inner")
        if not per_vertex:
            return pd.DataFrame({"n": [len(m)]})
        u, c = np.unique(
            np.concatenate(
                [m["a"].to_numpy(), m["lo"].to_numpy(), m["hi"].to_numpy()]
            ),
            return_counts=True,
        )
        return pd.DataFrame({"v": u, "t": c.astype(np.int64)})

    counts = (
        wedges.map_batches(_tag_wedge, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(_close, batch_format="pandas")
    )
    if not per_vertex:
        total = counts.sum("n")
        return int(total if not isinstance(total, dict) else total["sum(n)"])

    # per-vertex: credits + a zero row per vertex (from the bucketed degree
    # files, which cover every simple-graph vertex) -> bucketed sum ->
    # degree attach for the clustering coefficient — all wide steps stay
    # bucketed shuffles, nothing graph-sized touches the driver.
    zeros = ray.data.read_parquet(deg_dir).map_batches(
        lambda t: pa.table(
            {
                "v": t["vid"].to_numpy(zero_copy_only=False),
                "t": np.zeros(t.num_rows, np.int64),
            }
        ),
        batch_format="pyarrow",
    )

    def _sum_credits(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("v", as_index=False)["t"].sum()
        out["t"] = out["t"].astype("int64")
        return out

    totals = grouped_map_bucketed(counts.union(zeros), ["v"], _sum_credits, B)
    with_deg = attach_from_bucketed(totals, "v", deg_dir, B, "vid")

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        d = df["deg"].to_numpy(np.float64)
        tri = df["t"].to_numpy(np.int64)
        denom = d * (d - 1.0)
        clust = np.divide(2.0 * tri, denom, out=np.zeros(len(d)), where=denom > 0)
        return pd.DataFrame(
            {"vertex_id": df["v"].to_numpy(), "triangles": tri, "clustering": clust}
        )

    return with_deg.map_batches(_final, batch_format="pandas")


def _edge_support_broadcast(simple: "ray.data.Dataset", B: int) -> "ray.data.Dataset":
    """Broadcast-path edge support (edge set fits the object store): one
    `ray.put` of the sorted pair array + degrees replaces the degree
    shuffle, both degree attaches and the pair-bucket write — the same
    small-graph shortcut the triangle counters take."""
    e_ref, d_ref = _broadcast_refs(simple)
    oriented = _orient_broadcast(simple, d_ref)
    cache: dict = {}

    def _close_credit(g: pd.DataFrame) -> pd.DataFrame:
        if "e" not in cache:
            cache["e"] = ray.get(e_ref)
        e = cache["e"]
        a_s, b_s, starts, ends = _wedge_spans(g)
        los, his = [], []
        for s, t in zip(starts, ends):
            kk = t - s
            if kk < 2:
                continue
            nbrs = b_s[s:t]
            i, j = np.triu_indices(kk, k=1)
            w = np.empty(len(i), PAIR_DTYPE)
            w["lo"], w["hi"] = nbrs[i], nbrs[j]
            pos = np.clip(np.searchsorted(e, w), 0, len(e) - 1)
            hit = e[pos] == w
            if hit.any():
                a = np.full(int(hit.sum()), a_s[s])
                wl, wh = w["lo"][hit], w["hi"][hit]
                los.append(np.concatenate([np.minimum(a, wl), np.minimum(a, wh), wl]))
                his.append(np.concatenate([np.maximum(a, wl), np.maximum(a, wh), wh]))
        e0 = np.empty(0, np.int64)
        if not los:
            return pd.DataFrame({"lo": e0, "hi": e0.copy(), "c": e0.copy()})
        pr = np.stack([np.concatenate(los), np.concatenate(his)], axis=1)
        u, c = np.unique(pr, axis=0, return_counts=True)
        return pd.DataFrame({"lo": u[:, 0], "hi": u[:, 1], "c": c.astype(np.int64)})

    credits = grouped_map_bucketed(oriented, ["a"], _close_credit, B=B)
    zeros = simple.map_batches(
        lambda t: pa.table(
            {"lo": t["lo"], "hi": t["hi"], "c": np.zeros(t.num_rows, np.int64)}
        ),
        batch_format="pyarrow",
    )

    def _sum_sup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["lo", "hi"], as_index=False)["c"].sum()
        return out.rename(columns={"c": "sup"}).astype({"sup": "int64"})

    return grouped_map_bucketed(credits.union(zeros), ["lo", "hi"], _sum_sup, B)


def edge_support(
    simple: "ray.data.Dataset",
    work_dir: str,
    B: int = 16,
    n_edges: int | None = None,
    broadcast_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """Per-edge triangle support over a canonical simple edge set (lo, hi):
    -> (lo, hi, sup), sup = number of triangles containing the edge,
    support-0 edges included. Same degree-ordered wedge machinery as the
    triangle counters; each closed wedge (a; lo, hi) credits its THREE
    edges as canonical pairs, credits pre-aggregate per closure bucket and
    sum in one bucketed shuffle on the pair key. Nothing graph-sized
    touches the driver.

    When the caller knows the edge count (`n_edges`, e.g. the k-truss
    peeling loop tracks it) and it fits `broadcast_limit`, the broadcast
    path skips the degree shuffle + attaches + pair-bucket write."""
    if n_edges is not None and n_edges <= broadcast_limit:
        return _edge_support_broadcast(simple, B)
    os.makedirs(work_dir, exist_ok=True)

    def _ends(t: pa.Table) -> pa.Table:
        v = np.concatenate(
            [t["lo"].to_numpy(zero_copy_only=False), t["hi"].to_numpy(zero_copy_only=False)]
        )
        u, c = np.unique(v, return_counts=True)
        return pa.table({"vid": u, "deg_part": c})

    deg = (
        simple.map_batches(_ends, batch_format="pyarrow")
        .groupby("vid")
        .sum("deg_part", ignore_nulls=True)
        .map_batches(
            lambda t: pa.table({"vid": t["vid"], "deg": t[t.column_names[1]]}),
            batch_format="pyarrow",
        )
    )
    deg_dir = write_bucketed(deg, "vid", B, os.path.join(work_dir, "deg"))

    with_lo = attach_from_bucketed(simple, "lo", deg_dir, B, "vid").map_batches(
        lambda df: df.rename(columns={"deg": "deg_lo"}).drop(columns=["vid"]),
        batch_format="pandas",
    )
    both = attach_from_bucketed(with_lo, "hi", deg_dir, B, "vid").map_batches(
        lambda df: df.rename(columns={"deg": "deg_hi"}).drop(columns=["vid"]),
        batch_format="pandas",
    )

    def _orient(df: pd.DataFrame) -> pd.DataFrame:
        lo, hi = df["lo"].to_numpy(), df["hi"].to_numpy()
        dlo, dhi = df["deg_lo"].to_numpy(), df["deg_hi"].to_numpy()
        lo_first = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
        return pd.DataFrame(
            {"a": np.where(lo_first, lo, hi), "b": np.where(lo_first, hi, lo)}
        )

    oriented = both.map_batches(_orient, batch_format="pandas")

    def _pairkey(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        return pa.table({"lo": lo, "hi": hi, "pb": pair_bucket(lo, hi, B)})

    edge_dir = os.path.join(work_dir, "cedges")
    write_bucketed(
        simple.map_batches(_pairkey, batch_format="pyarrow"), "pb", B, edge_dir
    )

    def _wedges_frame(g: pd.DataFrame) -> pd.DataFrame:
        a_s, b_s, starts, ends = _wedge_spans(g)
        src, lo, hi = _emit_all_wedges(a_s, b_s, starts, ends)
        return pd.DataFrame({"a": src, "lo": lo, "hi": hi})

    wedges = grouped_map_bucketed(oriented, ["a"], _wedges_frame, B)

    def _tag_wedge(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = t["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "a": t["a"].to_numpy(zero_copy_only=False).astype(np.int64),
                "lo": lo,
                "hi": hi,
                "pb": pair_bucket(lo, hi, B),
            }
        )

    def _close_credit(g: pd.DataFrame) -> pd.DataFrame:
        pb = int(g["pb"].iloc[0])
        path = os.path.join(edge_dir, f"bucket_{pb}.parquet")
        e0 = np.empty(0, np.int64)
        if not os.path.exists(path):
            return pd.DataFrame({"lo": e0, "hi": e0.copy(), "c": e0.copy()})
        e = pq.read_table(path, columns=["lo", "hi"]).to_pandas()
        m = g.merge(e, on=["lo", "hi"], how="inner")
        if not len(m):
            return pd.DataFrame({"lo": e0, "hi": e0.copy(), "c": e0.copy()})
        a = m["a"].to_numpy()
        lo = m["lo"].to_numpy()
        hi = m["hi"].to_numpy()
        # triangle (a, lo, hi): credit all three canonical edges
        elo = np.concatenate([np.minimum(a, lo), np.minimum(a, hi), lo])
        ehi = np.concatenate([np.maximum(a, lo), np.maximum(a, hi), hi])
        pr = np.stack([elo, ehi], axis=1)
        u, c = np.unique(pr, axis=0, return_counts=True)  # per-bucket combine
        return pd.DataFrame({"lo": u[:, 0], "hi": u[:, 1], "c": c.astype(np.int64)})

    credits = (
        wedges.map_batches(_tag_wedge, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(_close_credit, batch_format="pandas")
    )
    zeros = simple.map_batches(
        lambda t: pa.table(
            {
                "lo": t["lo"],
                "hi": t["hi"],
                "c": np.zeros(t.num_rows, np.int64),
            }
        ),
        batch_format="pyarrow",
    )

    def _sum_sup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["lo", "hi"], as_index=False)["c"].sum()
        return out.rename(columns={"c": "sup"}).astype({"sup": "int64"})

    return grouped_map_bucketed(credits.union(zeros), ["lo", "hi"], _sum_sup, B)


def k_truss(
    edges: "ray.data.Dataset",
    k: int,
    work_dir: str | None = None,
    B: int = 16,
    max_rounds: int = 100,
    broadcast_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """k-truss of the simple undirected graph: the maximal subgraph whose
    every edge closes >= k-2 triangles WITHIN the subgraph (k >= 3).
    Iterative peeling: per round one distributed `edge_support` pass, drop
    edges below k-2, re-stage survivors as partitioned parquet (the
    resumable layout — a crashed run restarts from the last staged round);
    the driver sees only per-round counts. Returns (lo, hi, sup) with the
    FINAL within-truss support.

    Round count is bounded by the peeling depth (typically tens on web
    graphs); each round's cost shrinks with the surviving edge set."""
    if k < 3:
        raise ValueError("k-truss needs k >= 3")
    work_dir = work_dir or tempfile.mkdtemp(prefix="glr_truss_")
    os.makedirs(work_dir, exist_ok=True)

    cur = _canonical_simple_edges(edges, B=B).materialize()
    n_cur = cur.count()  # known per round -> edge_support can pick the
    # broadcast path without an extra counting pass
    for r in range(max_rounds):
        rdir = os.path.join(work_dir, f"round_{r}")
        sup = edge_support(
            cur, rdir, B=B, n_edges=n_cur, broadcast_limit=broadcast_limit
        )

        def _keep(t: pa.Table) -> pa.Table:
            s = t["sup"].to_numpy(zero_copy_only=False)
            m = s >= k - 2
            return pa.table(
                {
                    "lo": t["lo"].to_numpy(zero_copy_only=False)[m],
                    "hi": t["hi"].to_numpy(zero_copy_only=False)[m],
                    "sup": s[m],
                }
            )

        surv_dir = os.path.join(rdir, "surviving")
        # a re-run in the same work dir must not append to last run's
        # shard files (write_parquet names files per run): replace whole
        shutil.rmtree(surv_dir, ignore_errors=True)
        sup.map_batches(_keep, batch_format="pyarrow").write_parquet(surv_dir)
        surv = ray.data.read_parquet(surv_dir)
        if k == 3:
            # one pass IS the fixpoint for k=3: the dropped edges have
            # support 0, i.e. are in no triangle, so removing them cannot
            # change any surviving edge's support
            return surv
        n = surv.count()
        if n == 0:
            return surv  # empty truss, schema preserved
        if n == n_cur:
            return surv  # fixpoint: sup column is the within-truss support
        n_cur = n
        cur = surv.select_columns(["lo", "hi"])
    raise RuntimeError(f"k_truss: no fixpoint within {max_rounds} rounds")


def _edge_sample_mask(lo: np.ndarray, hi: np.ndarray, pct: int) -> np.ndarray:
    """Deterministic DOULION edge sample over the canonical pair: keep
    when ((lo%2^31)*2654435761 % 2^32 + (hi%2^31)*40503) % 2^32 % 100
    < pct — the repo's SQL-replicable Knuth-mixer family (HashSampler /
    MIS enc), intermediates bounded so the SQL side stays in BIGINT."""
    l = lo.astype(np.uint64) % np.uint64(2**31)
    h = hi.astype(np.uint64) % np.uint64(2**31)
    mix = (
        l * np.uint64(2654435761) % np.uint64(2**32) + h * np.uint64(40503)
    ) % np.uint64(2**32) % np.uint64(100)
    return mix < np.uint64(pct)


def approx_triangle_count(
    edges: "ray.data.Dataset",
    pct: int = 50,
    work_dir: str | None = None,
    B: int = 32,
    broadcast_limit: int = 2_000_000,
) -> float:
    """DOULION (Tsourakakis 2009) approximate triangle count: sample each
    canonical simple edge independently with probability pct/100 (the
    DETERMINISTIC hash above — resumable, auditable, SQL-replayable),
    count triangles of the sampled graph with the exact machinery, scale
    by (100/pct)^3. Unbiased; variance shrinks as the count grows — the
    sibling accuracy is measured against the exact counter in bench.py.
    Cost: the wedge stage sees ~ (pct/100)^2 of the wedges — the win that
    matters on hub-heavy web graphs."""
    if not 0 < pct <= 100:
        raise ValueError("pct in (0, 100]")

    def _sample(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        m = _edge_sample_mask(lo, hi, pct)
        return pa.table({"src": lo[m], "dst": hi[m]})

    sampled = edges.map_batches(_sample, batch_format="pyarrow")
    n = triangle_count(
        sampled, work_dir=work_dir, B=B, broadcast_limit=broadcast_limit
    )
    scale = 100.0 / pct
    return float(n) * scale * scale * scale


def clique4_count(
    edges: "ray.data.Dataset",
    work_dir: str | None = None,
    B: int = 32,
) -> int:
    """Exact 4-clique count of the simple undirected graph (kClist-style
    orientation counting; the reference engine has no subgraph operators
    at all — SURVEY.md §2.6-2.7).

    Every 4-clique {w,x,y,z} has a unique (degree, id) total order
    w<x<y<z under the same orientation `triangle_count` uses, so it is
    counted exactly once: anchored at its π-smallest edge (w,x), with
    {y,z} the triangle third-vertices of that edge and (y,z) itself an
    edge. The count is orientation-invariant, which is why the DuckDB
    oracle can replay it with plain id-ordering.

    Scale shape — every wide step is a bucketed exchange, nothing
    graph-sized touches the driver:
      1. canonical simple edges (one pair-key shuffle),
      2. degree partial+final + two co-partitioned degree attaches ->
         (deg, id) orientation (bounds wedge fan-out by the degeneracy,
         the hub-graph survival trick shared with `triangle_count`),
      3. triangle LISTING: vectorized wedge emission per π-min vertex,
         closed against the pair-bucketed edge files (inner merge keeps
         rows, not counts),
      4. per-triangle base-edge recovery (two more degree attaches: the
         π-smaller of the far pair is the anchor's second vertex),
      5. candidate (y,z) pairs per anchor via the same closed-form
         triangular emission `_emit_all_wedges` uses, closed once more
         against the edge files; each surviving row IS one 4-clique
         (multiplicity preserved — no dedup, distinct anchors are
         distinct cliques).
    """
    work_dir = work_dir or tempfile.mkdtemp(prefix="glr_c4_")
    os.makedirs(work_dir, exist_ok=True)
    simple = _canonical_simple_edges(edges, B).materialize()

    def _ends(t: pa.Table) -> pa.Table:
        v = np.concatenate(
            [t["lo"].to_numpy(zero_copy_only=False), t["hi"].to_numpy(zero_copy_only=False)]
        )
        u, c = np.unique(v, return_counts=True)
        return pa.table({"vid": u, "deg_part": c})

    deg = (
        simple.map_batches(_ends, batch_format="pyarrow")
        .groupby("vid")
        .sum("deg_part", ignore_nulls=True)
    )
    deg = deg.map_batches(
        lambda t: pa.table({"vid": t["vid"], "deg": t[t.column_names[1]]}),
        batch_format="pyarrow",
    )
    deg_dir = write_bucketed(deg, "vid", B, os.path.join(work_dir, "deg"))

    with_lo = attach_from_bucketed(simple, "lo", deg_dir, B, "vid").map_batches(
        lambda df: df.rename(columns={"deg": "deg_lo"}).drop(columns=["vid"]),
        batch_format="pandas",
    )
    both = attach_from_bucketed(with_lo, "hi", deg_dir, B, "vid").map_batches(
        lambda df: df.rename(columns={"deg": "deg_hi"}).drop(columns=["vid"]),
        batch_format="pandas",
    )

    def _orient(df: pd.DataFrame) -> pd.DataFrame:
        lo, hi = df["lo"].to_numpy(), df["hi"].to_numpy()
        dlo, dhi = df["deg_lo"].to_numpy(), df["deg_hi"].to_numpy()
        lo_first = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
        return pd.DataFrame(
            {"a": np.where(lo_first, lo, hi), "b": np.where(lo_first, hi, lo)}
        )

    oriented = both.map_batches(_orient, batch_format="pandas").materialize()

    def _pairkey(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        return pa.table({"lo": lo, "hi": hi, "pb": pair_bucket(lo, hi, B)})

    edge_dir = write_bucketed(
        simple.map_batches(_pairkey, batch_format="pyarrow"),
        "pb", B, os.path.join(work_dir, "cedges"),
    )

    def _wedges_frame(g: pd.DataFrame) -> pd.DataFrame:
        a_s, b_s, starts, ends = _wedge_spans(g)
        src, lo, hi = _emit_all_wedges(a_s, b_s, starts, ends)
        return pd.DataFrame({"a": src, "lo": lo, "hi": hi})

    wedges = grouped_map_bucketed(oriented, ["a"], _wedges_frame, B)

    def _tag_wedge(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = t["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "a": t["a"].to_numpy(zero_copy_only=False).astype(np.int64),
                "lo": lo, "hi": hi, "pb": pair_bucket(lo, hi, B),
            }
        )

    def _close_rows(g: pd.DataFrame) -> pd.DataFrame:
        pb = int(g["pb"].iloc[0])
        path = os.path.join(edge_dir, f"bucket_{pb}.parquet")
        empty = pd.DataFrame(
            {"a": pd.Series([], dtype="int64"),
             "lo": pd.Series([], dtype="int64"),
             "hi": pd.Series([], dtype="int64")}
        )
        if not os.path.exists(path):
            return empty
        e = pq.read_table(path, columns=["lo", "hi"]).to_pandas()
        m = g.merge(e, on=["lo", "hi"], how="inner")
        return m[["a", "lo", "hi"]] if len(m) else empty

    tris = (
        wedges.map_batches(_tag_wedge, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(_close_rows, batch_format="pandas")
    )

    t1 = attach_from_bucketed(tris, "lo", deg_dir, B, "vid").map_batches(
        lambda df: df.rename(columns={"deg": "deg_lo"}).drop(columns=["vid"]),
        batch_format="pandas",
    )
    t2 = attach_from_bucketed(t1, "hi", deg_dir, B, "vid").map_batches(
        lambda df: df.rename(columns={"deg": "deg_hi"}).drop(columns=["vid"]),
        batch_format="pandas",
    )

    def _base(df: pd.DataFrame) -> pd.DataFrame:
        lo, hi = df["lo"].to_numpy(np.int64), df["hi"].to_numpy(np.int64)
        dlo, dhi = df["deg_lo"].to_numpy(), df["deg_hi"].to_numpy()
        lo_first = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
        return pd.DataFrame(
            {
                "w": df["a"].to_numpy(np.int64),
                "x": np.where(lo_first, lo, hi),
                "y": np.where(lo_first, hi, lo),
            }
        )

    based = t2.map_batches(_base, batch_format="pandas")

    def _cand(g: pd.DataFrame) -> pd.DataFrame:
        arr = g[["w", "x", "y"]].to_numpy()
        order = np.lexsort((arr[:, 2], arr[:, 1], arr[:, 0]))
        w_s, x_s, y_s = arr[order, 0], arr[order, 1], arr[order, 2]
        new = np.concatenate(
            ([True], (w_s[1:] != w_s[:-1]) | (x_s[1:] != x_s[:-1]))
        ) if len(w_s) else np.empty(0, bool)
        starts = np.flatnonzero(new)
        ends = np.concatenate((starts[1:], [len(y_s)])) if len(starts) else starts
        _, lo, hi = _emit_all_wedges(y_s, y_s, starts, ends)
        return pd.DataFrame({"lo": lo, "hi": hi})

    cands = grouped_map_bucketed(based, ["w", "x"], _cand, B)

    def _tag_pair(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = t["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"lo": lo, "hi": hi, "pb": pair_bucket(lo, hi, B)})

    def _close_cnt(g: pd.DataFrame) -> pd.DataFrame:
        pb = int(g["pb"].iloc[0])
        path = os.path.join(edge_dir, f"bucket_{pb}.parquet")
        if not os.path.exists(path):
            return pd.DataFrame({"n": [0]})
        e = pq.read_table(path, columns=["lo", "hi"]).to_pandas()
        return pd.DataFrame({"n": [len(g.merge(e, on=["lo", "hi"], how="inner"))]})

    counts = (
        cands.map_batches(_tag_pair, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(_close_cnt, batch_format="pandas")
    )
    total = counts.sum("n")
    if total is None:
        return 0
    return int(total if not isinstance(total, dict) else total["sum(n)"])
