"""Whole-graph summary statistics as streaming Ray Data pipelines.

The reference computes no graph statistics beyond per-superstep counters
(`engine/WM.curss_finish.proto:12-19`); these are standard link-graph
diagnostics a Common-Crawl-scale pipeline runs before/after the iterative
algorithms (degree skew informs partition sizing, reciprocity
characterizes the crawl frontier). Both are single-shuffle bucketed
pipelines — nothing graph-sized touches the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from graphlite_ray.functions.grouping import grouped_map_bucketed


def reciprocity(edges: "ray.data.Dataset", B: int = 16) -> pd.DataFrame:
    """Directed-edge reciprocity over DISTINCT non-loop edges: the fraction
    of edges (u, v) whose reverse (v, u) is also present. One bucketed
    shuffle on the canonical unordered pair — dedup (parallel edges) and
    the reverse-edge lookup happen inside the same bucket group, because a
    pair's two orientations land in the same bucket by construction.
    Returns one row: (total_edges, reciprocal_edges, reciprocity)."""

    def _canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        fwd = s < d
        # per-batch pre-dedup of (lo, hi, direction) rows
        u = np.unique(
            np.stack([np.minimum(s, d), np.maximum(s, d), fwd.astype(np.int64)], axis=1),
            axis=0,
        )
        return pa.table({"lo": u[:, 0], "hi": u[:, 1], "fwd": u[:, 2]})

    def _pair_stats(g: pd.DataFrame) -> pd.DataFrame:
        dirs = g.drop_duplicates(["lo", "hi", "fwd"]).groupby(["lo", "hi"])["fwd"].size()
        both = int((dirs == 2).sum())
        total = int(dirs.sum())  # one distinct directed edge per (pair, dir)
        return pd.DataFrame({"total": [total], "recip": [2 * both]})

    parts = grouped_map_bucketed(
        edges.map_batches(_canon, batch_format="pyarrow"), ["lo", "hi"], _pair_stats, B
    ).to_pandas()  # B tiny summary rows
    total = int(parts["total"].sum())
    recip = int(parts["recip"].sum())
    return pd.DataFrame(
        {
            "total_edges": [total],
            "reciprocal_edges": [recip],
            "reciprocity": [recip / total if total else 0.0],
        }
    )


def max_out_degree_vertex(edges: "ray.data.Dataset", B: int = 16) -> int:
    """The deterministic double-sweep pivot: the vertex with the highest
    DIRECTED out-degree (parallel edges count), ties broken by MIN vertex
    id — exactly `ORDER BY count(*) DESC, src LIMIT 1` in the SQL replay.
    Per-batch partial counts, one bucketed shuffle for exact sums, ONE
    candidate row per bucket; the driver reduces B rows, never V."""

    def _partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["src"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"src": u, "c": c.astype(np.int64)})

    def _bucket_top1(g: pd.DataFrame) -> pd.DataFrame:
        deg = g.groupby("src")["c"].sum().reset_index()
        deg = deg.sort_values(["c", "src"], ascending=[False, True])
        return deg.head(1).rename(columns={"c": "out_degree"})

    cands = grouped_map_bucketed(
        edges.map_batches(_partial, batch_format="pyarrow"), ["src"], _bucket_top1, B
    ).to_pandas()  # <= B rows
    cands = cands.sort_values(["out_degree", "src"], ascending=[False, True])
    return int(cands["src"].iloc[0])


def farthest_vertex(values: "ray.data.Dataset") -> tuple[int, int]:
    """(vertex_id, value=distance) Dataset -> (vertex at max FINITE
    distance with min-id tie-break, that distance). Per-block top-1
    partials; the driver reduces one row per block."""

    def _top1(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        ids = t["vertex_id"].to_numpy(zero_copy_only=False)
        fin = np.isfinite(v)
        if not fin.any():
            return pa.table(
                {"vertex_id": pa.array([], pa.int64()), "value": pa.array([], pa.float64())}
            )
        v, ids = v[fin], ids[fin]
        m = v.max()
        return pa.table({"vertex_id": [int(ids[v == m].min())], "value": [float(m)]})

    rows = values.map_batches(_top1, batch_format="pyarrow").take_all()
    best = max(rows, key=lambda r: (r["value"], -r["vertex_id"]))
    return int(best["vertex_id"]), int(best["value"])


def double_sweep_diameter_edges(
    edges: "ray.data.Dataset", work_dir: str, P: int = 8, resume: bool = False
) -> pa.Table:
    """Diameter LOWER BOUND of the undirected (symmetrized) graph by the
    classic double sweep (Magnien, Latapy & Habib 2009): BFS from a
    max-degree pivot, then BFS from the farthest vertex found; the second
    eccentricity is the bound (exact on trees, near-tight on web graphs —
    a 2-BFS answer where exact diameter needs all-pairs). Both BFS runs
    are `SymSSSP` BSP executions sharing one symmetrized CSR build; each
    intermediate reduce moves <= max(B, n_blocks) rows to the driver.

    Returns one row: (pivot, endpoint, diameter_lb)."""
    from graphlite_ray.pipelines.linkgraph import run_on_edge_dataset

    pivot = max_out_degree_vertex(edges)
    res1 = run_on_edge_dataset(
        "sssp_sym", edges, work_dir, P=P, resume=resume, source=pivot
    )
    u1, _ = farthest_vertex(res1.values().select_columns(["vertex_id", "value"]))
    res2 = run_on_edge_dataset(
        "sssp_sym", edges, work_dir, P=P, resume=resume, source=u1
    )
    _, dia = farthest_vertex(res2.values().select_columns(["vertex_id", "value"]))
    return pa.table(
        {
            "pivot": pa.array([pivot], pa.int64()),
            "endpoint": pa.array([u1], pa.int64()),
            "diameter_lb": pa.array([dia], pa.int64()),
        }
    )


def double_sweep_diameter(
    pages_dir: str, work_dir: str, P: int = 8, resume: bool = True
) -> pa.Table:
    """Pages -> staged edges -> `double_sweep_diameter_edges` (the graph
    build and both checkpoints land in the shared, resumable work dir)."""
    from graphlite_ray.pipelines.linkgraph import prepare_edges

    edges_dir = prepare_edges(pages_dir, work_dir, P)
    edges = ray.data.read_parquet(edges_dir, columns=["src", "dst"])
    return double_sweep_diameter_edges(edges, work_dir, P=P, resume=resume)


def degree_histogram(edges: "ray.data.Dataset", B: int = 16) -> "ray.data.Dataset":
    """Out-degree distribution (out_degree, n_vertices) over the directed
    multigraph — parallel edges count; vertices appearing only as a
    destination count at out-degree 0. Per-batch partial counts, one
    bucketed shuffle per vertex, then a tiny groupby over the distinct
    degree values (cardinality ~log-scale of the graph)."""

    def _partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["src"].to_numpy(zero_copy_only=False), return_counts=True)
        dv = np.unique(t["dst"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "v": np.concatenate([u, dv]),
                "c": np.concatenate([c.astype(np.int64), np.zeros(len(dv), np.int64)]),
            }
        )

    def _deg_hist(g: pd.DataFrame) -> pd.DataFrame:
        deg = g.groupby("v")["c"].sum()
        u, c = np.unique(deg.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"out_degree": u, "n_part": c.astype(np.int64)})

    hist = grouped_map_bucketed(
        edges.map_batches(_partial, batch_format="pyarrow"), ["v"], _deg_hist, B
    )

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("out_degree", as_index=False)["n_part"].sum()
        return pd.DataFrame(
            {
                "out_degree": out["out_degree"].astype("int64"),
                "n_vertices": out["n_part"].astype("int64"),
            }
        )

    return grouped_map_bucketed(hist, ["out_degree"], _final, B=4)


def degree_assortativity(
    edges: "ray.data.Dataset", work_dir: str, B: int = 16
) -> pd.DataFrame:
    """Directed degree assortativity (Newman 2002, out->in variant): the
    Pearson correlation of (out-degree(src), in-degree(dst)) over the
    directed non-loop edge MULTISET (parallel edges count; self-loops
    stripped on both the edge list and the degrees, consistently).

    Plan: one bucketed shuffle builds the (v, outdeg, indeg) table; it is
    written hash-bucketed once (`write_bucketed`) and each edge attaches
    x = outdeg(src) then y = indeg(dst) via two co-partitioned merges
    (`attach_from_bucketed` — join strategy 2; the degree table is
    |V|-sized, so no broadcast). Per-batch partial sums are EXACT: the
    x*y / x*x products are taken in Python-int (object) dtype because a
    hub's in-degree squared overflows int64 at web scale; partials travel
    as decimal strings (one tiny row per batch) and the driver folds them
    in arbitrary precision. r is one fixed float64 expression over the
    exact sums — bit-reproducible in SQL via HUGEINT intermediates.

    Returns one row: (n_edges, assortativity); degenerate variance -> 0.0
    (the same exact-integer zero test on both sides)."""
    import math

    from graphlite_ray.pipelines.joins import attach_from_bucketed, write_bucketed

    def _noself(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        return pa.table({"src": s[keep], "dst": d[keep]})

    e = edges.map_batches(_noself, batch_format="pyarrow")

    def _deg_rows(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        # per-batch partial degree counts (producer combine)
        us, cs = np.unique(s, return_counts=True)
        ud, cd = np.unique(d, return_counts=True)
        return pa.table(
            {
                "v": np.concatenate([us, ud]),
                "od": np.concatenate([cs.astype(np.int64), np.zeros(len(ud), np.int64)]),
                "idg": np.concatenate([np.zeros(len(us), np.int64), cd.astype(np.int64)]),
            }
        )

    def _deg_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("v", as_index=False)[["od", "idg"]].sum()

    deg = grouped_map_bucketed(
        e.map_batches(_deg_rows, batch_format="pyarrow"), ["v"], _deg_sum, B=B
    )
    deg_dir = write_bucketed(deg, "v", B, f"{work_dir}/assort_deg")

    withx = attach_from_bucketed(e, "src", deg_dir, B, "v").map_batches(
        lambda df: df[["dst", "od"]].rename(columns={"od": "x"}),
        batch_format="pandas",
    )
    withxy = attach_from_bucketed(withx, "dst", deg_dir, B, "v").map_batches(
        lambda df: df[["x", "idg"]].rename(columns={"idg": "y"}),
        batch_format="pandas",
    )

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["x"].to_numpy().astype(object)
        y = df["y"].to_numpy().astype(object)
        return pd.DataFrame(
            {
                "n": [str(len(df))],
                "sx": [str(x.sum())],
                "sy": [str(y.sum())],
                "sxy": [str((x * y).sum())],
                "sxx": [str((x * x).sum())],
                "syy": [str((y * y).sum())],
            }
        )

    parts = withxy.map_batches(_partial, batch_format="pandas").to_pandas()
    tot = {c: sum(int(v) for v in parts[c]) for c in parts.columns} if len(parts) else {
        c: 0 for c in ("n", "sx", "sy", "sxy", "sxx", "syy")
    }
    n, sx, sy = tot["n"], tot["sx"], tot["sy"]
    sxy, sxx, syy = tot["sxy"], tot["sxx"], tot["syy"]
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    r = (
        float(n * sxy - sx * sy) / (math.sqrt(float(vx)) * math.sqrt(float(vy)))
        if vx != 0 and vy != 0
        else 0.0
    )
    return pd.DataFrame({"n_edges": [n], "assortativity": [r]})


def community_modularity(
    edges: "ray.data.Dataset",
    labels: "ray.data.Dataset",
    work_dir: str,
    B: int = 16,
) -> pd.DataFrame:
    """Newman modularity Q of a vertex labeling over the SIMPLE undirected
    graph (self-loops dropped, parallel/reciprocal edges collapsed — the
    triangle-family convention):

        Q = sum over communities c of  m_c/m - (D_c/(2m))^2

    with m = simple edges, m_c = intra-community edges, D_c = community
    degree sum. `labels` is any (vertex_id, label:int64) Dataset (LPA
    labels in the driver query). Plan: labels written hash-bucketed once,
    each canonical edge attaches both endpoint labels via two
    co-partitioned merges, per-batch partials aggregate (label, m_c, D_c)
    in one bucketed shuffle; m = sum(D_c)/2 exactly. Q's per-community
    terms use ONE fixed float64 expression; the cross-community sum
    associates freely and oracles compare after the shared round-6
    (PageRank convention). Returns one row:
    (n_edges, n_communities, modularity)."""
    from graphlite_ray.pipelines.joins import attach_from_bucketed, write_bucketed
    from graphlite_ray.pipelines.triangles import _canonical_simple_edges

    simple = _canonical_simple_edges(edges, B=B)
    lab_dir = write_bucketed(
        labels, "vertex_id", B, f"{work_dir}/mod_labels", columns=["vertex_id", "label"]
    )
    with_lo = attach_from_bucketed(simple, "lo", lab_dir, B, "vertex_id").map_batches(
        lambda df: df[["lo", "hi", "label"]].rename(columns={"label": "la"}),
        batch_format="pandas",
    )
    both = attach_from_bucketed(with_lo, "hi", lab_dir, B, "vertex_id").map_batches(
        lambda df: df[["lo", "hi", "la", "label"]].rename(columns={"label": "lb"}),
        batch_format="pandas",
    )

    def _partials(df: pd.DataFrame) -> pd.DataFrame:
        la = df["la"].to_numpy(np.int64)
        lb = df["lb"].to_numpy(np.int64)
        intra = la == lb
        lab = np.concatenate([la[intra], la, lb])
        e = np.concatenate(
            [
                np.ones(int(intra.sum()), np.int64),
                np.zeros(2 * len(la), np.int64),
            ]
        )
        d = np.concatenate(
            [np.zeros(int(intra.sum()), np.int64), np.ones(2 * len(la), np.int64)]
        )
        out = pd.DataFrame({"label": lab, "e": e, "d": d})
        return out.groupby("label", as_index=False)[["e", "d"]].sum()

    def _sum_comm(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("label", as_index=False)[["e", "d"]].sum()
        return out.astype({"e": "int64", "d": "int64"})

    # one row per community with >= 1 edge endpoint — stays a Dataset
    # (web-scale labelings have graph-sized community counts)
    comm = grouped_map_bucketed(
        both.map_batches(_partials, batch_format="pandas"), ["label"], _sum_comm, B=B
    ).materialize()  # consumed twice: m, then the term sum

    # distinct-label count without a driver-side value list: per-batch
    # pre-dedup, one groupby, count the grouped rows
    n_comm = int(
        labels.map_batches(
            lambda t: pa.table(
                {"label": np.unique(t["label"].to_numpy(zero_copy_only=False))}
            ),
            batch_format="pyarrow",
        )
        .groupby("label")
        .count()
        .count()
    )

    dsum = comm.sum("d")
    m = int(dsum if not isinstance(dsum, dict) else dsum["sum(d)"] or 0) // 2
    if m == 0:
        return pd.DataFrame(
            {"n_edges": [0], "n_communities": [n_comm], "modularity": [0.0]}
        )
    fm = float(m)

    def _terms(df: pd.DataFrame) -> pd.DataFrame:
        mc = df["e"].to_numpy(np.int64).astype(np.float64)
        dc = df["d"].to_numpy(np.int64).astype(np.float64)
        t = mc / fm - (dc / (2.0 * fm)) * (dc / (2.0 * fm))
        return pd.DataFrame({"q": [float(np.add.reduce(t))]})

    parts = comm.map_batches(_terms, batch_format="pandas").to_pandas()
    q = float(parts["q"].sum())
    return pd.DataFrame(
        {"n_edges": [m], "n_communities": [n_comm], "modularity": [q]}
    )


def avg_neighbor_degree(edges: "ray.data.Dataset", B: int = 16) -> pd.DataFrame:
    """Average out-degree of each vertex's out-neighbors (the per-vertex
    knn(v) statistic behind `degree_assortativity` — degree-degree
    correlation localized to one vertex; hub-feeding pages score high).
    Parallel edges count by multiplicity (engine multiset semantics);
    a dangling neighbor contributes degree 0.

    Shape: two bucketed exchanges, nothing graph-sized on the driver.
      1. Role-tagged union keyed on vertex v: every edge (s, d) emits a
         `need` row at v=d carrying s, and a `have` row at v=s (partial
         pre-count per batch). In v's bucket outdeg(v) is exact, and every
         need row resolves to (src=s, nbr_deg=outdeg(v)) locally — a
         co-partitioned join expressed as one shuffle, no staged side
         table.
      2. Shuffle on src: avg = sum(nbr_deg)/count, where count is exactly
         outdeg(src) because each out-edge produced one need row."""
    from graphlite_ray.functions.rounding import round_half_away

    def _need(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": t["dst"],
                "src": t["src"],
                "cnt": pa.array(np.zeros(t.num_rows, np.int64)),
            }
        )

    def _have(t: pa.Table) -> pa.Table:
        # per-batch pre-count: B' rows per distinct src, not per edge
        u, c = np.unique(t["src"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {
                "v": u,
                "src": np.full(len(u), -1, np.int64),
                "cnt": c.astype(np.int64),
            }
        )

    def _resolve(g: pd.DataFrame) -> pd.DataFrame:
        have = g[g["src"] < 0]
        deg = have.groupby("v", sort=False)["cnt"].sum()
        need = g[g["src"] >= 0]
        nbr = deg.reindex(need["v"]).fillna(0).to_numpy(np.int64)
        return pd.DataFrame({"src": need["src"].to_numpy(np.int64), "d": nbr})

    def _avg(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("src", as_index=False).agg(s=("d", "sum"), n=("d", "size"))
        out = pd.DataFrame(
            {
                "vertex_id": agg["src"].to_numpy(np.int64),
                "avg_nbr_deg": round_half_away(
                    agg["s"].to_numpy(np.int64).astype(np.float64)
                    / agg["n"].to_numpy(np.int64),
                    6,
                ),
            }
        )
        return out

    tagged = edges.map_batches(_need, batch_format="pyarrow").union(
        edges.map_batches(_have, batch_format="pyarrow")
    )
    resolved = grouped_map_bucketed(tagged, ["v"], _resolve, B=B)
    return (
        grouped_map_bucketed(resolved, ["src"], _avg, B=B)
        .to_pandas()
        .sort_values("vertex_id", ignore_index=True)
    )


def rich_club(edges: "ray.data.Dataset", work_dir: str, B: int = 16) -> pd.DataFrame:
    """Rich-club coefficient phi(k) = 2*E_k / (N_k * (N_k - 1)) for every
    distinct degree k of the SIMPLE undirected graph: N_k = vertices with
    degree > k, E_k = edges whose BOTH endpoints have degree > k (Zhou &
    Mondragon's hub-interconnection statistic; no reference analog —
    whole-graph diagnostics family like `degree_assortativity` above).

    Scale shape: E_k over all k at once is a CUMULATIVE histogram of
    min(deg_lo, deg_hi) per edge, and N_k a cumulative degree histogram —
    so the whole curve costs one canonical-edge shuffle, one degree
    shuffle, two co-partitioned degree attaches, and per-batch histogram
    partials whose merged size is bounded by the number of DISTINCT
    degrees (thousands, not |V|). Integer-exact; phi rounds to 6dp via
    the shared half-away convention."""
    from graphlite_ray.functions.rounding import round_half_away
    from graphlite_ray.pipelines.joins import attach_from_bucketed, write_bucketed
    from graphlite_ray.pipelines.triangles import _canonical_simple_edges
    from graphlite_ray.state import storage

    simple = _canonical_simple_edges(edges, B).materialize()

    def _deg_rows(t: pa.Table) -> pa.Table:
        v = np.concatenate(
            [t["lo"].to_numpy(zero_copy_only=False), t["hi"].to_numpy(zero_copy_only=False)]
        )
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": u, "dp": c.astype(np.int64)})

    def _deg_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("v", as_index=False)["dp"].sum()
        out["deg"] = out.pop("dp").astype("int64")
        return out

    deg = grouped_map_bucketed(
        simple.map_batches(_deg_rows, batch_format="pyarrow"), ["v"], _deg_sum, B
    )
    deg_dir = write_bucketed(deg, "v", B, storage.join(work_dir, "rc_deg"))

    # degree histogram partials (bounded by distinct degrees)
    def _dhist(b: pd.DataFrame) -> pd.DataFrame:
        u, c = np.unique(b["deg"].to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"deg": u, "n": c.astype(np.int64)})

    dhist = (
        ray.data.read_parquet(deg_dir)
        .map_batches(_dhist, batch_format="pandas")
        .to_pandas()
        .groupby("deg", as_index=False)["n"]
        .sum()
    )

    with_lo = attach_from_bucketed(simple, "lo", deg_dir, B, "v").map_batches(
        lambda df: df.rename(columns={"deg": "deg_lo"}).drop(columns=["v"]),
        batch_format="pandas",
    )
    both = attach_from_bucketed(with_lo, "hi", deg_dir, B, "v").map_batches(
        lambda df: df.rename(columns={"deg": "deg_hi"}).drop(columns=["v"]),
        batch_format="pandas",
    )

    def _mhist(b: pd.DataFrame) -> pd.DataFrame:
        md = np.minimum(b["deg_lo"].to_numpy(np.int64), b["deg_hi"].to_numpy(np.int64))
        u, c = np.unique(md, return_counts=True)
        return pd.DataFrame({"md": u, "n": c.astype(np.int64)})

    mhist = (
        both.map_batches(_mhist, batch_format="pandas")
        .to_pandas()
        .groupby("md", as_index=False)["n"]
        .sum()
    )

    ks = np.sort(dhist["deg"].unique())
    # cumulative "strictly greater" counts via reverse cumsum
    dd = dhist.sort_values("deg")
    degs, dn = dd["deg"].to_numpy(np.int64), dd["n"].to_numpy(np.int64)
    mm = mhist.sort_values("md")
    mds, mn = mm["md"].to_numpy(np.int64), mm["n"].to_numpy(np.int64)
    n_k = np.array(
        [int(dn[degs > k].sum()) for k in ks], np.int64
    )
    e_k = np.array(
        [int(mn[mds > k].sum()) for k in ks], np.int64
    )
    phi = np.where(
        n_k >= 2, 2.0 * e_k / (n_k.astype(np.float64) * (n_k - 1.0)), 0.0
    )
    return pd.DataFrame(
        {
            "k": ks,
            "n_k": n_k,
            "e_k": e_k,
            "phi": round_half_away(phi, 6),
        }
    )
