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
