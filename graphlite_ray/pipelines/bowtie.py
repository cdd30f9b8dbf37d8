"""Broder bowtie decomposition of the web graph (Broder et al. 2000,
"Graph structure in the Web"): classify every vertex relative to a pivot
by forward/backward reachability —

  core   reaches the pivot AND is reached from it (the pivot's SCC)
  in     reaches the pivot but is not reached from it
  out    is reached from the pivot but does not reach it
  other  neither (tendrils / disconnected)

This is THE classic Common-Crawl-scale link-graph analysis; the reference
has no distance/reachability surface (its scope ends at the shipped
vertex programs). Shape: one distributed degree reduction to pick the
pivot (max out-degree, min-id tiebreak — deterministic and
SQL-replicable), two BSP reachability runs (`SSSP` min-combiner
wavefronts; the backward run is the same program over the reversed edge
dataset — a streaming column swap, not a new graph build on the driver),
then one bucketed shuffle to co-group the two per-vertex value tables
into classes. Nothing graph-sized touches the driver."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from graphlite_ray.functions.grouping import grouped_map_bucketed
from graphlite_ray.pipelines.linkgraph import run_on_edge_dataset
from graphlite_ray.state import storage


def pick_pivot(edges: "ray.data.Dataset", B: int = 16) -> int:
    """Vertex with the maximum out-degree (parallel edges count), smallest
    id on ties. Per-batch partial counts -> bucketed exact sums ->
    per-bucket champion -> <=B rows on the driver."""

    def _partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["src"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"v": u, "c": c.astype(np.int64)})

    def _champion(g: pd.DataFrame) -> pd.DataFrame:
        deg = g.groupby("v", as_index=False)["c"].sum()
        best = deg.sort_values(["c", "v"], ascending=[False, True]).head(1)
        return best

    champs = grouped_map_bucketed(
        edges.map_batches(_partial, batch_format="pyarrow"), ["v"], _champion, B
    ).to_pandas()
    best = champs.sort_values(["c", "v"], ascending=[False, True]).iloc[0]
    return int(best["v"])


def largest_scc_pivot(
    edges: "ray.data.Dataset",
    work_dir: str,
    P: int = 8,
    B: int = 16,
    resume: bool = False,
) -> int:
    """Representative of the LARGEST strongly connected component —
    Broder's actual core definition (the max-out-degree pivot is the
    cheap heuristic; this is the faithful one now that SCC exists).
    Because an SCC is mutually reachable, reachability from/to ANY member
    equals reachability from/to the whole core, so the single returned
    vertex (the component's max member id = its scc_id) is a sufficient
    pivot for `bowtie_classes`. Shape: the SCC BSP run, then per-batch
    partial component counts -> bucketed exact sums -> <=B champion rows
    on the driver. Ties break to the smallest scc_id."""
    from graphlite_ray.pipelines.linkgraph import scc_labels

    labels = scc_labels(edges, work_dir, P=P, resume=resume)

    def _partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(
            t["scc_id"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({"scc_id": u, "c": c.astype(np.int64)})

    def _champion(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("scc_id", as_index=False)["c"].sum()
        return sizes.sort_values(["c", "scc_id"], ascending=[False, True]).head(1)

    champs = grouped_map_bucketed(
        labels.map_batches(_partial, batch_format="pyarrow"), ["scc_id"], _champion, B
    ).to_pandas()
    best = champs.sort_values(["c", "scc_id"], ascending=[False, True]).iloc[0]
    return int(best["scc_id"])


def _reversed(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    def _swap(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["dst"], "dst": t["src"]})

    return edges.map_batches(_swap, batch_format="pyarrow")


def bowtie_classes(
    edges: "ray.data.Dataset",
    work_dir: str,
    P: int = 8,
    pivot: int | None = None,
    resume: bool = False,
    B: int = 16,
) -> "ray.data.Dataset":
    """edges (src:int64, dst:int64) -> Dataset (vertex_id, bowtie_class)
    with class in {core, in, out, other} relative to `pivot` (default:
    `pick_pivot`)."""
    if pivot is None:
        pivot = pick_pivot(edges, B)
    fwd = run_on_edge_dataset(
        "sssp", edges, storage.join(work_dir, "fwd"), P=P, resume=resume, source=pivot
    )
    bwd = run_on_edge_dataset(
        "sssp", _reversed(edges), storage.join(work_dir, "bwd"),
        P=P, resume=resume, source=pivot,
    )

    def _tag(which: str):
        def _t(t: pa.Table) -> pa.Table:
            reached = np.isfinite(t["value"].to_numpy(zero_copy_only=False))
            return pa.table(
                {
                    "v": t["vertex_id"],
                    "f": reached.astype(np.int64) if which == "f" else np.zeros(t.num_rows, np.int64),
                    "b": reached.astype(np.int64) if which == "b" else np.zeros(t.num_rows, np.int64),
                }
            )

        return _t

    tagged = fwd.values().map_batches(_tag("f"), batch_format="pyarrow").union(
        bwd.values().map_batches(_tag("b"), batch_format="pyarrow")
    )

    def _classify(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("v", as_index=False)[["f", "b"]].max()
        f = agg["f"].to_numpy(bool)
        b = agg["b"].to_numpy(bool)
        cls = np.where(f & b, "core", np.where(b, "in", np.where(f, "out", "other")))
        return pd.DataFrame({"vertex_id": agg["v"], "bowtie_class": cls})

    return grouped_map_bucketed(tagged, ["v"], _classify, B)
