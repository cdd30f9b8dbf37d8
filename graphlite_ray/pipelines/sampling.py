"""GraphSAGE-style deterministic k-hop neighbor sampling.

A training pipeline over a link graph consumes bounded-fanout neighbor
samples per seed (GraphSAGE-shape minibatch trees), not full adjacency:
hub pages have millions of in-links and an unbounded gather would blow
both the message volume and the trainer's batch shape. The reference
engine has no sampling operator (its vertex programs always see every
edge, GraphLite-0.20/GraphLite/engine/*); this is a training-data
extension in the SURVEY §2.7/§6 "beyond the reference" family.

Design — sampling is a property of the VERTEX, not the seed: each
vertex's fixed `fanout`-sized out-sample is chosen once by ranking its
DISTINCT out-neighbors by the splitmix64 key mix64(mix64(src) ^ dst)
(deterministic, uniform over hashed ids, and bit-replayable in SQL via
the `_splitmix64_sql` oracle helper). That makes the sampled adjacency:

- ONE bucketed shuffle on src (`grouped_map_bucketed`), staged as
  co-partitioned bucket files (`joins.write_bucketed`), built once and
  reused by every hop and every seed batch;
- each hop a co-partitioned attach of the frontier against those files
  (`joins.attach_from_bucketed`) — the adjacency never re-shuffles, and
  the frontier grows as seeds x fanout^hop, which IS the sample the
  trainer consumes (no amplification beyond the output size).

Vertex ids are the engine's non-negative 63-bit url hashes
(`functions.hashing.ids_from_urls`), so all uint64 arithmetic is exact
on both the numpy and the HUGEINT oracle side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from graphlite_ray.functions.grouping import grouped_map_bucketed
from graphlite_ray.functions.sketches import mix64
from graphlite_ray.pipelines.joins import attach_from_bucketed, write_bucketed
from graphlite_ray.state import storage


def sample_key(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """uint64 ranking key for edge (src, dst): mix64(mix64(src) ^ dst)."""
    return mix64(mix64(src.astype(np.uint64)) ^ dst.astype(np.uint64))


def sampled_adjacency(
    edges: "ray.data.Dataset", fanout: int, out_dir: str, B: int = 16
) -> str:
    """Stage each vertex's fixed out-sample: the `fanout` distinct
    out-neighbors with the smallest (sample_key, dst), bucketed by
    src % B for co-partitioned hop attaches. Returns the staged dir."""

    def _sample(g: pd.DataFrame) -> pd.DataFrame:
        m = g[["src", "dst"]].drop_duplicates()
        s = m["src"].to_numpy(np.int64)
        d = m["dst"].to_numpy(np.int64)
        key = sample_key(s, d)
        order = np.lexsort((d, key, s))
        s, d = s[order], d[order]
        # position within each src run
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        pos = np.arange(len(s)) - np.repeat(starts, np.diff(np.r_[starts, len(s)]))
        keep = pos < fanout
        return pd.DataFrame({"src": s[keep], "dst": d[keep]})

    adj = grouped_map_bucketed(edges, ["src"], _sample, B=B)
    return write_bucketed(adj, "src", B, out_dir)


def khop_sample(
    edges: "ray.data.Dataset",
    work_dir: str,
    hops: int = 2,
    fanout: int = 3,
    seed_mod: int = 8,
    B: int = 16,
) -> pd.DataFrame:
    """Bounded-fanout k-hop sample trees from the deterministic seed set
    (vertices with at least one out-edge and vid % seed_mod == 0; hashed
    ids make the mod a uniform sample). Returns one row per sampled tree
    edge: (seed, hop, parent, vertex_id) — duplicates across parents are
    kept, as a GraphSAGE tree requires."""
    adj_dir = storage.join(work_dir, f"khop_adj_f{fanout}_b{B}")
    if not storage.exists(storage.join(adj_dir, "bucket_0.parquet")):
        sampled_adjacency(edges, fanout, adj_dir, B=B)

    def _seed_part(t: pa.Table) -> pa.Table:
        s = np.unique(t["src"].to_numpy(zero_copy_only=False))
        s = s[s % seed_mod == 0]
        return pa.table({"seed": pa.array(s, pa.int64())})

    seeds = np.unique(
        np.concatenate(
            [
                b["seed"].to_numpy(zero_copy_only=False)
                for b in edges.map_batches(_seed_part, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")
            ]
            or [np.empty(0, np.int64)]
        )
    )
    frontier = ray.data.from_pandas(
        pd.DataFrame({"seed": seeds.astype(np.int64), "vertex": seeds.astype(np.int64)})
    ).repartition(max(1, min(B, len(seeds) // 64 + 1)))

    out_hops: list["ray.data.Dataset"] = []
    for h in range(1, hops + 1):
        attached = attach_from_bucketed(frontier, "vertex", adj_dir, B, "src")

        def _emit(b: pd.DataFrame, h=h) -> pd.DataFrame:
            if b.empty or "dst" not in b.columns:
                return pd.DataFrame(
                    {
                        "seed": pd.Series([], dtype="int64"),
                        "hop": pd.Series([], dtype="int64"),
                        "parent": pd.Series([], dtype="int64"),
                        "vertex_id": pd.Series([], dtype="int64"),
                    }
                )
            return pd.DataFrame(
                {
                    "seed": b["seed"],
                    "hop": np.int64(h),
                    "parent": b["vertex"],
                    "vertex_id": b["dst"],
                }
            )

        # materialize: the hop output is the bounded product the trainer
        # consumes (seeds x fanout^h rows); pinning it in the object store
        # keeps hop h+1 from re-running hops 1..h, and nothing reaches the
        # driver until the final collect
        hop_ds = attached.map_batches(_emit, batch_format="pandas").materialize()
        out_hops.append(hop_ds)
        if h < hops:
            frontier = hop_ds.map_batches(
                lambda b: b[["seed", "vertex_id"]].rename(
                    columns={"vertex_id": "vertex"}
                ),
                batch_format="pandas",
            )

    full = out_hops[0]
    for d in out_hops[1:]:
        full = full.union(d)
    out = full.to_pandas()
    return out.sort_values(
        ["seed", "hop", "parent", "vertex_id"], ignore_index=True
    )
