"""Seeded deterministic random walks over the link graph.

DeepWalk/node2vec-style sampling: the walk corpus is the training input
for graph embeddings; here walks run as a BSP vertex program on the
resident CSR (`programs.RandomWalks`) — each walk is a combiner="none"
message, each superstep is one hop, and the visit trace surfaces through
the engine's history-bearing aggregator lane (the final aggregator value
IS the full trace, so it survives checkpoint resume). The hop rule is a
pure 32-bit mixer, so a DuckDB recursive CTE replays every choice exactly
(`__ray_entry__.oracle_sql()['graph_random_walks']`).
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def walk_trace(result) -> pd.DataFrame:
    """BSPResult -> (walk_id, step, vertex_id) trace table.

    The FINAL `visits` aggregator value holds every (walk_id, step,
    vertex) triple (partition 0 carries the accumulated past forward each
    superstep — `RandomWalks.aggregators`), so both a fresh run and a
    resumed completed run (which keeps only the last aggregator state)
    yield the same trace. Rows sort by (walk_id, step); the pair is
    unique, so merge order across partitions is irrelevant."""
    visits = result.aggr_history[-1].get("visits", []) if result.aggr_history else []
    w, s, v = [], [], []
    for wid, step, vid in visits:
        w.append(int(wid))
        s.append(int(step))
        v.append(int(vid))
    return (
        pd.DataFrame(
            {
                "walk_id": np.asarray(w, np.int64),
                "step": np.asarray(s, np.int64),
                "vertex_id": np.asarray(v, np.int64),
            }
        )
        .sort_values(["walk_id", "step"], ignore_index=True)
    )


# -- second-order (node2vec-style) biased walks ------------------------------

W_RET = 1   # candidate == the vertex we just came from (return, ~1/p)
W_NEAR = 4  # directed edge prev -> candidate exists (stay close, ~1)
W_FAR = 2   # otherwise (move outward, ~1/q)
_WK_A = 1_000_003
_WK_B = 10_007


def walk_key(cand: np.ndarray, walk: np.ndarray, step: int, copy: np.ndarray) -> np.ndarray:
    """uint64 choice key for (walk, step) picking `cand` via weight-copy
    `copy`: mix64(cand) XOR mix64(walk*A + step*B + copy). The two mixes
    are over INDEPENDENT inputs (vertex id vs small choice-point id), so
    the XOR is uniform — and each mix stages ONCE in the SQL replay (the
    per-step key is then pure XOR arithmetic, no per-step mix chain)."""
    from graphlite_ray.functions.sketches import mix64

    wm = mix64(
        walk.astype(np.uint64) * np.uint64(_WK_A)
        + np.uint64(step * _WK_B)
        + copy.astype(np.uint64)
    )
    return mix64(cand.astype(np.uint64)) ^ wm


def biased_walks(
    edges: "ray.data.Dataset",
    seeds: "list[int]",
    length: int = 8,
    work_dir: str | None = None,
    B: int = 16,
) -> pd.DataFrame:
    """node2vec-style SECOND-ORDER biased walks: at step s the walk on
    `cur` (having arrived from `prev`) picks among cur's DISTINCT
    out-neighbors with integer weights W_RET (cand == prev), W_NEAR
    (directed edge prev -> cand exists), W_FAR (else); step 1 is uniform.
    A weight-w candidate holds w copies of the choice key and the walk
    takes the global (key, cand, copy)-minimum — deterministic sampling
    exactly proportional to the weights, and bit-replayable in SQL.

    This is the operator `programs.RandomWalks` (first-order) cannot
    express on the message lane: the bias needs prev's out-neighborhood
    at cur, i.e. an EDGE MEMBERSHIP join per hop. Scale shape: adjacency
    and the (src, dst) membership set are staged ONCE as co-partitioned
    bucket files; each step is (1) a co-partitioned attach of the
    frontier on cur, (2) a pair-bucketed membership merge on
    (prev, cand) — the same closure exchange the triangle machinery
    uses — and (3) a walk-bucketed argmin. Frontier rows = live walks;
    candidate rows = frontier out-degree sum; nothing scales with the
    graph beyond the staged files. Self-loops drop at the canon step
    (a self-loop is never a useful walk hop).

    Returns (walk_id, step, vertex_id): step 0 = the seed row, walks
    stop early at dead ends."""
    import os
    import tempfile

    import pyarrow as pa

    import ray.data

    from graphlite_ray.functions.grouping import grouped_map_bucketed
    from graphlite_ray.pipelines.joins import (
        attach_from_bucketed,
        pair_bucket,
        write_bucketed,
    )

    work_dir = work_dir or tempfile.mkdtemp(prefix="glr_n2v_")
    os.makedirs(work_dir, exist_ok=True)

    def _canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        u = np.unique(np.stack([s[keep], d[keep]], axis=1), axis=0)
        return pa.table({"src": u[:, 0], "dst": u[:, 1]})

    def _dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["src", "dst"])

    simple = grouped_map_bucketed(
        edges.map_batches(_canon, batch_format="pyarrow"), ["src", "dst"], _dedup, B
    ).materialize()

    adj_dir = write_bucketed(simple, "src", B, os.path.join(work_dir, "n2v_adj"))

    def _pairkey(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"m_src": s, "m_dst": d, "pb": pair_bucket(s, d, B)})

    mem_dir = write_bucketed(
        simple.map_batches(_pairkey, batch_format="pyarrow"),
        "pb", B, os.path.join(work_dir, "n2v_mem"),
    )

    import pyarrow.parquet as pq

    seeds_arr = np.asarray(sorted(int(s) for s in seeds), np.int64)
    frontier = ray.data.from_pandas(
        pd.DataFrame(
            {
                "walk": np.arange(len(seeds_arr), dtype=np.int64),
                "prev": np.full(len(seeds_arr), -1, np.int64),
                "cur": seeds_arr,
            }
        )
    )
    trace = [
        pd.DataFrame(
            {
                "walk_id": np.arange(len(seeds_arr), dtype=np.int64),
                "step": 0,
                "vertex_id": seeds_arr,
            }
        )
    ]

    for s in range(1, length + 1):
        cands = attach_from_bucketed(frontier, "cur", adj_dir, B, "src").map_batches(
            lambda df: df.rename(columns={"dst": "cand"}).drop(columns=["src"]),
            batch_format="pandas",
        )

        def _tag(t: pa.Table) -> pa.Table:
            p = t["prev"].to_numpy(zero_copy_only=False)
            c = t["cand"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "walk": t["walk"].to_numpy(zero_copy_only=False),
                    "prev": p,
                    "cur": t["cur"].to_numpy(zero_copy_only=False),
                    "cand": c,
                    "pb": pair_bucket(p, c, B),
                }
            )

        def _member(g: pd.DataFrame) -> pd.DataFrame:
            pb = int(g["pb"].iloc[0])
            g = g.drop(columns=["pb"])
            path = os.path.join(mem_dir, f"bucket_{pb}.parquet")
            if os.path.exists(path):
                e = pq.read_table(path, columns=["m_src", "m_dst"]).to_pandas()
                m = g.merge(
                    e, left_on=["prev", "cand"], right_on=["m_src", "m_dst"],
                    how="left", indicator=True,
                )
                g = g.assign(near=(m["_merge"] == "both").to_numpy())
            else:
                g = g.assign(near=False)
            return g

        flagged = (
            cands.map_batches(_tag, batch_format="pyarrow")
            .groupby("pb")
            .map_groups(_member, batch_format="pandas")
        )

        step = s  # bind for the closure

        def _choose(g: pd.DataFrame) -> pd.DataFrame:
            w = np.where(
                g["prev"].to_numpy() < 0,
                1,
                np.where(
                    g["cand"].to_numpy() == g["prev"].to_numpy(),
                    W_RET,
                    np.where(g["near"].to_numpy(), W_NEAR, W_FAR),
                ),
            ).astype(np.int64)
            walk = np.repeat(g["walk"].to_numpy(np.int64), w)
            cur = np.repeat(g["cur"].to_numpy(np.int64), w)
            cand = np.repeat(g["cand"].to_numpy(np.int64), w)
            ends = np.cumsum(w)
            copy = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) - np.repeat(
                ends - w, w
            )
            key = walk_key(cand, walk, step, copy)
            order = np.lexsort((copy, cand, key, walk))
            walk_o, cur_o, cand_o = walk[order], cur[order], cand[order]
            first = np.ones(len(walk_o), bool)
            first[1:] = walk_o[1:] != walk_o[:-1]
            return pd.DataFrame(
                {
                    "walk": walk_o[first],
                    "prev": cur_o[first],
                    "cur": cand_o[first],
                }
            )

        frontier = grouped_map_bucketed(
            flagged, ["walk"], _choose, B=min(B, 8)
        ).materialize()
        got = frontier.to_pandas()
        if got.empty:
            break
        trace.append(
            pd.DataFrame(
                {"walk_id": got["walk"], "step": s, "vertex_id": got["cur"]}
            )
        )

    out = pd.concat(trace, ignore_index=True)
    out["step"] = out["step"].astype("int64")
    return out.sort_values(["walk_id", "step"], ignore_index=True)


def skipgram_pairs(trace: pd.DataFrame, window: int = 2) -> pd.DataFrame:
    """Walk trace -> skip-gram training pairs: for every walk, emit
    (center, context) for all step pairs within `window` (both
    directions, center != context step). This is the node2vec/DeepWalk
    corpus step that turns walks into embedding training examples.

    The trace is output-sized (walks x steps), so the pair product
    (x 2*window) is too — vectorized shift-and-mask over the
    step-sorted trace, no shuffle needed beyond what produced the
    trace. Returns (walk_id, center_step, center, context) sorted."""
    if trace.empty:
        return pd.DataFrame(
            {
                "walk_id": pd.Series([], dtype="int64"),
                "center_step": pd.Series([], dtype="int64"),
                "center": pd.Series([], dtype="int64"),
                "context": pd.Series([], dtype="int64"),
            }
        )
    t = trace.sort_values(["walk_id", "step"], kind="stable")
    w = t["walk_id"].to_numpy(np.int64)
    s = t["step"].to_numpy(np.int64)
    v = t["vertex_id"].to_numpy(np.int64)
    parts = []
    for off in range(1, window + 1):
        for sign in (1, -1):
            d = off * sign
            if d > 0:
                a = slice(0, len(w) - d)
                b = slice(d, len(w))
            else:
                a = slice(-d, len(w))
                b = slice(0, len(w) + d)
            ok = (w[a] == w[b]) & (s[b] - s[a] == d)
            parts.append(
                pd.DataFrame(
                    {
                        "walk_id": w[a][ok],
                        "center_step": s[a][ok],
                        "center": v[a][ok],
                        "context": v[b][ok],
                    }
                )
            )
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values(
        ["walk_id", "center_step", "context"], ignore_index=True
    )
