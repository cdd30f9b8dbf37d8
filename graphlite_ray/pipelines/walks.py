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
