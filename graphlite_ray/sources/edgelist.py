"""Reference-format edge-list source (test/compat only).

Reads GraphLite's input contract (`engine/Worker.cc:29-57` in the
reference): line 1 = vertex count, line 2 = edge count, then `src dst`
pairs sorted by src. Also provides the offline hash-partitioner semantics
(`bin/hash-partitioner.pl:23-55`) so reference-style shard files round-trip
in tests. Production inputs are Parquet; this exists for fixture parity.
"""

from __future__ import annotations

import numpy as np


def read_edgelist(text: str) -> tuple[int, np.ndarray, np.ndarray]:
    """Edge-list text -> (n_vertices, src, dst). Ids are dense int64."""
    lines = [ln for ln in text.strip().splitlines() if ln.strip()]
    n_vertices = int(lines[0])
    n_edges = int(lines[1])
    pairs = np.array(
        [tuple(map(int, ln.split())) for ln in lines[2 : 2 + n_edges]], dtype=np.int64
    )
    if len(pairs) == 0:
        return n_vertices, np.empty(0, np.int64), np.empty(0, np.int64)
    return n_vertices, pairs[:, 0].copy(), pairs[:, 1].copy()


def hash_partition_shards(src: np.ndarray, dst: np.ndarray, n_vertices: int, W: int):
    """Reproduce `hash-partitioner.pl`: shard i (0-based here) gets edges
    with src % W == i; its header vertex count is the number of locally
    resident vertex slots (`bin/hash-partitioner.pl:29-36`)."""
    shards = []
    for w in range(W):
        mask = (src % W) == w
        local_v = n_vertices // W + (1 if w < n_vertices % W else 0)
        shards.append((local_v, src[mask], dst[mask]))
    return shards


# FIXTURES.md F2 — the reference's tinygraph (`Input/tinygraph`): 5 vertices,
# 12 directed edges. This is test DATA (an input file), not code.
TINYGRAPH = (
    "5\n12\n"
    "0 1\n0 3\n1 0\n1 2\n1 3\n2 1\n2 4\n3 0\n3 1\n3 4\n4 3\n4 2\n"
)

# Golden PageRank on tinygraph under exact reference semantics (verified by
# simulation during the survey; FIXTURES.md F2). Final superstep = 19.
TINYGRAPH_PAGERANK = {
    0: 0.840473,
    1: 1.218482,
    2: 0.861281,
    3: 1.218482,
    4: 0.861281,
}
TINYGRAPH_FINAL_SUPERSTEP = 19
