"""SSSP vs Bellman-Ford oracle, weighted and unweighted (FIXTURES F4 style)."""

import numpy as np
import pytest

from graphlite_ray.pipelines.linkgraph import run_on_edges
from tests.conftest import random_digraph


def bellman_ford(src, dst, w, source):
    vids = np.unique(np.concatenate([src, dst]))
    n = len(vids)
    s = np.searchsorted(vids, src)
    d = np.searchsorted(vids, dst)
    dist = np.full(n, np.inf)
    dist[np.searchsorted(vids, source)] = 0.0
    for _ in range(n):
        # simple reference relaxation (clear, O(V*E)):
        new = dist.copy()
        for e in range(len(s)):
            if dist[s[e]] + w[e] < new[d[e]]:
                new[d[e]] = dist[s[e]] + w[e]
        if np.array_equal(new, dist) or np.allclose(new, dist, equal_nan=True):
            break
        dist = new
    return dict(zip(vids.tolist(), dist.tolist()))


@pytest.mark.parametrize("weighted", [False, True])
def test_sssp_matches_bellman_ford(work_dir, weighted):
    src, dst = random_digraph(80, 400, seed=90, with_dangling=False)
    rng = np.random.RandomState(3)
    w = rng.uniform(0.5, 3.0, len(src)) if weighted else np.ones(len(src))
    source = int(src[0])
    res = run_on_edges(
        "sssp",
        src,
        dst,
        f"{work_dir}/{weighted}",
        P=4,
        weights=w if weighted else None,
        source=source,
    )
    assert res.halted
    got = {r["vertex_id"]: r["value"] for r in res.values().take_all()}
    want = bellman_ford(src, dst, w, source)
    assert set(got) == set(want)
    for k in want:
        if np.isinf(want[k]):
            assert np.isinf(got[k])
        else:
            assert got[k] == pytest.approx(want[k], abs=1e-9)
