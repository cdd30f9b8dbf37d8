"""Link-prediction scores: brute-force oracle on random graphs + the
degree-cap contract."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest


def _edges_ds(rows):
    import pyarrow as pa
    import ray.data

    t = pa.table(
        {
            "src": np.array([r[0] for r in rows], np.int64),
            "dst": np.array([r[1] for r in rows], np.int64),
        }
    )
    return ray.data.from_arrow(t)


def _brute_force(rows, min_common=1):
    """All-non-edge-pair CN/AA/Jaccard over the simple undirected graph."""
    adj: dict[int, set[int]] = {}
    edge_set = set()
    for s, d in rows:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
        edge_set.add((min(s, d), max(s, d)))
    out = []
    for u, v in itertools.combinations(sorted(adj), 2):
        if (u, v) in edge_set:
            continue
        common = adj[u] & adj[v]
        if len(common) < min_common:
            continue
        aa = sum(1.0 / np.log(len(adj[c])) for c in common)
        jac = len(common) / len(adj[u] | adj[v])
        out.append((u, v, len(common), aa, jac))
    return pd.DataFrame(
        out, columns=["u", "v", "common_neighbors", "adamic_adar", "jaccard"]
    )


def test_link_prediction_matches_brute_force(ray_session):
    from graphlite_ray.pipelines.linkpred import link_prediction_scores

    rng = np.random.default_rng(7)
    rows = [tuple(r) for r in rng.integers(0, 60, size=(400, 2))]
    got = (
        link_prediction_scores(_edges_ds(rows), B=8, min_common=1)
        .to_pandas()
        .sort_values(["u", "v"], ignore_index=True)
    )
    want = _brute_force(rows, min_common=1).sort_values(
        ["u", "v"], ignore_index=True
    )
    assert len(got) == len(want) > 0
    assert (got["u"] == want["u"]).all() and (got["v"] == want["v"]).all()
    assert (got["common_neighbors"] == want["common_neighbors"]).all()
    np.testing.assert_allclose(got["adamic_adar"], want["adamic_adar"], rtol=1e-12)
    np.testing.assert_allclose(got["jaccard"], want["jaccard"], rtol=1e-12)


def test_link_prediction_min_common_filters(ray_session):
    from graphlite_ray.pipelines.linkpred import link_prediction_scores

    # path graph 0-1-2-3: (0,2) and (1,3) share exactly one neighbor
    got = link_prediction_scores(
        _edges_ds([(0, 1), (1, 2), (2, 3)]), B=4, min_common=2
    ).to_pandas()
    assert len(got) == 0
    got1 = (
        link_prediction_scores(_edges_ds([(0, 1), (1, 2), (2, 3)]), B=4, min_common=1)
        .to_pandas()
        .sort_values(["u", "v"], ignore_index=True)
    )
    assert [tuple(r) for r in got1[["u", "v"]].to_numpy()] == [(0, 2), (1, 3)]


def test_link_prediction_degree_cap_skips_hub(ray_session):
    from graphlite_ray.pipelines.linkpred import link_prediction_scores

    # star 0-{1..20} plus a 1-2-3 path: uncapped, the hub creates C(20,2)
    # candidate pairs; capped at 10 only wedge center 2 (deg 2) survives.
    rows = [(0, i) for i in range(1, 21)] + [(1, 2), (2, 3)]
    full = link_prediction_scores(_edges_ds(rows), B=4).to_pandas()
    capped = link_prediction_scores(
        _edges_ds(rows), B=4, max_center_degree=10
    ).to_pandas()
    assert len(full) > len(capped)
    # (1, 3) via center 2 survives the cap; hub-only pairs are gone
    pairs = {tuple(r) for r in capped[["u", "v"]].to_numpy()}
    assert (1, 3) in pairs
    assert all(2 in (u, v) or {u, v} == {1, 3} for u, v in pairs)
