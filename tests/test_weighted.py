"""Weighted-edge support: the reference's per-edge value payload
(`include/Node.h:46-54`) carried through CSR shards + WeightedPageRank."""

import numpy as np
import pytest

from graphlite_ray.pipelines.linkgraph import run_on_edges
from tests.conftest import random_digraph


def weighted_pagerank_oracle(src, dst, w, eps=1e-6, max_ss=200):
    vids = np.unique(np.concatenate([src, dst]))
    n = len(vids)
    s = np.searchsorted(vids, src)
    d = np.searchsorted(vids, dst)
    w_total = np.zeros(n)
    np.add.at(w_total, s, w)
    values = np.zeros(n)
    inbox = np.zeros(n)
    prev_delta = 0.0
    for ss in range(max_ss):
        if ss == 0:
            values[:] = 1.0
        else:
            if ss >= 2 and prev_delta < eps:
                return vids, values, ss
            new = 0.15 + 0.85 * inbox
            prev_delta = np.abs(values - new).sum()
            values = new
        per_v = np.divide(values, w_total, out=np.zeros(n), where=w_total > 0)
        inbox = np.bincount(d, weights=per_v[s] * w, minlength=n)
    return vids, values, max_ss


def test_weighted_pagerank_matches_oracle(work_dir):
    src, dst = random_digraph(80, 400, seed=70, with_dangling=True)
    rng = np.random.RandomState(7)
    w = rng.uniform(0.1, 5.0, size=len(src))
    res = run_on_edges("weighted_pagerank", src, dst, work_dir, P=4, weights=w)
    assert res.halted
    vids, oracle_vals, oss = weighted_pagerank_oracle(src, dst, w)
    assert res.final_superstep == oss
    got = {r["vertex_id"]: r["value"] for r in res.values().take_all()}
    for v, ov in zip(vids.tolist(), oracle_vals.tolist()):
        assert got[v] == pytest.approx(ov, abs=1e-9)


def test_unit_weights_reduce_to_pagerank(work_dir):
    src, dst = random_digraph(50, 200, seed=71, with_dangling=False)
    r_w = run_on_edges(
        "weighted_pagerank", src, dst, f"{work_dir}/w", P=3, weights=np.ones(len(src))
    )
    r_p = run_on_edges("pagerank", src, dst, f"{work_dir}/p", P=3)
    vw = {r["vertex_id"]: r["value"] for r in r_w.values().take_all()}
    vp = {r["vertex_id"]: r["value"] for r in r_p.values().take_all()}
    assert r_w.final_superstep == r_p.final_superstep
    for k in vp:
        assert vw[k] == pytest.approx(vp[k], abs=1e-12)
