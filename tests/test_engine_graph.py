"""CSR build, id assignment, and BSP algorithm correctness
(SURVEY.md §5 items 1-3; FIXTURES.md F2/F4)."""

import numpy as np
import pytest

from graphlite_ray.functions.hashing import ids_from_urls
from graphlite_ray.pipelines.linkgraph import run_on_edges
from graphlite_ray.sources.edgelist import (
    TINYGRAPH,
    TINYGRAPH_FINAL_SUPERSTEP,
    TINYGRAPH_PAGERANK,
    read_edgelist,
)
from graphlite_ray.state.csr import CSRShard, build_graph_shards
from tests.conftest import cc_oracle, lpa_oracle, pagerank_oracle, random_digraph


def _values_dict(result):
    rows = result.values().take_all()
    return {r["vertex_id"]: r["value"] for r in rows}


def test_ids_deterministic_and_collision_free():
    urls = [f"https://h{i%7}.example/p{i}" for i in range(5000)]
    a = ids_from_urls(urls)
    b = ids_from_urls(urls)
    assert np.array_equal(a, b)
    assert (a >= 0).all()
    assert len(np.unique(a)) == len(set(urls))


def test_csr_shard_build_matches_edges(work_dir):
    import pyarrow as pa
    import ray.data

    n, src, dst = read_edgelist(TINYGRAPH)
    edges = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    P = 3
    meta = build_graph_shards(edges, P, work_dir)
    assert meta["n_vertices"] == n
    assert meta["n_edges"] == len(src)
    seen = []
    for p in range(P):
        sh = CSRShard.load(work_dir, p, P)
        assert np.array_equal(sh.vids % P, np.full(sh.n, p))
        assert np.all(np.diff(sh.vids) > 0)
        for i in range(sh.n):
            for t in sh.indices[sh.indptr[i] : sh.indptr[i + 1]]:
                seen.append((int(sh.vids[i]), int(t)))
        # out_deg consistent with indptr
        assert np.array_equal(sh.out_deg, np.diff(sh.indptr))
    assert sorted(seen) == sorted(zip(src.tolist(), dst.tolist()))


def test_pagerank_tinygraph_golden(work_dir):
    n, src, dst = read_edgelist(TINYGRAPH)
    res = run_on_edges("pagerank", src, dst, work_dir, P=4)
    assert res.halted
    assert res.final_superstep == TINYGRAPH_FINAL_SUPERSTEP
    vals = _values_dict(res)
    assert len(vals) == 5
    for vid, golden in TINYGRAPH_PAGERANK.items():
        assert vals[vid] == pytest.approx(golden, abs=1e-6)
    assert sum(vals.values()) == pytest.approx(5.0, abs=1e-4)


@pytest.mark.parametrize("n,m,seed", [(10, 30, 1), (100, 400, 2), (300, 2000, 3)])
def test_pagerank_matches_oracle_random_graphs(work_dir, n, m, seed):
    src, dst = random_digraph(n, m, seed)
    vids, oracle_vals, oracle_ss = pagerank_oracle(src, dst)
    res = run_on_edges("pagerank", src, dst, f"{work_dir}/g{seed}", P=4)
    assert res.halted
    assert res.final_superstep == oracle_ss
    got = _values_dict(res)
    assert len(got) == len(vids)
    for v, ov in zip(vids.tolist(), oracle_vals.tolist()):
        assert got[v] == pytest.approx(ov, abs=1e-9)


def test_pagerank_partition_invariance(work_dir):
    src, dst = random_digraph(120, 600, seed=9)
    r1 = run_on_edges("pagerank", src, dst, f"{work_dir}/p1", P=1)
    r8 = run_on_edges("pagerank", src, dst, f"{work_dir}/p8", P=8)
    v1, v8 = _values_dict(r1), _values_dict(r8)
    assert r1.final_superstep == r8.final_superstep
    assert set(v1) == set(v8)
    for k in v1:
        assert v1[k] == pytest.approx(v8[k], abs=1e-12)


@pytest.mark.parametrize("seed", [11, 12])
def test_connected_components_exact(work_dir, seed):
    rng = np.random.RandomState(seed)
    # several disjoint chains + cliques + an isolated self-loop vertex
    src, dst = random_digraph(150, 300, seed, with_dangling=False)
    # force >1 component: offset half the graph into a disjoint id range
    src2, dst2 = src + 1000, dst + 1000
    src = np.concatenate([src, src2, [5000]])
    dst = np.concatenate([dst, dst2, [5000]])
    res = run_on_edges("connected_components", src, dst, work_dir, P=4)
    assert res.halted
    got = _values_dict(res)
    oracle = cc_oracle(src, dst)
    assert got == oracle
    assert len(set(got.values())) >= 3


def test_cc_partition_invariance(work_dir):
    src, dst = random_digraph(100, 250, seed=21, with_dangling=False)
    r1 = run_on_edges("connected_components", src, dst, f"{work_dir}/p1", P=1)
    r6 = run_on_edges("connected_components", src, dst, f"{work_dir}/p6", P=6)
    assert _values_dict(r1) == _values_dict(r6)


@pytest.mark.parametrize("seed", [31, 32])
def test_lpa_matches_dense_simulation(work_dir, seed):
    src, dst = random_digraph(60, 150, seed, with_dangling=False)
    res = run_on_edges("label_propagation", src, dst, work_dir, P=4)
    vids, oracle_labels = lpa_oracle(src, dst)
    got = _values_dict(res)
    assert got == {int(v): int(l) for v, l in zip(vids, oracle_labels)}


def test_lpa_partition_invariance(work_dir):
    src, dst = random_digraph(80, 200, seed=41, with_dangling=False)
    r1 = run_on_edges("label_propagation", src, dst, f"{work_dir}/p1", P=1)
    r5 = run_on_edges("label_propagation", src, dst, f"{work_dir}/p5", P=5)
    assert _values_dict(r1) == _values_dict(r5)
