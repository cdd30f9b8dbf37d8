"""Round-2 behaviors: resume identity (config hash), strict message
addressing, checkpoint temp-file hygiene, anti-join strategies, observable
native join, exact embedding near-dup, streaming weighted-edge runs."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from graphlite_ray.engine import BSPResult
from graphlite_ray.pipelines.linkgraph import run_on_edge_dataset, run_on_edges
from graphlite_ray.state.csr import CSRShard, build_graph_shards

SF = "/root/testdata/sf0.001"


def test_resume_rejects_different_config(work_dir):
    """Same work/ckpt dir, different SSSP source: without the manifest
    config hash the second run would silently return the first's results."""
    src = np.array([0, 1, 2, 3], np.int64)
    dst = np.array([1, 2, 3, 0], np.int64)
    r1 = run_on_edges("sssp", src, dst, work_dir, P=2, resume=True, source=0)
    v1 = r1.values().to_pandas().set_index("vertex_id")["value"]
    assert v1[0] == 0.0 and v1[2] == 2.0
    r2 = run_on_edges("sssp", src, dst, work_dir, P=2, resume=True, source=2)
    v2 = r2.values().to_pandas().set_index("vertex_id")["value"]
    assert v2[2] == 0.0 and v2[0] == 2.0  # ring: 2 -> 3 -> 0


def test_resume_same_config_reuses(work_dir):
    src = np.array([0, 1, 2], np.int64)
    dst = np.array([1, 2, 0], np.int64)
    r1 = run_on_edges("sssp", src, dst, work_dir, P=2, resume=True, source=0)
    r2 = run_on_edges("sssp", src, dst, work_dir, P=2, resume=True, source=0)
    assert r2.supersteps_run == 0  # resumed from the halted manifest
    assert r2.final_superstep == r1.final_superstep


def test_local_index_raises_on_unknown(work_dir):
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array([0, 2], pa.int64()), "dst": pa.array([2, 0], pa.int64())})
    )
    gd = os.path.join(work_dir, "g")
    build_graph_shards(edges, 1, gd)
    shard = CSRShard.load(gd, 0, 1)
    assert list(shard.local_index(np.array([0, 2]))) == [0, 1]
    with pytest.raises(KeyError):
        shard.local_index(np.array([1], np.int64))  # not a vertex
    with pytest.raises(KeyError):
        shard.local_index(np.array([99], np.int64))  # beyond the last vid


def test_values_skips_checkpoint_temp_files(work_dir):
    d = os.path.join(work_dir, "ss_3")
    os.makedirs(d)
    t = pa.table({"vertex_id": pa.array([1, 2], pa.int64()), "value": [0.5, 0.7]})
    pq.write_table(t, os.path.join(d, "values_p0.parquet"))
    # a crash mid-checkpoint leaves an atomic-write temp behind
    pq.write_table(t, os.path.join(d, "values_p0.parquet.tmp.12345"))
    res = BSPResult(final_superstep=3, supersteps_run=1, halted=True, ckpt_dir=work_dir)
    assert res.values().count() == 2  # temp file not read -> no duplicates


def test_anti_join_bucketed_matches_broadcast():
    from graphlite_ray.pipelines.relational import q_customers_without_orders

    a = q_customers_without_orders(SF)
    b = q_customers_without_orders(SF, max_broadcast_keys=0)  # force bucketed
    pd.testing.assert_frame_equal(a, b)


def test_native_join_strategy_recorded():
    from graphlite_ray.pipelines import relational as R
    from graphlite_ray.pipelines.joins import native_join_available

    out = R.q_native_join_revenue(SF)
    assert R.LAST_JOIN_STRATEGY["strategy"] in ("native", "broadcast")
    if native_join_available():
        assert R.LAST_JOIN_STRATEGY["strategy"] == "native"
        assert R.LAST_JOIN_STRATEGY["fallback_reason"] is None
    b = R.q_native_join_revenue(SF, strategy="broadcast")
    assert R.LAST_JOIN_STRATEGY["strategy"] == "broadcast"
    pd.testing.assert_frame_equal(out, b)  # both paths agree


def test_embedding_near_dup_exact_planted():
    from graphlite_ray.stages.dedup import embedding_near_dup_exact

    rng = np.random.RandomState(7)
    V = rng.standard_normal((30, 8))
    V[21] = V[20] + 0.001 * rng.standard_normal(8)
    ds = ray.data.from_pandas(
        pd.DataFrame({"vec_id": range(30), "embedding": [v.astype(np.float32) for v in V]})
    )
    tau = 0.99
    res = embedding_near_dup_exact(ds, tau=tau)
    got = {(int(a), int(b)) for a, b in zip(res.pairs["a"], res.pairs["b"])}
    # independent numpy oracle over all pairs
    V32 = V.astype(np.float32).astype(np.float64)
    Vn = V32 / np.linalg.norm(V32, axis=1, keepdims=True)
    S = Vn @ Vn.T
    i, j = np.triu_indices(30, k=1)
    want = {(int(a), int(b)) for a, b in zip(i[S[i, j] >= tau], j[S[i, j] >= tau])}
    assert got == want and (20, 21) in got


def test_run_on_edge_dataset_weighted_matches_arrays(work_dir):
    src = np.array([0, 0, 1, 2, 3], np.int64)
    dst = np.array([1, 2, 3, 3, 0], np.int64)
    w = np.array([1.0, 2.0, 1.0, 3.0, 1.0])
    r1 = run_on_edges(
        "weighted_pagerank", src, dst, os.path.join(work_dir, "a"), P=2, weights=w
    )
    edges = ray.data.from_arrow(
        pa.table({"src": src, "dst": dst, "weight": w})
    )
    r2 = run_on_edge_dataset(
        "weighted_pagerank", edges, os.path.join(work_dir, "b"), P=2
    )
    v1 = r1.values().to_pandas().sort_values("vertex_id", ignore_index=True)
    v2 = r2.values().to_pandas().sort_values("vertex_id", ignore_index=True)
    assert np.allclose(v1["value"], v2["value"]) and (v1["vertex_id"] == v2["vertex_id"]).all()
