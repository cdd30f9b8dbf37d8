"""Run the engine on the REFERENCE'S OWN shipped inputs
(`Input/tinygraph`, `Input/facebookcombined` — public data files; reading
reference inputs is the sanctioned parity check): results must match the
reference semantics oracle on the reference's own graphs."""

import os

import numpy as np
import pytest

from graphlite_ray.pipelines.linkgraph import run_on_edges
from graphlite_ray.sources.edgelist import (
    TINYGRAPH,
    TINYGRAPH_FINAL_SUPERSTEP,
    TINYGRAPH_PAGERANK,
    read_edgelist,
)
from tests.conftest import pagerank_oracle

REF_INPUT = "/root/reference/GraphLite-0.20/Input"


@pytest.mark.skipif(not os.path.isdir(REF_INPUT), reason="reference inputs absent")
def test_reference_tinygraph_file_matches_fixture_and_golden(work_dir):
    with open(f"{REF_INPUT}/tinygraph") as f:
        text = f.read()
    n, src, dst = read_edgelist(text)
    fn, fsrc, fdst = read_edgelist(TINYGRAPH)
    assert n == fn and np.array_equal(src, fsrc) and np.array_equal(dst, fdst)
    res = run_on_edges("pagerank", src, dst, work_dir, P=4)
    assert res.final_superstep == TINYGRAPH_FINAL_SUPERSTEP
    vals = {r["vertex_id"]: r["value"] for r in res.values().take_all()}
    for vid, golden in TINYGRAPH_PAGERANK.items():
        assert vals[vid] == pytest.approx(golden, abs=1e-6)


@pytest.mark.skipif(not os.path.isdir(REF_INPUT), reason="reference inputs absent")
def test_reference_facebookcombined_pagerank(work_dir):
    """The reference's largest shipped workload (SNAP ego-Facebook,
    4039 vertices / 88234 edges): converge and match the semantics oracle."""
    with open(f"{REF_INPUT}/facebookcombined") as f:
        n, src, dst = read_edgelist(f.read())
    assert n == 4039 and len(src) == 88234
    res = run_on_edges("pagerank", src, dst, work_dir, P=4)
    assert res.halted
    vids, ovals, oss = pagerank_oracle(src, dst)
    assert res.final_superstep == oss
    got = {r["vertex_id"]: r["value"] for r in res.values().take_all()}
    assert len(got) == len(vids)
    sample = vids[:: max(1, len(vids) // 200)]
    lookup = dict(zip(vids.tolist(), ovals.tolist()))
    for v in sample.tolist():
        assert got[v] == pytest.approx(lookup[v], abs=1e-9)
