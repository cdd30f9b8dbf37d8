"""End-to-end: page table -> extraction -> ids -> CSR -> algorithms,
checked against oracles computed from the generator's expected edge list
(never from the html) — full-pipeline correctness (SURVEY.md §3.4)."""

import numpy as np
import pytest

from graphlite_ray.functions.hashing import ids_from_urls
from graphlite_ray.pipelines.linkgraph import (
    format_reference_output,
    prepare_edges,
    result_with_urls,
    run_algorithm,
)
from graphlite_ray.sources.pages import expected_graph, pages_path
from tests.conftest import cc_oracle, pagerank_oracle


N = 150
SEED = 42


@pytest.fixture(scope="module")
def oracle_edges():
    _, edges = expected_graph(N, seed=SEED)
    src = ids_from_urls([s for s, _ in edges])
    dst = ids_from_urls([d for _, d in edges])
    return src, dst


def test_pipeline_pagerank_with_urls(tmp_path_factory, oracle_edges):
    work = str(tmp_path_factory.mktemp("e2e"))
    pages = pages_path(N, seed=SEED)
    res = run_algorithm("pagerank", pages, work, P=4)
    assert res.halted

    src, dst = oracle_edges
    vids, ovals, oss = pagerank_oracle(src, dst)
    assert res.final_superstep == oss

    rows = result_with_urls(res, work).take_all()
    got = {r["vertex_id"]: (r["url"], r["value"]) for r in rows}
    assert len(got) == len(vids)
    oracle = dict(zip(vids.tolist(), ovals.tolist()))
    id2url = {}
    urls, edges = expected_graph(N, seed=SEED)
    for s, d in edges:
        id2url[int(ids_from_urls([s])[0])] = s
        id2url[int(ids_from_urls([d])[0])] = d
    for vid, (url, val) in got.items():
        assert val == pytest.approx(oracle[vid], abs=1e-9)
        assert url == id2url[vid]  # url dictionary joined correctly

    # reference output rendering: "<vid>: <value>" with %f formatting
    lines = format_reference_output(res.values()).take(3)
    for r in lines:
        vid, val = r["line"].split(": ")
        assert float(val) == pytest.approx(got[int(vid)][1], abs=1e-6)


def test_pipeline_cc_exact(tmp_path_factory, oracle_edges):
    work = str(tmp_path_factory.mktemp("e2e_cc"))
    pages = pages_path(N, seed=SEED)
    res = run_algorithm("connected_components", pages, work, P=4)
    src, dst = oracle_edges
    got = {r["vertex_id"]: r["value"] for r in res.values().take_all()}
    assert got == cc_oracle(src, dst)


def test_prepare_edges_resumable(tmp_path_factory):
    """Stage artifacts are skipped when complete (_SUCCESS marker)."""
    import os
    import time

    work = str(tmp_path_factory.mktemp("resume"))
    pages = pages_path(60, seed=9)
    d1 = prepare_edges(pages, work, P=4)
    assert os.path.exists(os.path.join(d1, "_SUCCESS"))
    t0 = time.perf_counter()
    d2 = prepare_edges(pages, work, P=4)
    assert d2 == d1 and time.perf_counter() - t0 < 0.1  # skipped, not rerun
