"""Per-vertex compat shim parity + CLI entry point + edge-list partitioner."""

import json
import subprocess
import sys

import numpy as np
import pytest

from graphlite_ray.compat import PageRankPerVertex
from graphlite_ray.pipelines.linkgraph import run_on_edges
from graphlite_ray.sources.edgelist import (
    TINYGRAPH,
    TINYGRAPH_PAGERANK,
    hash_partition_shards,
    read_edgelist,
)


def test_pervertex_shim_matches_vectorized(work_dir):
    """The reference-API port must reproduce the vectorized engine's golden
    results exactly (same graph, same halting superstep, same values)."""
    n, src, dst = read_edgelist(TINYGRAPH)
    res = run_on_edges(PageRankPerVertex(), src, dst, work_dir, P=3)
    assert res.halted
    vals = {r["vertex_id"]: r["value"] for r in res.values().take_all()}
    for vid, golden in TINYGRAPH_PAGERANK.items():
        assert vals[vid] == pytest.approx(golden, abs=1e-6)


def test_hash_partitioner_semantics():
    n, src, dst = read_edgelist(TINYGRAPH)
    shards = hash_partition_shards(src, dst, n, 4)
    assert sum(s[0] for s in shards) == n
    assert sum(len(s[1]) for s in shards) == len(src)
    for w, (_, s_src, _) in enumerate(shards):
        assert np.all(s_src % 4 == w)


def test_cli_pagerank_job(tmp_path):
    """Drive the `ray job submit` entry point as a subprocess."""
    from graphlite_ray.sources.pages import pages_path

    pages = pages_path(60, seed=3)
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "graphlite_ray.cli",
            "pagerank",
            "--pages",
            pages,
            "--work",
            str(tmp_path),
            "-P",
            "4",
            "--out",
            str(tmp_path / "scores"),
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["halted"] is True and info["messages"] > 0
    import pyarrow.parquet as pq

    t = pq.read_table(str(tmp_path / "scores"))
    assert t.num_rows > 0 and set(t.column_names) == {"vertex_id", "url", "value"}
