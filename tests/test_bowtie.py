"""Bowtie decomposition: brute-force reachability oracle + a planted
bowtie with all four classes."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from graphlite_ray.pipelines.bowtie import bowtie_classes, pick_pivot
from tests.conftest import random_digraph


def _edges_ds(src, dst):
    return ray.data.from_arrow(
        pa.table({"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)})
    )


def _brute_bowtie(src, dst, pivot):
    fadj, badj = collections.defaultdict(list), collections.defaultdict(list)
    for s, d in zip(src, dst):
        fadj[s].append(d)
        badj[d].append(s)

    def reach(adj, start):
        seen = {start}
        q = [start]
        while q:
            x = q.pop()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    q.append(y)
        return seen

    f, b = reach(fadj, pivot), reach(badj, pivot)
    out = {}
    for v in set(src) | set(dst):
        out[v] = (
            "core" if v in f and v in b else "in" if v in b else "out" if v in f else "other"
        )
    return out


def test_bowtie_matches_brute_force(ray_session, work_dir):
    src, dst = random_digraph(200, 500, seed=17)
    pivot = pick_pivot(_edges_ds(src, dst))
    # pivot rule: max out-degree, min id tiebreak
    import pandas as pd

    deg = pd.Series(src).value_counts()
    top = deg[deg == deg.max()].index.min()
    assert pivot == top
    got = (
        bowtie_classes(_edges_ds(src, dst), f"{work_dir}/bt", P=4)
        .to_pandas()
        .set_index("vertex_id")["bowtie_class"]
        .to_dict()
    )
    assert got == _brute_bowtie(src, dst, pivot)


def test_bowtie_planted_all_classes(ray_session, work_dir):
    # core = {10, 11} cycle (pivot 10 has max out-degree via extra edges);
    # in = {1} -> core; out = core -> {20}; other = {30} -> {31}
    src = [10, 11, 10, 10, 1, 10, 30]
    dst = [11, 10, 20, 20, 10, 99, 31]
    got = (
        bowtie_classes(_edges_ds(src, dst), f"{work_dir}/bt2", P=2)
        .to_pandas()
        .set_index("vertex_id")["bowtie_class"]
        .to_dict()
    )
    assert got[10] == "core" and got[11] == "core"
    assert got[1] == "in"
    assert got[20] == "out" and got[99] == "out"
    assert got[30] == "other" and got[31] == "other"


def test_largest_scc_pivot_and_faithful_classes(ray_session, work_dir):
    """largest_scc_pivot must return the max-member id of the biggest
    SCC, and bowtie_classes seeded with it must mark exactly that SCC as
    core."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from graphlite_ray.pipelines.bowtie import bowtie_classes, largest_scc_pivot

    # two cycles (sizes 3 and 2) + an in-tail and an out-tail on the big one
    src = np.array([1, 2, 3, 10, 11, 50, 3], np.int64)
    dst = np.array([2, 3, 1, 11, 10, 1, 60], np.int64)
    edges = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    pivot = largest_scc_pivot(edges, f"{work_dir}/s", P=2)
    assert pivot == 3  # biggest SCC {1,2,3}, max member 3
    cls = {
        r["vertex_id"]: r["bowtie_class"]
        for r in bowtie_classes(edges, f"{work_dir}/b", P=2, pivot=pivot).take_all()
    }
    assert {v for v, c in cls.items() if c == "core"} == {1, 2, 3}
    assert cls[50] == "in" and cls[60] == "out"
    assert cls[10] == cls[11] == "other"
