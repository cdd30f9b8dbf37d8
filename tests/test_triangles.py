"""Triangle count vs trace(A^3)/6 oracle (FIXTURES.md F4)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from graphlite_ray.pipelines.triangles import triangle_count
from tests.conftest import random_digraph


def tri_oracle(src: np.ndarray, dst: np.ndarray) -> int:
    vids = np.unique(np.concatenate([src, dst]))
    n = len(vids)
    s = np.searchsorted(vids, src)
    d = np.searchsorted(vids, dst)
    A = np.zeros((n, n), np.int64)
    keep = s != d
    A[s[keep], d[keep]] = 1
    A[d[keep], s[keep]] = 1
    return int(np.trace(A @ A @ A) // 6)


def _ds(src, dst):
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )


def test_triangle_known():
    # one triangle + a pendant edge + self-loop + parallel/reciprocal noise
    src = np.array([0, 1, 2, 2, 0, 1, 3, 3], np.int64)
    dst = np.array([1, 2, 0, 0, 1, 0, 0, 3], np.int64)
    assert triangle_count(_ds(src, dst), B=4) == 1


@pytest.mark.parametrize("n,m,seed", [(30, 150, 5), (80, 500, 6)])
def test_triangle_random_matches_oracle(tmp_path, n, m, seed):
    src, dst = random_digraph(n, m, seed, with_dangling=False)
    got = triangle_count(_ds(src, dst), work_dir=str(tmp_path), B=8)
    assert got == tri_oracle(src, dst)


def test_triangle_bucketed_path_matches_broadcast(tmp_path):
    """Force the large-graph bucketed join path (broadcast_limit=0) and
    check it agrees with the oracle + the broadcast path."""
    src, dst = random_digraph(60, 400, seed=8, with_dangling=False)
    bc = triangle_count(_ds(src, dst), work_dir=str(tmp_path / "a"), B=8)
    bk = triangle_count(
        _ds(src, dst), work_dir=str(tmp_path / "b"), B=8, broadcast_limit=0
    )
    assert bc == bk == tri_oracle(src, dst)
