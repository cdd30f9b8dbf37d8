"""k-core peeling vs iterative numpy oracle."""

import numpy as np
import pytest

from graphlite_ray.pipelines.linkgraph import run_on_edges
from tests.conftest import random_digraph


def kcore_oracle(src, dst, k):
    """Iterative peeling on the symmetrized multigraph (parallel edges
    count toward degree, matching the engine's preserved-multiplicity
    semantics)."""
    vids = np.unique(np.concatenate([src, dst]))
    n = len(vids)
    s = np.searchsorted(vids, np.concatenate([src, dst]))
    d = np.searchsorted(vids, np.concatenate([dst, src]))
    deg = np.bincount(s, minlength=n)
    alive = np.ones(n, bool)
    changed = True
    while changed:
        doomed = alive & (deg < k)
        changed = bool(doomed.any())
        for e in range(len(s)):
            if doomed[s[e]] and alive[d[e]]:
                deg[d[e]] -= 1
        alive &= ~doomed
    out = {}
    for i, v in enumerate(vids.tolist()):
        out[v] = int(deg[i]) if alive[i] else -1
    return out


@pytest.mark.parametrize("k,seed", [(9, 101), (11, 102)])
def test_kcore_matches_oracle(work_dir, k, seed):
    # avg symmetrized degree ~10, so k around it forces real peeling cascades
    src, dst = random_digraph(70, 350, seed, with_dangling=False)
    res = run_on_edges("kcore", src, dst, f"{work_dir}/{k}", P=4, k=k)
    assert res.halted
    got = {r["vertex_id"]: r["value"] for r in res.values().take_all()}
    want = kcore_oracle(src, dst, k)
    assert got == want
    assert any(v == -1 for v in got.values())  # some peeling happened
    assert res.supersteps_run >= 3  # cascaded over multiple rounds
